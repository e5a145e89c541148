package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-verifiable query: a Spark formulation plus (when
  * SQL-expressible) a DuckDB oracle over the same parquet tables.
  *
  * Correctness-by-construction rules used throughout (so Spark and DuckDB
  * hash-match bitwise, no float tolerance needed):
  *   - sums/avgs over fixed-point business values go through DECIMAL casts
  *     (exact), then a single cast to double — both engines produce the same
  *     IEEE value;
  *   - counts stay BIGINT on both sides (DuckDB SUM(int) would be HUGEINT —
  *     always CAST);
  *   - window orderings always carry an explicit total tie-break and explicit
  *     NULLS FIRST/LAST (Spark ASC defaults nulls-first, DuckDB nulls-last);
  *   - genuinely irrational doubles (cosine similarity) are rounded identically
  *     on both sides AFTER ranking on the rounded value.
  */
/** @param oracle  static oracle SQL, known at authoring time (the norm)
  * @param oracleAfter rendered AFTER the run's queries executed — for
  *   oracles that must carry run-computed (but deterministic) literals,
  *   e.g. a fitted PCA eigenbasis. Verify dumps oracle_sql.json last, so
  *   the thunk sees whatever the query stashed; returns None when the
  *   query didn't run in this JVM (the entry is then omitted and the
  *   driver records a weaker rows-only check). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleAfter: Option[() => Option[String]] = None)

trait QueryGroup {
  def defs: Seq[QueryDef]
}
