package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Validate
import graft.etl.Validate.DqRule
import graft.io.Sources

/** Data-quality gating and safe-arithmetic contracts — the "does this
  * 100 TB input meet its expectations, without failing the job" surface.
  */
object QualityQueries extends QueryGroup {

  /** One-pass expectation report over events ([[Validate.dqChecks]]):
    * five rules of different shapes (range, non-null, domain membership,
    * cross-column, uniqueness via multi-distinct) evaluated in a single
    * scan. The uniqueness rule rides the same aggregate through a
    * distinct count rather than a self-join. */
  private def dqChecks(s: SparkSession, dir: String): DataFrame = {
    val e = Sources.table(s, dir, "events")
    val base = Validate.dqChecks(e, Seq(
      DqRule("value_non_negative", col("value") >= 0),
      DqRule("user_id_present", col("user_id").isNotNull),
      DqRule("event_type_in_domain", col("event_type")
        .isin("view", "click", "purchase", "play", "pause")),
      DqRule("props_is_json_object", col("props").startsWith("{")),
      DqRule("ts_in_range", col("ts").between("2020-01-01", "2030-01-01")),
    ))
    // uniqueness is not row-local — append it as its own single-agg row
    val uniq = e.agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - countDistinct(col("event_id")))
          .as("n_violations"))
      .select(lit("event_id_unique").as("rule"), col("n_rows"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))
    base.unionByName(uniq).orderBy("rule")
  }

  private val dqOracle: String =
    """WITH e AS (SELECT * FROM events),
      |r AS (
      |  SELECT 'value_non_negative' AS rule,
      |    CAST(COUNT(*) FILTER (NOT COALESCE(value >= 0, FALSE)) AS BIGINT)
      |      AS n_violations FROM e
      |  UNION ALL
      |  SELECT 'user_id_present',
      |    CAST(COUNT(*) FILTER (user_id IS NULL) AS BIGINT) FROM e
      |  UNION ALL
      |  SELECT 'event_type_in_domain',
      |    CAST(COUNT(*) FILTER (NOT COALESCE(event_type IN
      |      ('view','click','purchase','play','pause'), FALSE)) AS BIGINT)
      |    FROM e
      |  UNION ALL
      |  SELECT 'props_is_json_object',
      |    CAST(COUNT(*) FILTER (NOT COALESCE(props LIKE '{%', FALSE))
      |      AS BIGINT) FROM e
      |  UNION ALL
      |  SELECT 'ts_in_range',
      |    CAST(COUNT(*) FILTER (NOT COALESCE(
      |      ts BETWEEN TIMESTAMP '2020-01-01' AND TIMESTAMP '2030-01-01',
      |      FALSE)) AS BIGINT) FROM e
      |  UNION ALL
      |  SELECT 'event_id_unique',
      |    CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) FROM e)
      |SELECT rule, (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_rows,
      |       n_violations, n_violations = 0 AS pass
      |FROM r ORDER BY rule""".stripMargin

  /** Safe-arithmetic contract: try_divide / try_add / try_element_at
    * return NULL where strict ANSI evaluation would fail the job (÷0,
    * bigint overflow, index out of bounds) — the degradation contract a
    * 100 TB pipeline needs so one poisoned row cannot kill a stage.
    *
    * The poisoned rows are a RARE deterministic subset (~0.1%,
    * orderkey % 997): try_* is a JVM throw/catch per failing row, so a
    * query where EVERY row fails measures exception overhead, not the
    * operator (an earlier all-rows-overflow formulation of this query
    * benched 29 s at sf0.1; rare-failure is both the honest profile and
    * ~50× faster). The oracle states the same semantics with CASE
    * guards (DuckDB's strict operators would raise too). */
  private def tryArithmetic(s: SparkSession, dir: String): DataFrame = {
    val poisoned = col("l_orderkey") % 997 === 0
    Sources.table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"),
          when(poisoned, lit(0.0))
            .otherwise(col("l_linenumber").cast("double"))).as("safe_div"),
        try_add(lit(Long.MaxValue),
          when(poisoned, lit(1L)).otherwise(lit(0L))).as("safe_add"),
        try_element_at(array(col("l_returnflag"), col("l_linestatus")),
          when(poisoned, lit(99)).otherwise(col("l_linenumber") % 2 + 1))
          .as("safe_elem"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val tryArithmeticOracle: String =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_orderkey % 997 = 0 THEN NULL
      |       ELSE l_extendedprice / l_linenumber END AS safe_div,
      |  CASE WHEN l_orderkey % 997 = 0 THEN NULL
      |       ELSE 9223372036854775807 END AS safe_add,
      |  CASE WHEN l_orderkey % 997 = 0 THEN NULL
      |       ELSE [l_returnflag, l_linestatus][(l_linenumber % 2) + 1]
      |       END AS safe_elem
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Audit/lineage columns: which file each row came from
    * (input_file_name — the per-split metadata column, free at scan
    * time) and a deterministic row fingerprint for cross-system
    * reconciliation. The oracle pins the basename (single-file fixture)
    * and recomputes the same fingerprint — proving the fingerprint is
    * engine-independent, which is what makes it usable to diff a Spark
    * export against any other system's copy. */
  private def lineageCols(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .select(col("event_id"),
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("source_file"),
        // concat, NOT concat_ws: the fingerprint must null-propagate
        // like the oracle's `||` (concat_ws silently drops a NULL field
        // AND its separator, colliding 'a|view' with a null-user row) —
        // a NULL fingerprint says "cannot reconcile", never a collision
        md5(concat(col("event_id").cast("string"), lit("|"),
          col("user_id").cast("string"), lit("|"), col("event_type"))
          .cast("binary")).as("row_fp"))
      .orderBy("event_id")

  private val lineageOracle: String =
    """SELECT event_id, 'events.parquet' AS source_file,
      |  md5(CAST(event_id AS VARCHAR) || '|' ||
      |      CAST(user_id AS VARCHAR) || '|' || event_type) AS row_fp
      |FROM events ORDER BY event_id""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("f_dq_checks", dqChecks, Some(dqOracle)),
    QueryDef("p_try_arithmetic", tryArithmetic, Some(tryArithmeticOracle)),
    QueryDef("p_lineage_cols", lineageCols, Some(lineageOracle)),
  )
}
