package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the per-family groups in [[graft.queries]];
  * each group entry maps to a row of SURVEY §2's operator inventory or a
  * north-star extension (dedup / similarity / text / multimodal).
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    CoreQueries,
    OperatorQueries,
    RollupQueries,
    ExtensionQueries,
    StreamingQueries,
    EngineQueries,
    OpsQueries,
    TrainingQueries,
    AnalyticsQueries,
    WarehouseQueries,
    ProfilingQueries,
    FunctionQueries,
    RelationalQueries,
    SqlQueries,
    SequenceQueries,
    QualityQueries,
    IncrementalQueries,
    SketchQueries,
    GraphQueries,
  )

  private val all: Seq[QueryDef] = groups.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.genreKpis(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * Evaluate AFTER running queries: oracleAfter thunks render literals
    * stashed by their query (see [[graft.queries.QueryDef]]). */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.orElse(q.oracleAfter.flatMap(_.apply()))
      .map(q.name -> _)).toMap

  /** Names carrying a static or post-run oracle — VerifyDumpSpec pins that
    * every queries key is oracle-backed (no silent rows-only checks). */
  def oracleBacked: Set[String] =
    all.filter(q => q.oracle.isDefined || q.oracleAfter.isDefined)
      .map(_.name).toSet
}
