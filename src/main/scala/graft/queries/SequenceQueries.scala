package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Value-window functions, ordered sequence construction, and the
  * Spark 4 VARIANT surface — the last scalar/window corners plus the
  * behavior-sequence op an LLM-pipeline user builds training examples
  * from.
  */
object SequenceQueries extends QueryGroup {

  /** Value-window family: first/last/nth event value per user ordered
    * by time — frame semantics pinned explicitly (last_value over the
    * default frame is the running last, i.e. the current row; the
    * whole-partition last needs an unbounded frame). One user-keyed
    * window serves all five columns. */
  private def valueFamily(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Sources.table(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .select(col("user_id"), col("event_id"),
        first(col("event_type")).over(run).as("first_type"),
        last(col("event_type")).over(run).as("running_last_type"),
        last(col("event_type")).over(full).as("final_type"),
        nth_value(col("event_type"), 3).over(run).as("third_type"))
      .orderBy("user_id", "event_id")
  }

  private val valueFamilyOracle: String =
    """SELECT user_id, event_id,
      |  first_value(event_type) OVER wrun AS first_type,
      |  last_value(event_type) OVER wrun AS running_last_type,
      |  last_value(event_type) OVER wfull AS final_type,
      |  nth_value(event_type, 3) OVER wrun AS third_type
      |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
      |      FROM events)
      |WINDOW
      |  wrun AS (PARTITION BY user_id ORDER BY ts_ms, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wfull AS (PARTITION BY user_id ORDER BY ts_ms, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING
      |                     AND UNBOUNDED FOLLOWING)
      |ORDER BY user_id, event_id""".stripMargin

  /** Behavior-sequence construction: each user's first eight events as
    * an ordered action string — the "user journey" example shape a
    * training pipeline emits. collect_list is order-nondeterministic
    * under parallel merge, so the sort key rides INSIDE the collected
    * structs and array_sort restores event order after aggregation —
    * deterministic on any cluster, no single-reducer sort. */
  private def userJourney(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .select(col("user_id"),
        struct(unix_millis(col("ts")).as("t"), col("event_id").as("id"),
          col("event_type").as("e")).as("ev"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          slice(transform(array_sort(collect_list(col("ev"))),
            e => e.getField("e")), 1, 8), ">")
          .as("journey"))
      .orderBy("user_id")

  private val userJourneyOracle: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  array_to_string(list_slice(
      |    list(event_type ORDER BY epoch_ms(ts), event_id), 1, 8), '>')
      |    AS journey
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Spark 4 VARIANT ingestion: parse_json once into the binary variant
    * encoding, then typed path extraction — the schema-on-read shape
    * that replaces per-path string re-parsing (each get_json_object
    * re-parses the text; variant parses once and navigates bytes). */
  private def variantExtract(s: SparkSession, dir: String): DataFrame =
    // scatter: the single-row-group source would otherwise run the
    // CPU-heavy parse_json in one task (same fix as p_json_extract)
    Sources.scatter(Sources.table(s, dir, "events"))
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(col("event_id"),
        try_variant_get(col("v"), "$.k", "bigint").as("k_num"),
        try_variant_get(col("v"), "$.tag", "string").as("tag"))
      .orderBy("event_id")

  private val variantOracle: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
      |  json_extract_string(props, '$.tag') AS tag
      |FROM events ORDER BY event_id""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("w_value_family", valueFamily, Some(valueFamilyOracle)),
    QueryDef("a_user_journey", userJourney, Some(userJourneyOracle)),
    QueryDef("p_variant_extract", variantExtract, Some(variantOracle)),
  )
}
