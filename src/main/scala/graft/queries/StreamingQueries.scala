package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.StreamingKpis

/** Streaming parity query: the Structured Streaming hourly counts must equal
  * the equivalent batch aggregation — DuckDB computes the batch twin. */
object StreamingQueries extends QueryGroup {

  private def hourly(s: SparkSession, dir: String): DataFrame =
    StreamingKpis.runAvailableNow(s, dir)

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("streaming_hourly_counts", hourly, Some(
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
        |       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
        |       event_type, COUNT(*) AS plays
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),
  )
}
