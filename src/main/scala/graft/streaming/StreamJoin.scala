package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (SURVEY §2.9 surface): attribute each click
  * to the impression it followed within an attribution window — the
  * canonical two-unbounded-streams join.
  *
  * Both inputs MUST carry event-time watermarks (callers set them; the
  * delay is a business choice). The interval condition is what makes the
  * state PRUNABLE: Spark keeps an impression only until
  * watermark > imp_ts + withinMs and a click only until its own watermark
  * passes — state is O(events in the window), independent of stream
  * length. An equality-only stream-stream join would keep state forever.
  *
  * Works identically as a batch join (same code path, no watermarks
  * needed) — StreamJoinSpec asserts streamed == batch on the same data.
  */
object StreamJoin {

  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
                      withinMs: Long): DataFrame = {
    val i = impressions.select(col("user_id").as("i_user"),
      col("ts").as("imp_ts"), col("campaign"))
    val c = clicks.select(col("user_id").as("c_user"),
      col("ts").as("click_ts"))
    i.join(c,
      col("i_user") === col("c_user") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <=
          // millisecond interval: an integer-second division would
          // truncate sub-second attribution windows (1500ms → 1s)
          col("imp_ts") + expr(s"INTERVAL $withinMs MILLISECOND"))
      .select(col("i_user").as("user_id"), col("campaign"),
        col("imp_ts"), col("click_ts"))
  }

  /** LEFT OUTER variant keyed on clicks: every click emits — joined to
    * its impression when one exists in the window, with NULL campaign
    * otherwise. The null row for an unmatched click can only be emitted
    * once the impression-side WATERMARK has passed the end of the
    * click's attribution window (before that, a matching impression
    * could still arrive) — so outer results trail the watermark by the
    * interval length. StreamJoinSpec drives this batch-by-batch: no
    * null row before the watermark passes, exactly one after. */
  def attributeClicksLeftOuter(impressions: DataFrame, clicks: DataFrame,
                               withinMs: Long): DataFrame = {
    val i = impressions.select(col("user_id").as("i_user"),
      col("ts").as("imp_ts"), col("campaign"))
    val c = clicks.select(col("user_id").as("c_user"),
      col("ts").as("click_ts"))
    c.join(i,
      col("i_user") === col("c_user") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <=
          col("imp_ts") + expr(s"INTERVAL $withinMs MILLISECOND"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("campaign"),
        col("imp_ts"), col("click_ts"))
  }
}
