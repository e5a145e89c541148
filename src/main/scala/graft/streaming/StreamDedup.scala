package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental counterpart of
  * `ext/Dedup.exactGroups` for a training-data ingest stream.
  *
  * `dropDuplicatesWithinWatermark` keeps state only for the watermark
  * horizon: a duplicate arriving within `delay` of the first copy is
  * dropped; state for older keys is evicted. That bounds state by
  * (arrival rate × delay), not stream length — unbounded-horizon streaming
  * dedup is impossible without unbounded state, so the horizon IS the
  * design decision, made explicit here.
  *
  * Keys on the content hash, not the content: state stores 16-byte digests
  * rather than document bodies.
  */
object StreamDedup {

  /** Drop rows whose `textCol` content was already seen within the
    * watermark horizon. `tsCol` must be the stream's event-time column. */
  def dedupWithinWatermark(stream: DataFrame, textCol: String, tsCol: String,
                           delay: String = "1 hour"): DataFrame =
    stream
      .withColumn("_content_hash", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("_content_hash")
      .drop("_content_hash")
}
