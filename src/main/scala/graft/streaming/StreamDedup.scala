package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

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

  /** The dedup stream over everything currently in `dir`'s documents table
    * (AvailableNow), reduced to the one output that is deterministic no
    * matter which copy of each duplicate the state store kept first: the
    * SET of surviving content hashes. With an event time synthesized
    * densely from doc_id (1 ms apart), the whole corpus sits inside the
    * watermark horizon, so the kept set must equal the batch-distinct
    * hash set — which is exactly what the DuckDB oracle computes. The
    * eviction path (duplicates beyond the horizon surviving) is covered in
    * StreamDedupSpec; this entry data-checks the dedup itself. */
  def runAvailableNow(spark: SparkSession, dir: String): DataFrame = StreamConf.sized(spark) {
    val schema =
      graft.io.Sources.parquetSchema(spark, s"$dir/documents.parquet")
    // +1 day: a row whose event time equals the initial watermark (epoch 0)
    // would be filtered as late before reaching the dedup state.
    val docs = spark.readStream.schema(schema).parquet(s"$dir/documents.*")
      .withColumn("ts", timestamp_millis(col("doc_id") + lit(86400000L)))
    val q = dedupWithinWatermark(docs, "text", "ts")
      .select(md5(col("text")).as("content_hash"))
      .writeStream.format("memory").queryName("graft_streaming_dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table("graft_streaming_dedup").orderBy("content_hash")
  }
}
