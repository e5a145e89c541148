package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming formulation of the hourly KPIs (SURVEY §2.9).
  *
  * The reference has batch-only semantics (daily Airflow run re-reading the
  * whole S3 bucket; reference: dags/music_streaming_services_dag.py:26-41,374)
  * — this is the idiomatic upgrade the problem statement asked for but never
  * got: a file-source stream with event-time tumbling windows and a
  * watermark, processed incrementally. `Trigger.AvailableNow` gives exactly
  * the reference's "process everything currently in the bucket, then stop"
  * batch contract, while the same query runs continuously in production.
  *
  * At scale: state is bounded by the watermark horizon (2 h of hourly
  * windows × event types), checkpointing makes reruns incremental rather
  * than recomputing the bucket, and the pre-aggregation is streaming
  * partial — only (window, key) state lives in the store, never raw events.
  */
object StreamingKpis {

  /** Windowed play counts per (hour window, event_type) over a parquet
    * file-source stream. */
  def hourlyCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("plays"))
      .select(
        col("window.start").cast("date").cast("string").as("date"),
        hour(col("window.start")).as("hour"),
        col("event_type"), col("plays"))

  /** Run the streaming query over everything currently in `dir` and return
    * the final result table (memory sink, complete mode). */
  def runAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // File sources need an explicit schema; take it from a static read
    // (ts arrives as epoch-nano long — see graft.io.Sources.table).
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // glob, not a bare file path: the file stream source requires a
    // directory/glob to monitor.
    val raw = spark.readStream.schema(schema).parquet(s"$dir/events.*")
    // Same type guard as Sources.table: only rebuild when ts arrived as
    // epoch-nano longs; native-timestamp data passes through.
    val stream =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    val q = hourlyCounts(stream).writeStream
      .format("memory")
      .queryName("graft_streaming_hourly")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_streaming_hourly")
      .orderBy("date", "hour", "event_type")
  }
}
