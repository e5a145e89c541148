package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp((60 + min) * 60000L)

  test("streaming dedup drops in-horizon duplicates, keeps distinct content") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDF().toDF("id", "ts", "text")
    val q = StreamDedup.dedupWithinWatermark(stream, "text", "ts")
      .writeStream.format("memory").queryName("graft_stream_dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Seq(
        (1L, ts(0), "alpha"), (2L, ts(1), "beta"),
        (3L, ts(2), "alpha"))) // dup of id=1, same batch
      q.processAllAvailable()
      mem.addData(Seq(
        (4L, ts(10), "alpha"),  // dup within the 1h horizon → dropped
        (5L, ts(11), "gamma")))
      q.processAllAvailable()
      val kept = spark.table("graft_stream_dedup")
        .select("id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 5L))
    } finally q.stop()
  }
}
