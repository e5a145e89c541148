package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.io.Sinks
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** The full streaming load story: micro-batches land through the keyed
  * upsert sink, so REPROCESSING a batch (restart, replay, at-least-once
  * source) cannot duplicate rows — the guarantee the reference's
  * COPY-append load lacked (SURVEY §2.9/2.11-2). */
class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch + upsertParquet is replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_supsert").resolve("t").toString
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = mem.toDF().toDF("event_id", "ts", "event_type")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sinks.upsertParquet(batch, dir, Seq("event_id"), "ts")
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      val rows = Seq(
        (1L, new Timestamp(1000L), "click"),
        (2L, new Timestamp(2000L), "view"))
      mem.addData(rows)
      q.processAllAvailable()
      assert(spark.read.parquet(dir).count() == 2)
      mem.addData(rows) // replay the same data — must not duplicate
      q.processAllAvailable()
      assert(spark.read.parquet(dir).count() == 2)
      mem.addData(Seq((2L, new Timestamp(3000L), "purchase"))) // newer wins
      q.processAllAvailable()
      val v = spark.read.parquet(dir).filter($"event_id" === 2L)
        .select("event_type").as[String].head()
      assert(v == "purchase")
    } finally q.stop()
  }
}
