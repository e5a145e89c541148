package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Event-time timers on transformWithState: sessions close when the
  * WATERMARK passes last-event + gap (handleExpiredTimer), not when new
  * input for the key arrives — quiet keys drain themselves. */
class IdleSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp((600 + min) * 60000L)
  private val gapMs = 30 * 60 * 1000L

  test("timer fires once the watermark passes the idle gap; stale timers don't") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(provider)
    spark.conf.set(provider, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val pairs = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), unix_millis(col("ts")).as("t"))
      .as[(Long, Long)]
    val q = RunningCounts.idleSessions(pairs, gapMs)
      .writeStream.format("memory").queryName("graft_idle_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      def sessions() = spark.table("graft_idle_sessions")
        .filter($"user_id" === 1L)
        .as[RunningCounts.IdleSession].collect().toSeq

      // two events for user 1; timer armed at last + 30 min
      mem.addData(Seq((1L, ts(0)), (1L, ts(5))))
      q.processAllAvailable()
      assert(sessions().isEmpty, "session closed before the gap elapsed")

      // heartbeat advances the watermark past ts(5) + gap...
      mem.addData(Seq((99L, ts(90))))
      q.processAllAvailable()
      // ...and the NEXT batch fires timers against that watermark
      mem.addData(Seq((99L, ts(95))))
      q.processAllAvailable()

      val got = sessions()
      assert(got == Seq(RunningCounts.IdleSession(1L, 2L,
        ts(5).getTime)), s"got $got")

      // the key is drained: nothing further emits for user 1
      mem.addData(Seq((99L, ts(200))))
      q.processAllAvailable()
      assert(sessions().size == 1)
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(provider))(spark.conf.set(provider, _))
    }
  }
}
