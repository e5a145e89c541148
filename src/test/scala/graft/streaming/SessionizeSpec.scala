package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gapMs = 30 * 60 * 1000L
  // offset by 1h: an event at exactly the initial watermark (0) is "late"
  private def ts(min: Long) = new Timestamp((60 + min) * 60000L)

  // user 1: events at +0,+10,+20 min (one session), then +120,+125 (second);
  // user 2: single event at +5.
  private val eventRows = Seq(
    (1L, ts(0)), (1L, ts(10)), (1L, ts(20)),
    (1L, ts(120)), (1L, ts(125)),
    (2L, ts(5)),
  )

  test("batch sessionization splits on gaps") {
    val out = Sessionize.batch(eventRows.toDF("user_id", "ts"), gapMs)
      .orderBy("user_id", "session_start_ms")
      .select("user_id", "session_start_ms", "session_end_ms", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 60 * 60000L, 80 * 60000L, 3L),
      (1L, 180 * 60000L, 185 * 60000L, 2L),
      (2L, 65 * 60000L, 65 * 60000L, 1L)))
  }

  test("streaming sessionization with event-time timeout matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val stream = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.SessionEvent]
    val q = Sessionize.streaming(stream, gapMs).writeStream
      .format("memory").queryName("graft_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: user 1's first session AND user 2's lone event — user 2
      // must arrive before the watermark passes its timestamp
      mem.addData(eventRows.take(3) :+ eventRows(5))
      q.processAllAvailable()
      mem.addData(eventRows.slice(3, 5)) // later events push the watermark
      q.processAllAvailable()
      // a far-future heartbeat closes every remaining session via timeout
      mem.addData(Seq((99L, ts(10000))))
      q.processAllAvailable()
      mem.addData(Seq((99L, ts(20000))))
      q.processAllAvailable()
      val streamed = spark.table("graft_sessions")
        .filter($"user_id" < 90)
        .select("user_id", "session_start_ms", "session_end_ms", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = Sessionize.batch(eventRows.toDF("user_id", "ts"), gapMs)
        .select("user_id", "session_start_ms", "session_end_ms", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("out-of-order event in a later batch extends the session backward") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val stream = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "30 minutes") // allow late events
      .as[Sessionize.SessionEvent]
    val q = Sessionize.streaming(stream, gapMs).writeStream
      .format("memory").queryName("graft_sessions_ooo")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Seq((7L, ts(20)), (7L, ts(25))))
      q.processAllAvailable()
      mem.addData(Seq((7L, ts(10)))) // late, within gap of start → merge
      q.processAllAvailable()
      mem.addData(Seq((99L, ts(10000))))
      q.processAllAvailable()
      mem.addData(Seq((99L, ts(20000))))
      q.processAllAvailable()
      val s = spark.table("graft_sessions_ooo").filter($"user_id" === 7L)
        .select("session_start_ms", "session_end_ms", "n_events")
        .as[(Long, Long, Long)].collect().toSeq
      assert(s == Seq((ts(10).getTime, ts(25).getTime, 3L)))
    } finally q.stop()
  }
}
