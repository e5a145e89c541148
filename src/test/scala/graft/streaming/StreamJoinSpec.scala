package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp((60 + min) * 60000L)
  private val windowMs = 10 * 60 * 1000L // 10-minute attribution window

  // impressions: (user, ts, campaign); clicks: (user, ts)
  private val impressions = Seq(
    (1L, ts(0), "c1"), (1L, ts(30), "c2"), (2L, ts(5), "c1"))
  private val clicks = Seq(
    (1L, ts(4)),   // attributes to c1
    (1L, ts(33)),  // attributes to c2 (in a LATER micro-batch)
    (2L, ts(40)),  // outside every window → no attribution
    (3L, ts(6)))   // no impression for this user

  test("stream-stream interval join equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val impMem = MemoryStream[(Long, Timestamp, String)]
    val clkMem = MemoryStream[(Long, Timestamp)]
    val impStream = impMem.toDF().toDF("user_id", "ts", "campaign")
      .withWatermark("ts", "1 hour")
    val clkStream = clkMem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "1 hour")
    val q = StreamJoin.attributeClicks(impStream, clkStream, windowMs)
      .writeStream.format("memory").queryName("graft_attrib")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // clicks interleave across micro-batches; the c2 click arrives a
      // batch after its impression — the join state must still hold it
      impMem.addData(impressions.take(2))
      clkMem.addData(clicks.take(1))
      q.processAllAvailable()
      impMem.addData(impressions.drop(2))
      clkMem.addData(clicks.drop(1))
      q.processAllAvailable()
      // push watermarks far ahead so all joinable pairs are emitted
      impMem.addData(Seq((99L, ts(10000), "hb")))
      clkMem.addData(Seq((99L, ts(10000))))
      q.processAllAvailable()

      val streamed = spark.table("graft_attrib")
        .filter($"user_id" < 90)
        .select("user_id", "campaign", "imp_ts", "click_ts")
        .as[(Long, String, Timestamp, Timestamp)].collect().toSet
      val batch = StreamJoin.attributeClicks(
          impressions.toDF("user_id", "ts", "campaign"),
          clicks.toDF("user_id", "ts"), windowMs)
        .as[(Long, String, Timestamp, Timestamp)].collect().toSet
      assert(streamed == batch)
      assert(batch == Set(
        (1L, "c1", ts(0), ts(4)),
        (1L, "c2", ts(30), ts(33))))
    } finally q.stop()
  }

  test("left-outer interval join emits null rows only after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val impMem = MemoryStream[(Long, Timestamp, String)]
    val clkMem = MemoryStream[(Long, Timestamp)]
    // short watermark so the spec can push it past the join window
    val impStream = impMem.toDF().toDF("user_id", "ts", "campaign")
      .withWatermark("ts", "1 minute")
    val clkStream = clkMem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "1 minute")
    val q = StreamJoin
      .attributeClicksLeftOuter(impStream, clkStream, windowMs)
      .writeStream.format("memory").queryName("graft_attrib_outer")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      def rows() = spark.table("graft_attrib_outer")
        .filter($"user_id" === 3L).collect()

      // user 3 clicks with NO impression: the null row may not be
      // emitted yet — a matching impression could still arrive until
      // the impression watermark passes click_ts + window
      impMem.addData(impressions.take(2))
      clkMem.addData(Seq((3L, ts(6))))
      q.processAllAvailable()
      assert(rows().isEmpty,
        "outer row emitted before the watermark allowed it")

      // advance BOTH watermarks far past ts(6) + window
      impMem.addData(Seq((99L, ts(1000), "hb")))
      clkMem.addData(Seq((99L, ts(1000))))
      q.processAllAvailable()
      // state cleanup/emission may need one more empty-ish batch
      impMem.addData(Seq((98L, ts(2000), "hb2")))
      clkMem.addData(Seq((98L, ts(2000))))
      q.processAllAvailable()

      val r = rows()
      assert(r.length == 1, s"expected one outer row, got ${r.toSeq}")
      assert(r(0).isNullAt(r(0).fieldIndex("campaign")),
        "unmatched click must carry NULL campaign")
    } finally q.stop()
  }
}
