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

  test("randomized multi-batch interval join equals the batch join " +
      "(3 seeds × 2 regimes)") {
    // Property pin for the interval-join state (the r11 sessionize fix
    // proved random batch splits find bugs single-split specs miss):
    // random impression/click sets, random batch boundaries, two
    // delivery regimes —
    //  generous: 300h lateness, rows split into ARBITRARY batches (a
    //    click may precede its impression by whole batches; nothing is
    //    late-filtered or evicted, so state must hold both sides);
    //  strict: 0s lateness, batches are CONTIGUOUS time slices in
    //    order — the watermark advances and EVICTS join state
    //    mid-stream, but a contiguous in-order delivery can never need
    //    an evicted row (any click joining an evicted impression lies
    //    behind the watermark, i.e. in an already-delivered slice).
    // In both regimes the streamed result must equal the batch join
    // EXACTLY, as a set of matches.
    implicit val sqlCtx = spark.sqlContext
    (1 to 3).foreach { seed =>
      val rng = new scala.util.Random(500 + seed)
      val imps = (1 to 35).map { _ =>
        (1L + rng.nextInt(5), ts(rng.nextInt(240)), s"c${rng.nextInt(3)}")
      }
      val clicks = (1 to 35).map { _ =>
        (1L + rng.nextInt(5), ts(rng.nextInt(240)))
      }
      val want = StreamJoin.attributeClicks(
          imps.toDF("user_id", "ts", "campaign"),
          clicks.toDF("user_id", "ts"), windowMs)
        .as[(Long, String, Timestamp, Timestamp)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      Seq(true, false).foreach { generous =>
        val delay = if (generous) "300 hours" else "0 seconds"
        val k = 2 + rng.nextInt(3)
        // generous: arbitrary assignment; strict: contiguous time slices
        // (slice index grows with ts) delivered in order
        def sliceOf[A](tsOf: A => Timestamp)(xs: Seq[A]): Seq[Seq[A]] =
          if (generous) {
            val tagged = xs.map(x => rng.nextInt(k) -> x)
            (0 until k).map(i => tagged.filter(_._1 == i).map(_._2))
          } else {
            val cuts = (1 until k)
              .map(_ => ts(rng.nextInt(240)).getTime).sorted
            (0 to k - 1).map { i =>
              val lo = if (i == 0) Long.MinValue else cuts(i - 1)
              val hi = if (i == k - 1) Long.MaxValue else cuts(i)
              xs.filter(x => tsOf(x).getTime >= lo && tsOf(x).getTime < hi)
            }
          }
        val impBatches = sliceOf[(Long, Timestamp, String)](_._2)(imps)
        val clkBatches = sliceOf[(Long, Timestamp)](_._2)(clicks)
        val impMem = MemoryStream[(Long, Timestamp, String)]
        val clkMem = MemoryStream[(Long, Timestamp)]
        val name = s"graft_attrib_prop_${seed}_$generous"
        val q = StreamJoin.attributeClicks(
            impMem.toDF().toDF("user_id", "ts", "campaign")
              .withWatermark("ts", delay),
            clkMem.toDF().toDF("user_id", "ts").withWatermark("ts", delay),
            windowMs)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
        try {
          impBatches.zip(clkBatches).foreach { case (ib, cb) =>
            impMem.addData(ib)
            clkMem.addData(cb)
            q.processAllAvailable()
          }
          // heartbeats flush any residual state-backed emission
          impMem.addData(Seq((99L, ts(100000), "hb")))
          clkMem.addData(Seq((99L, ts(100000))))
          q.processAllAvailable()
          assert(q.exception.isEmpty, s"query died: ${q.exception}")
          val got = spark.table(name)
            .filter($"user_id" < 90)
            .select("user_id", "campaign", "imp_ts", "click_ts")
            .as[(Long, String, Timestamp, Timestamp)].collect()
            .groupBy(identity).view.mapValues(_.length).toMap
          assert(got === want,
            s"seed $seed ${if (generous) "generous" else "strict"}")
        } finally q.stop()
      }
    }
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
