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

  test("batch sessionization matches a brute-force gap merge (5 seeds)") {
    // randomized (user, ts) streams with duplicate timestamps: equal-time
    // events give gap 0 under ANY window tie order, so the outcome must be
    // deterministic even though the lag order over ties is not
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(60, for {
      u <- Gen.chooseNum(1L, 4L)
      m <- Gen.chooseNum(0L, 500L)
    } yield (u, m))
    val gap = 40 * 60000L
    (1L to 5L).foreach { seedNo =>
      val rows = gen.pureApply(Gen.Parameters.default, Seed(seedNo))
      val df = rows.map { case (u, m) => (u, ts(m)) }.toDF("user_id", "ts")
      val got = Sessionize.batch(df, gap)
        .select("user_id", "session_start_ms", "session_end_ms", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (u, es) =>
        val sorted = es.map { case (_, m) => ts(m).getTime }.sorted
        sorted.foldLeft(List.empty[(Long, Long, Long)]) {
          case ((s0, l0, n0) :: rest, t) if t - l0 <= gap =>
            (s0, t, n0 + 1) :: rest
          case (acc, t) => (t, t, 1L) :: acc
        }.map { case (s0, l0, n0) => (u, s0, l0, n0) }
      }.toSet
      assert(got == want, s"seed $seedNo")
    }
  }

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

  test("two pre-session out-of-order events merge with each other") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    // 4h allowed lateness: the early pair must survive the stateful
    // operator's late-row filter (Spark drops rows behind the watermark
    // before they reach flatMapGroupsWithState)
    val stream = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "4 hours")
      .as[Sessionize.SessionEvent]
    val q = Sessionize.streaming(stream, gapMs).writeStream
      .format("memory").queryName("graft_sessions_early")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Seq((9L, ts(100)))) // open session at +100
      q.processAllAvailable()
      // both events fall more than a gap BEFORE the open session but within
      // one gap of each other → they must form ONE 2-event session (the
      // batch formulation's answer), not two singletons
      mem.addData(Seq((9L, ts(0)), (9L, ts(5))))
      q.processAllAvailable()
      mem.addData(Seq((99L, ts(10000))))
      q.processAllAvailable()
      mem.addData(Seq((99L, ts(20000))))
      q.processAllAvailable()
      val streamed = spark.table("graft_sessions_early")
        .filter($"user_id" === 9L)
        .select("session_start_ms", "session_end_ms", "n_events")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == Set(
        (ts(0).getTime, ts(5).getTime, 2L),
        (ts(100).getTime, ts(100).getTime, 1L)))
    } finally q.stop()
  }

  test("backward-only batch after session expiry closes it instead of crashing") {
    implicit val sqlCtx = spark.sqlContext
    // The crash window needs the data invocation to happen in the same
    // batch whose EVICTION watermark already passed the session's timeout,
    // while the late-row filter (previous batch's watermark) still admits
    // the event. A no-data micro-batch between the two would fire the
    // timeout first and hide the bug, so disable it for this query.
    val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.getOption(noData)
    spark.conf.set(noData, "false")
    val mem = MemoryStream[(Long, Timestamp)]
    val stream = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "30 minutes")
      .as[Sessionize.SessionEvent]
    val q = Sessionize.streaming(stream, gapMs).writeStream
      .format("memory").queryName("graft_sessions_expired")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // session 0..10 opens; the same batch's heartbeat pushes the NEXT
      // batch's eviction watermark far past the session timeout (+10+gap)
      mem.addData(Seq((8L, ts(0)), (8L, ts(10)), (99L, ts(10000))))
      q.processAllAvailable()
      // data invocation preempts the timeout invocation; the merged session
      // still ends at +10, and its timeout (+10+gap) is BEHIND the eviction
      // watermark — setTimeoutTimestamp would throw IllegalArgumentException
      // and kill the query. The session must be emitted closed instead,
      // with the backward event folded in.
      mem.addData(Seq((8L, ts(5))))
      q.processAllAvailable()
      mem.addData(Seq((99L, ts(20000))))
      q.processAllAvailable()
      mem.addData(Seq((99L, ts(30000))))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val streamed = spark.table("graft_sessions_expired")
        .filter($"user_id" === 8L)
        .select("session_start_ms", "session_end_ms", "n_events")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == Set((ts(0).getTime, ts(10).getTime, 3L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(noData, v)
        case None => spark.conf.unset(noData)
      }
    }
  }

  test("session_window emits the same sessions in streaming as in batch") {
    // the point of the native operator: the IDENTICAL groupBy compiles to
    // an incremental stateful plan on a stream — assert result parity
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val agg = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("start"), $"n_events")
    val q = agg.writeStream.format("memory")
      .queryName("graft_native_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // user 2's event rides in batch 1: once user 1's +120 event advances
      // the watermark, a 0-second-delay stream would late-filter it
      mem.addData(eventRows.take(3) :+ eventRows(5))
      q.processAllAvailable()
      mem.addData(eventRows.slice(3, 5))
      q.processAllAvailable()
      mem.addData(Seq((99L, ts(10000))))
      q.processAllAvailable()
      mem.addData(Seq((99L, ts(20000))))
      q.processAllAvailable()
      val streamed = spark.table("graft_native_sessions")
        .filter($"user_id" < 90)
        .as[(Long, Timestamp, Long)].collect().toSet
      val batch = eventRows.toDF("user_id", "ts")
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"w.start".as("start"), $"n_events")
        .as[(Long, Timestamp, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("randomized multi-batch streaming equals the batch fold (3 seeds × 2 modes)") {
    // Property pin for the multi-open-session state model: random event
    // sets, random batch boundaries, two delivery regimes —
    //  generous: 200h lateness, events split into ARBITRARY batches (all
    //    sessions stay open across batches; every batch exercises the
    //    merge of new events into multi-session state);
    //  strict: 0s lateness, batches are CONTIGUOUS time slices delivered
    //    in order (the watermark advances and seals sessions mid-stream,
    //    exercising the close/keep partition and the timeout path).
    // In both regimes nothing is ever late-filtered, so streaming output
    // must equal the batch gap-merge EXACTLY.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    implicit val sqlCtx = spark.sqlContext
    val gen = for {
      evs <- Gen.listOfN(40, for {
        u <- Gen.chooseNum(1L, 3L)
        m <- Gen.chooseNum(0L, 400L)
      } yield (u, m))
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, 39))
    } yield (evs, cuts)
    (1L to 3L).foreach { seedNo =>
      val (evs, cuts) = gen.pureApply(Gen.Parameters.default, Seed(seedNo))
      val batchDf = evs.map { case (u, m) => (u, ts(m)) }.toDF("user_id", "ts")
      val want = Sessionize.batch(batchDf, gapMs)
        .select("user_id", "session_start_ms", "session_end_ms", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      Seq("generous", "strict").foreach { mode =>
        val batches: Seq[Seq[(Long, Timestamp)]] = mode match {
          case "generous" =>
            val bounds = (cuts :+ 0 :+ evs.length).distinct.sorted
            bounds.zip(bounds.tail).map { case (a, b) =>
              evs.slice(a, b).map { case (u, m) => (u, ts(m)) } }
          case _ =>
            val sorted = evs.sortBy(_._2)
            // never cut inside an equal-timestamp run: at 0s lateness the
            // first half would set the watermark TO that timestamp and
            // the second half would be late-dropped — a delivery
            // artifact, not operator behavior under test
            def snap(i: Int): Int = {
              var j = i
              while (j > 0 && j < sorted.length &&
                sorted(j - 1)._2 == sorted(j)._2) j += 1
              j
            }
            val bounds = (cuts.map(snap) :+ 0 :+ evs.length).distinct.sorted
            bounds.zip(bounds.tail).map { case (a, b) =>
              sorted.slice(a, b).map { case (u, m) => (u, ts(m)) } }
        }
        val mem = MemoryStream[(Long, Timestamp)]
        val stream = mem.toDF().toDF("user_id", "ts")
          .withWatermark("ts", if (mode == "generous") "200 hours"
                               else "0 seconds")
          .as[Sessionize.SessionEvent]
        val qn = s"graft_sessions_prop_${mode}_$seedNo"
        val q = Sessionize.streaming(stream, gapMs).writeStream
          .format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
        try {
          batches.filter(_.nonEmpty).foreach { b =>
            mem.addData(b); q.processAllAvailable()
          }
          mem.addData(Seq((99L, ts(100000)))); q.processAllAvailable()
          mem.addData(Seq((99L, ts(200000)))); q.processAllAvailable()
          val got = spark.table(qn).filter($"user_id" < 90)
            .select("user_id", "session_start_ms", "session_end_ms",
              "n_events")
            .as[(Long, Long, Long, Long)].collect().toSet
          assert(got == want, s"seed $seedNo mode $mode")
        } finally q.stop()
      }
    }
  }

  test("non-late bridging event merges two still-open sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    // 4h lateness: after batch 1 (max event +50) the watermark sits hours
    // BEFORE both events, so neither session is sealed yet and the +25
    // bridge in batch 2 is fully in-watermark — streaming must produce the
    // single 3-event session the batch formulation derives, not close the
    // +0 singleton early and leave a [25, 50] remnant
    val stream = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "4 hours")
      .as[Sessionize.SessionEvent]
    val q = Sessionize.streaming(stream, gapMs).writeStream
      .format("memory").queryName("graft_sessions_bridge")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Seq((6L, ts(0)), (6L, ts(50)))) // two sessions, gap 50' > 30'
      q.processAllAvailable()
      mem.addData(Seq((6L, ts(25)))) // bridges them: 25-0 and 50-25 ≤ gap
      q.processAllAvailable()
      mem.addData(Seq((99L, ts(10000))))
      q.processAllAvailable()
      mem.addData(Seq((99L, ts(20000))))
      q.processAllAvailable()
      val streamed = spark.table("graft_sessions_bridge")
        .filter($"user_id" === 6L)
        .select("session_start_ms", "session_end_ms", "n_events")
        .as[(Long, Long, Long)].collect().toSeq
      assert(streamed == Seq((ts(0).getTime, ts(50).getTime, 3L)))
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
