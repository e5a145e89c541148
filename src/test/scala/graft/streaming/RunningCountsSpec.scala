package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** transformWithState end-to-end: totals accumulate across micro-batches
  * (state survives), each batch emits the updated cumulative value, and
  * the final per-key totals equal a batch count. Runs on the RocksDB
  * state-store provider, which the API requires. */
class RunningCountsSpec extends SparkSpec {
  import spark.implicits._

  test("running totals accumulate across batches and match batch counts") {
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    try {
      conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Long]
      val q = RunningCounts.runningTotals(mem.toDS()).writeStream
        .format("memory").queryName("graft_running_totals")
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        mem.addData(Seq(1L, 1L, 2L))
        q.processAllAvailable()
        mem.addData(Seq(1L, 2L, 2L, 3L))
        q.processAllAvailable()
        val rows = spark.table("graft_running_totals")
          .as[(Long, Long)].collect().toSeq
        // batch 1 emissions: (1,2),(2,1); batch 2: (1,3),(2,3),(3,1)
        assert(rows.toSet == Set((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L),
          (3L, 1L)))
        // last emission per key == plain batch count of everything fed
        val finalTotals = rows.groupBy(_._1).map { case (k, vs) =>
          k -> vs.map(_._2).max }
        assert(finalTotals == Map(1L -> 3L, 2L -> 3L, 3L -> 1L))
      } finally q.stop()
    } finally saved.fold(conf.unset(key))(conf.set(key, _))
  }

  test("randomized multi-batch totals and MapState type counts equal " +
      "the driver fold for any batch split (3 seeds)") {
    // Property pin for the transformWithState processors: random events,
    // random batch boundaries — update-mode emissions are cumulative, so
    // the MAX emitted value per key must equal the plain count of
    // everything fed, for ANY assignment of events to micro-batches. The
    // MapState twin must agree per (user, type); both ride RocksDB (the
    // API's required provider), so the property also exercises state
    // round-trips through the store across batches.
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    try {
      conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      implicit val sqlCtx = spark.sqlContext
      (1 to 3).foreach { seed =>
        val rng = new scala.util.Random(700 + seed)
        val events = (1 to 90).map(_ =>
          (1L + rng.nextInt(6), s"t${rng.nextInt(3)}"))
        val k = 2 + rng.nextInt(3)
        val assign = events.map(_ => rng.nextInt(k))
        val batches = (0 until k).map(i =>
          events.zip(assign).collect { case (e, a) if a == i => e })

        val mem = MemoryStream[Long]
        val qn = s"graft_rt_prop_$seed"
        val q = RunningCounts.runningTotals(mem.toDS()).writeStream
          .format("memory").queryName(qn)
          .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
        try {
          batches.foreach { b => mem.addData(b.map(_._1)); q.processAllAvailable() }
          val got = spark.table(qn).as[(Long, Long)].collect()
            .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).max }
          val want = events.groupBy(_._1).map { case (u, es) =>
            u -> es.size.toLong }
          assert(got == want, s"seed $seed totals")
        } finally q.stop()

        val memT = MemoryStream[(Long, String)]
        val qnT = s"graft_tt_prop_$seed"
        val qT = RunningCounts.typeTotals(memT.toDS()).writeStream
          .format("memory").queryName(qnT)
          .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
        try {
          batches.foreach { b => memT.addData(b); qT.processAllAvailable() }
          val got = spark.table(qnT)
            .as[(Long, String, Long)].collect()
            .groupBy(r => (r._1, r._2))
            .map { case (k2, vs) => k2 -> vs.map(_._3).max }
          val want = events.groupBy(identity)
            .map { case (k2, es) => k2 -> es.size.toLong }
          assert(got == want, s"seed $seed type counts")
        } finally qT.stop()
      }
    } finally saved.fold(conf.unset(key))(conf.set(key, _))
  }
}
