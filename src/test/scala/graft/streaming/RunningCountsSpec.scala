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
}
