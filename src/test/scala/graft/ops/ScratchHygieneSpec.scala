package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the scratch-cache lifecycle the Verify/Bench runners depend on:
  * after `Scratch.releaseAll()` (via the runner-facing
  * `Dedup.releaseScratch()`), NO persisted RDD remains in the context and
  * no `InMemoryRelation` is reusable by a fresh identical plan. Guards the
  * r7 session-hygiene work: a future operator that persists outside the
  * Scratch registry (or a registry regression that drops a frame without
  * unpersisting) would accumulate MEMORY_AND_DISK blocks across the
  * 221-query suite and degrade the long-lived bench session — the exact
  * failure family the r6 bench record exposed for streaming state. */
class ScratchHygieneSpec extends SparkSpec {

  test("releaseAll leaves zero persisted RDDs and no reusable cache") {
    // clean slate: tests run sequentially in the forked JVM, so global
    // persistent-RDD assertions can't race another suite
    graft.ext.Dedup.releaseScratch()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)

    def frame = spark.range(1000).toDF("id")
      .withColumn("x", col("id") * 2 + 1)
    val scratched = Scratch.persist(frame)
    scratched.write.format("noop").mode("overwrite").save()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "the scratch persist should be live after the action")

    graft.ext.Dedup.releaseScratch()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releaseScratch must drain every Scratch persist from the context")
    // a fresh identical plan must plan as a fresh computation — a surviving
    // InMemoryRelation would mean the cache was dropped from the registry
    // but not from the session's cache manager
    assert(!frame.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"),
      "no InMemoryRelation may survive releaseAll for an identical plan")
  }

  test("GlobalIndex.withRowId is persist-free (no lifecycle obligation)") {
    import spark.implicits._
    graft.ext.Dedup.releaseScratch()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "v")
    val indexed = GlobalIndex.withRowId(df, Seq(col("k")))
    indexed.write.format("noop").mode("overwrite").save()
    // pinned by the r7 A/B (see withRowId's comment): no internal persist,
    // so ANY caller — including long-lived sessions that never touch the
    // Scratch registry — accumulates nothing per invocation
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "withRowId must not leave persisted RDDs behind")
    // and the ids are still the total-order row numbers
    assert(indexed.orderBy("row_id").select("k").as[Long].collect().toSeq
      == Seq(1L, 2L, 3L, 4L))
  }
}
