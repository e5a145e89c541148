package graft

import org.apache.spark.sql.GraftShims

/** Session-degradation repro harness: `BenchDrift [rounds] [cleanup]`.
  *
  * Interleaves a fixed cheap canary query (`q1_agg`) with full passes over
  * the `streaming_*` query family and logs, per round: canary seconds,
  * cumulative JVM GC millis, live thread count, and loaded state-store
  * provider count. A canary that climbs round-over-round while the code is
  * unchanged is SESSION degradation (resource accumulation), not a plan
  * regression — exactly the r6 bench failure mode, where unique
  * per-invocation streaming state dirs made every pass register fresh
  * state-store providers that outlived their query.
  *
  * With the `cleanup` arg, the post-query hygiene that `Bench`/`Verify`
  * apply ([[graft.streaming.StreamHygiene.release]]) runs after every
  * round — the fix-verification mode: canary/threads/providers must stay
  * flat.
  */
object BenchDrift {
  def main(args: Array[String]): Unit = {
    // toIntOption, not isDigit+toInt: "" passes forall-isDigit and a
    // too-long digit string overflows — both should fall back, not crash
    val rounds = args.headOption.flatMap(_.toIntOption).filter(_ > 0)
      .getOrElse(6)
    val cleanup = args.contains("cleanup")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = HarnessSession.build()
    val qs = SparkEntry.queries
    val streaming = qs.keys.filter(_.startsWith("streaming_")).toSeq.sorted

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

    run("q1_agg") // warm the canary so round 1 is comparable
    (1 to rounds).foreach { r =>
      val canary = run("q1_agg")
      println(f"[drift] round=$r canary=$canary%.3fs gcMs=$gcMillis " +
        f"threads=${Thread.activeCount()} " +
        f"providers=${GraftShims.loadedStateStoreProviders()}")
      streaming.foreach(run)
      if (cleanup) graft.streaming.StreamHygiene.release(spark)
    }
    val canary = run("q1_agg")
    println(f"[drift] final canary=$canary%.3fs gcMs=$gcMillis " +
      f"threads=${Thread.activeCount()} " +
      f"providers=${GraftShims.loadedStateStoreProviders()}")
    // thread-name histogram (digits collapsed): names the accumulator when
    // the count climbs — "which pool leaked" is the entire diagnosis
    import scala.jdk.CollectionConverters._
    Thread.getAllStackTraces.keySet.asScala.toSeq
      .groupBy(_.getName.replaceAll("[0-9]+", "N")).toSeq
      .map { case (n, ts) => (ts.size, n) }.sortBy(-_._1).take(12)
      .foreach { case (c, n) => println(f"[drift] thread $c%4d $n") }
    spark.stop()
  }
}
