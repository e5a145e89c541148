package graft

/** Diagnostic arbiter: times a query's DataFrame CONSTRUCTION separately
  * from its EXECUTION (noop sink), for `passes` passes in one session —
  * `BenchSplit <name> [passes]`. Construction time is real driver-side
  * cost the full bench charges to the query (plan analysis, eager
  * builder work like zipWithIndex's count job or an AQE-materializing
  * localCheckpoint); this split attributes it. Found in r16: 2.5 s of
  * f_dsir_weights' 3.7 s at sf0.1 is construction (the GlobalIndex count
  * job executes the whole upstream pipeline before the action starts). */
object BenchSplit {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("f_dsir_weights")
    val passes = if (args.length > 1) args(1).toInt else 4
    val spark = HarnessSession.build()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = SparkEntry.queries
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime
      val df = q(name)(spark, dir)
      val t1 = System.nanoTime
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime
      println(f"pass $i $name construct=${(t1 - t0) / 1e9}%.2f " +
        f"exec=${(t2 - t1) / 1e9}%.2f")
      ext.Dedup.releaseScratch()
      if (name.startsWith("streaming_")) streaming.StreamHygiene.release(spark)
    }
    spark.stop()
  }
}
