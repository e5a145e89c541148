package graft
/** Diagnostic arbiter: Janino (re)compilation volume per suite pass via
  * CodegenMetrics — `CodegenProbe [nQueries]`. Found the r16 codegen
  * cache thrash (warm pass recompiled 1,119 of ~1,300 units at the
  * 100-entry default). */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = HarnessSession.build()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = SparkEntry.queries
    val names = q.keys.toSeq.sorted.take(args.headOption.map(_.toInt).getOrElse(70))
    def hist = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    (1 to 2).foreach { pass =>
      val c0 = hist.getCount
      val t0 = System.nanoTime
      names.foreach { n =>
        try q(n)(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"FAIL $n ${e.getMessage}") }
        ext.Dedup.releaseScratch()
        if (n.startsWith("streaming_")) streaming.StreamHygiene.release(spark)
      }
      val wall = (System.nanoTime - t0) / 1e9
      println(f"CG pass $pass wall=$wall%.1f compiles=${hist.getCount - c0}")
    }
    spark.stop()
  }
}
