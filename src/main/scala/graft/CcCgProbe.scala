package graft

/** Diagnostic arbiter: Janino compile counts per connected-components
  * round — `CcCgProbe [runs]`. Builds the same candidate-pair input the
  * dedup_apply path feeds, runs `Dedup.connectedComponents` `runs`
  * times in one session, and prints the compile-count delta per run;
  * run 2+ deltas are codegen-cache MISSES (per-round or per-run varying
  * generated source). */
object CcCgProbe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val spark = HarnessSession.build()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def compiles = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    val docs = io.Sources.table(spark, dir, "documents")
    val pairs = ext.Dedup.candidatesFrom(ext.Dedup.minhashSignatures(docs))
      .localCheckpoint(true)
    (1 to runs).foreach { i =>
      val c0 = compiles
      val t0 = System.nanoTime
      val cc = ext.Dedup.connectedComponents(pairs)
      cc.write.format("noop").mode("overwrite").save()
      println(f"CCCG run $i compiles=${compiles - c0} " +
        f"wall=${(System.nanoTime - t0) / 1e9}%.2f")
      ext.Dedup.releaseScratch()
    }
    spark.stop()
  }
}
