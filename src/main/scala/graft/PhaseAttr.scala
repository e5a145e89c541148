package graft

/** Diagnostic arbiter: driver-phase attribution for one query —
  * `PhaseAttr <name> [runs]`. Prints Spark's own QueryPlanningTracker
  * phase wall times (analysis / optimization / planning) plus total
  * construct+execute seconds per run, isolating where a driver-heavy
  * query (task time ≪ wall) spends its per-run constant. */
object PhaseAttr {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("pipeline_pretrain")
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = HarnessSession.build()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = SparkEntry.queries
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    try queries.CoreQueries.warmShared(spark, dir)
    catch { case scala.util.control.NonFatal(_) => () }
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          events.add(f"jobStart ${j.jobId} t=${j.time}")
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          events.add(f"jobEnd   ${j.jobId} t=${j.time}")
      })
    def compiles = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    def compMs = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
    (1 to runs).foreach { i =>
      val c0 = compiles
      val t0 = System.nanoTime
      val df = q(name)(spark, dir)
      val t1 = System.nanoTime
      val qe = df.queryExecution
      qe.assertAnalyzed()
      val ta = System.nanoTime
      qe.optimizedPlan
      val to = System.nanoTime
      qe.executedPlan
      val tp = System.nanoTime
      events.clear()
      val w0 = System.currentTimeMillis
      // dump RUNNABLE stacks during the pre-first-job window
      val dumper = new Thread(new Runnable {
        def run(): Unit = Seq(300L, 700L, 1100L).foreach { d =>
          Thread.sleep(d match { case 300 => 300; case x => 400 })
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                !t.getName.contains("dump") && st.exists(f =>
                  f.getClassName.startsWith("org.apache.spark") ||
                  f.getClassName.startsWith("org.codehaus") ||
                  f.getClassName.startsWith("scala")))
              println(s"  DUMP r$i+${d} [${t.getName}] " + (
                if (st.exists(_.getClassName.contains("janino")))
                  "JANINO <- " + st.filter(f =>
                    f.getClassName.startsWith("org.apache.spark") ||
                    f.getClassName.startsWith("graft"))
                    .take(10).mkString(" <- ")
                else st.take(6).mkString(" <- ")))
          }
        }
      })
      dumper.setDaemon(true); dumper.start()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime
      org.apache.spark.sql.GraftShims.drainListenerBus(spark)
      import scala.jdk.CollectionConverters._
      events.asScala.toSeq.foreach { e =>
        val ms = e.split("t=")(1).toLong - w0
        println(s"  EV +${ms}ms ${e.split(" t=")(0)}")
      }
      println(f"SPLIT $i analyze=${(ta - t1) / 1e9}%.3f " +
        f"optimize=${(to - ta) / 1e9}%.3f plan=${(tp - to) / 1e9}%.3f " +
        f"act=${(t2 - tp) / 1e9}%.3f cg=${compiles - c0}")
      val phases = df.queryExecution.tracker.phases
      val p = phases.toSeq.sortBy(_._1).map { case (k, v) =>
        f"$k=${(v.endTimeMs - v.startTimeMs) / 1000.0}%.3f"
      }.mkString(" ")
      val rules = df.queryExecution.tracker.topRulesByTime(8).map {
        case (rule, s) =>
          f"${rule.split('.').last}=${s.totalTimeNs / 1e9}%.3f"
      }.mkString(" ")
      println(f"PHASE $i $name constr=${(t1 - t0) / 1e9}%.3f " +
        f"exec=${(t2 - t1) / 1e9}%.3f | $p")
      println(s"RULES $i $rules")
    }
    spark.stop()
  }
}
