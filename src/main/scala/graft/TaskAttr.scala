package graft
/** Diagnostic arbiter: per-query task WALL vs CPU vs GC attribution —
  * `TaskAttr <name>[,<name>…]`. A wall≫CPU gap means tasks are BLOCKED
  * (lock, I/O), not computing; found the r16 audio-SPI serialization
  * (46 task-wall s vs 2 CPU s) and the shuffle-file syscall share. */
object TaskAttr {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.scheduler._
    import java.util.concurrent.atomic.AtomicLong
    val spark = HarnessSession.build()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val wall = new AtomicLong(0); val cpu = new AtomicLong(0)
    val gc = new AtomicLong(0); val n = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) {
          wall.addAndGet(t.taskInfo.duration); n.incrementAndGet()
          if (t.taskMetrics != null) {
            cpu.addAndGet(t.taskMetrics.executorCpuTime / 1000000L)
            gc.addAndGet(t.taskMetrics.jvmGCTime)
          }
        }
    })
    val q = SparkEntry.queries
    val names = args(0).split(",").toSeq
    (1 to 2).foreach { pass =>
      names.foreach { name =>
        wall.set(0); cpu.set(0); gc.set(0); n.set(0)
        val t0 = System.nanoTime
        q(name)(spark, dir).write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime - t0) / 1e9
        org.apache.spark.sql.GraftShims.drainListenerBus(spark)
        println(f"ATTR $pass $name%-32s total=$total%6.2f tasks=${n.get}%4d " +
          f"wall=${wall.get / 1000.0}%7.1f cpu=${cpu.get / 1000.0}%7.1f " +
          f"gc=${gc.get / 1000.0}%5.1f waitRatio=${
            if (cpu.get > 0) wall.get.toDouble / cpu.get else -1.0}%5.1f")
        ext.Dedup.releaseScratch()
        if (name.startsWith("streaming_")) streaming.StreamHygiene.release(spark)
      }
    }
    spark.stop()
  }
}
