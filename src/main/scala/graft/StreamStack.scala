package graft

/** Diagnostic arbiter: stack histogram of the micro-batch driver thread
  * (and executor tasks) during repeated AvailableNow runs of one
  * streaming query — attributes the addBatch gap the progress metrics
  * leave opaque. `StreamStack <name> [runs]`. */
object StreamStack {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("streaming_hourly_counts")
    val runs = if (args.length > 1) args(1).toInt else 4
    val spark = HarnessSession.build()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = SparkEntry.queries
    q(name)(spark, dir).write.format("noop").mode("overwrite").save()
    streaming.StreamHygiene.release(spark)
    val hist = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()
    @volatile var sampling = true
    val sampler = new Thread(new Runnable {
      def run(): Unit = while (sampling) {
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          val n = t.getName
          if ((n.contains("stream execution") || n.contains("microBatch") ||
               n.startsWith("Executor task launch")) && st.nonEmpty) {
            val tag = if (n.startsWith("Executor")) "EXEC" else "DRV "
            // skip parked-idle executor threads (between-task noise)
            val top = st.head.toString
            if (!(tag == "EXEC" && top.contains("Unsafe.park"))) {
              val key = tag + " " + st.take(6).mkString(" <- ")
              hist.computeIfAbsent(key,
                _ => new java.util.concurrent.atomic.AtomicLong())
                .incrementAndGet()
            }
          }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true); sampler.start()
    (1 to runs).foreach { _ =>
      q(name)(spark, dir).write.format("noop").mode("overwrite").save()
      streaming.StreamHygiene.release(spark)
    }
    sampling = false; Thread.sleep(30)
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2.get).take(25).foreach { case (k, v) =>
      println(s"SHIST ${v.get}  $k")
    }
    spark.stop()
  }
}
