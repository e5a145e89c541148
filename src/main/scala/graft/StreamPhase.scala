package graft
/** Diagnostic arbiter: phase timing of one AvailableNow streaming query —
  * session conf + plan resolve (start()), batch execution (first progress
  * to termination), and stop/teardown — to attribute the streaming
  * family's per-query driver constant. */
object StreamPhase {
  def main(args: Array[String]): Unit = {
    val spark = HarnessSession.build()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    // warm the JVM on one throwaway run
    val q0 = SparkEntry.queries
    q0("streaming_hourly_counts")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    streaming.StreamHygiene.release(spark)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime
      val schema = io.Sources.parquetSchema(spark, s"$dir/events.parquet")
      val src = io.Sources.normalizeTs(
        spark.readStream.schema(schema).parquet(s"$dir/events.*"),
        io.Sources.tsIsNanosAnnotated(spark, s"$dir/events.parquet"))
      val agg = src.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val t1 = System.nanoTime
      val q = agg.writeStream.format("memory")
        .queryName(s"phase_probe_$i").outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      val t2 = System.nanoTime
      q.awaitTermination()
      val t3 = System.nanoTime
      q.recentProgress.foreach { pr =>
        println(s"  PROG batch=${pr.batchId} rows=${pr.numInputRows} " +
          s"durationMs=${pr.durationMs}")
      }
      spark.table(s"phase_probe_$i").collect()
      streaming.StreamHygiene.release(spark)
      val t4 = System.nanoTime
      println(f"PHASE $i build=${(t1-t0)/1e6}%.0fms start=${(t2-t1)/1e6}%.0fms run=${(t3-t2)/1e6}%.0fms drain=${(t4-t3)/1e6}%.0fms total=${(t4-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
