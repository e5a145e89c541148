package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Checkpoint recovery — the operational property every production
  * stream depends on: after a stop (crash, deploy, rescale), a restart
  * from the same checkpoint RESTORES aggregation state and RESUMES from
  * the committed offsets. The spec proves both halves separately:
  * cumulative counts after restart include pre-restart data (state
  * recovered), while the restarted run's input rows are exactly the new
  * file's (offsets recovered — nothing reprocessed, nothing double-
  * counted). This is the exactly-once contract at the aggregate level;
  * the sink-side half (idempotent upsert on replay) is
  * `streaming_upsert_replay`. */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("restart from checkpoint: state restored, offsets not reprocessed") {
    val in = java.nio.file.Files.createTempDirectory("graft_ckpt_in").toFile
    val chk = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    try {
      val schema = StructType(Seq(StructField("k", StringType),
        StructField("v", LongType)))
      def writeFile(name: String, rows: Seq[(String, Long)]): Unit =
        rows.toDF("k", "v").repartition(1).write.mode("append")
          .parquet(in.getAbsolutePath)

      writeFile("f1", Seq(("a", 1L), ("a", 2L), ("b", 3L)))
      def run(sink: String): org.apache.spark.sql.streaming.StreamingQuery =
        spark.readStream.schema(schema).parquet(in.getAbsolutePath)
          .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
          .writeStream.outputMode("complete").format("memory")
          .queryName(sink)
          .option("checkpointLocation", chk.getAbsolutePath)
          .trigger(Trigger.AvailableNow()).start()

      val q1 = run("graft_rec1")
      q1.awaitTermination()
      val first = spark.table("graft_rec1").as[(String, Long, Long)]
        .collect().toSet
      assert(first == Set(("a", 2L, 3L), ("b", 1L, 3L)))

      // "crash": q1 is gone; new data lands; a NEW query resumes from the
      // same checkpoint
      writeFile("f2", Seq(("a", 10L), ("c", 5L)))
      val q2 = run("graft_rec2")
      q2.awaitTermination()
      val second = spark.table("graft_rec2").as[(String, Long, Long)]
        .collect().toSet
      // state recovered: 'a' and 'b' carry their pre-restart counts
      assert(second == Set(("a", 3L, 13L), ("b", 1L, 3L), ("c", 1L, 5L)),
        s"state not recovered across restart: $second")
      // offsets recovered: the restarted run read ONLY the new file's rows
      val reprocessed = q2.recentProgress.map(_.numInputRows).sum
      assert(reprocessed == 2L,
        s"restart reprocessed committed data: $reprocessed input rows")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(in)
      org.apache.commons.io.FileUtils.deleteDirectory(chk)
      spark.sql("DROP VIEW IF EXISTS graft_rec1")
      spark.sql("DROP VIEW IF EXISTS graft_rec2")
    }
  }

  test("maxFilesPerTrigger paces the backlog into bounded micro-batches") {
    val in = java.nio.file.Files.createTempDirectory("graft_pace_in").toFile
    val chk = java.nio.file.Files.createTempDirectory("graft_pace").toFile
    try {
      val schema = StructType(Seq(StructField("k", StringType),
        StructField("v", LongType)))
      (1 to 3).foreach { i =>
        Seq((s"k$i", i.toLong)).toDF("k", "v").repartition(1)
          .write.mode("append").parquet(in.getAbsolutePath)
      }
      // a replay of a deep backlog must not become one giant batch: the
      // source option caps files per micro-batch, bounding batch state,
      // memory, and commit size — AvailableNow still drains everything
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in.getAbsolutePath)
        .groupBy($"k").agg(sum($"v").as("sv"))
        .writeStream.outputMode("complete").format("memory")
        .queryName("graft_paced")
        .option("checkpointLocation", chk.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      assert(spark.table("graft_paced").count() == 3L)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 3,
        s"expected 3 paced micro-batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows == 1L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(in)
      org.apache.commons.io.FileUtils.deleteDirectory(chk)
      spark.sql("DROP VIEW IF EXISTS graft_paced")
    }
  }
}
