package graft.io

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Exactly-once fencing contract of [[Sinks.mergeAdditive]] (ADVICE r5
  * medium): the fence is (batchId, content hash) — a true replay no-ops, a
  * replay whose composition CHANGED fails loudly instead of silently
  * dropping data, and the applied set compacts into one `_applied_batches`
  * file instead of accumulating per-batch marker files. */
class MergeAdditiveSpec extends SparkSpec {
  import spark.implicits._

  private def dir(): String =
    Files.createTempDirectory("graft_madd").toString + "/state"

  private def state(path: String): Map[String, Long] =
    spark.read.parquet(path).as[(String, Long)].collect().toMap

  test("batches accumulate; an identical replay is a no-op") {
    val path = dir()
    val b0 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val b1 = Seq(("a", 10L)).toDF("k", "v")
    Sinks.mergeAdditive(b0, path, Seq("k"), batchId = Some(0L))
    Sinks.mergeAdditive(b1, path, Seq("k"), batchId = Some(1L))
    assert(state(path) == Map("a" -> 11L, "b" -> 2L))
    // replay both, same content — state must be bit-identical
    Sinks.mergeAdditive(b0, path, Seq("k"), batchId = Some(0L))
    Sinks.mergeAdditive(b1, path, Seq("k"), batchId = Some(1L))
    assert(state(path) == Map("a" -> 11L, "b" -> 2L))
  }

  test("a replay with DIFFERENT composition fails loudly, state untouched") {
    val path = dir()
    Sinks.mergeAdditive(Seq(("a", 1L)).toDF("k", "v"), path, Seq("k"),
      batchId = Some(0L))
    val changed = Seq(("a", 1L), ("c", 7L)).toDF("k", "v")
    val e = intercept[IllegalStateException] {
      Sinks.mergeAdditive(changed, path, Seq("k"), batchId = Some(0L))
    }
    assert(e.getMessage.contains("DIFFERENT content"))
    assert(state(path) == Map("a" -> 1L)) // nothing applied, nothing lost
  }

  test("markers compact into one _applied_batches file") {
    val path = dir()
    (0L to 4L).foreach { b =>
      Sinks.mergeAdditive(Seq(("k", b)).toDF("k", "v"), path, Seq("k"),
        batchId = Some(b))
    }
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new Path(path)).map(_.getPath.getName).toSeq
    assert(names.count(_ == "_applied_batches") == 1)
    assert(!names.exists(_.startsWith("_applied_batch_")), names.toString)
    assert(state(path) == Map("k" -> 10L))
    // the compacted file carries every applied id
    val in = fs.open(new Path(path, "_applied_batches"))
    val text = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    val ids = text.split("\n").filter(_.nonEmpty).map(_.split(":")(0).toLong)
    assert(ids.toSeq == (0L to 4L))
  }

  test("legacy per-batch marker files still fence their id") {
    val path = dir()
    Sinks.mergeAdditive(Seq(("a", 1L)).toDF("k", "v"), path, Seq("k"),
      batchId = Some(0L))
    // simulate a pre-compaction state dir: hashless marker for batch 7
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(path, "_applied_batch_7"), true).close()
    Sinks.mergeAdditive(Seq(("z", 99L)).toDF("k", "v"), path, Seq("k"),
      batchId = Some(7L)) // hashless entry matches any replay of id 7
    assert(state(path) == Map("a" -> 1L))
  }

  test("the content fence is partition-order-invariant") {
    // a replay often arrives with different partitioning (recovered source,
    // different parallelism); identical ROWS must still hash identically
    val path = dir()
    val b = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("k", "v")
    Sinks.mergeAdditive(b.repartition(1), path, Seq("k"), batchId = Some(0L))
    Sinks.mergeAdditive(b.repartition(7, $"k"), path, Seq("k"),
      batchId = Some(0L)) // same rows, different layout — must no-op
    assert(state(path) == Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L))
  }

  test("unfenced merges (no batchId) always apply") {
    val path = dir()
    val b = Seq(("a", 1L)).toDF("k", "v")
    Sinks.mergeAdditive(b, path, Seq("k"))
    Sinks.mergeAdditive(b, path, Seq("k"))
    assert(state(path) == Map("a" -> 2L))
  }
}
