package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sinks.compact: many tiny files become `targetFiles` files with
  * byte-identical data, atomically (no temp/backup dirs left behind),
  * and a second compaction is a no-op-shaped rewrite (idempotent). */
class CompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && f.isFile).toSeq

  test("compact shrinks the file count, keeps the data, leaves no debris") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = spark.range(0, 10000)
      .select(col("id"), (col("id") % 97).as("k"))
    df.repartition(64).write.parquet(dir)
    assert(parquetFiles(dir).size === 64)
    val before = spark.read.parquet(dir).agg(
      count(lit(1)), sum("id"), sum("k")).collect()(0)

    Sinks.compact(spark, dir, 4)

    assert(parquetFiles(dir).size === 4)
    val after = spark.read.parquet(dir).agg(
      count(lit(1)), sum("id"), sum("k")).collect()(0)
    assert(after === before)
    // atomic swap committed: no temp or backup dirs remain
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("_graft_tmp")))
    assert(!parent.listFiles().exists(_.getName.contains("_graft_old")))

    // idempotent: compacting an already-compact table keeps everything
    Sinks.compact(spark, dir, 4)
    assert(parquetFiles(dir).size === 4)
    assert(spark.read.parquet(dir).count() === 10000)
  }

  test("compact refuses a hive-partitioned location instead of flattening") {
    val dir = Files.createTempDirectory("graft_compact_part").toString + "/t"
    spark.range(0, 100)
      .select(col("id"), (col("id") % 3).as("cell"))
      .write.partitionBy("cell").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Sinks.compact(spark, dir, 2)
    }
    assert(e.getMessage.contains("hive-partitioned"))
    // the layout must be untouched: partition dirs still present
    assert(Option(new java.io.File(dir).listFiles()).get
      .count(f => f.isDirectory && f.getName.startsWith("cell=")) == 3)
    // and compacting one LEAF partition dir still works
    Sinks.compact(spark, dir + "/cell=0", 1)
    assert(parquetFiles(dir + "/cell=0").size === 1)
    assert(spark.read.parquet(dir).count() === 100)
  }

  test("compact fails a missing path with a clear message, not a raw " +
      "Hadoop exception") {
    val gone = Files.createTempDirectory("graft_compact_gone").toString +
      "/never_written"
    val e = intercept[IllegalArgumentException] {
      Sinks.compact(spark, gone, 2)
    }
    assert(e.getMessage.contains("does not exist"), e.getMessage)
  }
}
