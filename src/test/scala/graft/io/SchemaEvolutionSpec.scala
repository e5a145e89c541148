package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema evolution on the lake: batches written before a column
  * existed must stay readable next to batches written after.
  * mergeSchema unifies the footers at read time; rows from old files
  * carry NULL for the new column. (The production setting is to pin
  * the read schema explicitly — also shown — since mergeSchema is a
  * footer-scan of every file, O(files) at planning time.) */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("old and new parquet batches read together; old rows null-fill") {
    val root = Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$root/batch=1")
    Seq((3L, "c", 9.5), (4L, "d", 7.0)).toDF("id", "name", "score")
      .write.parquet(s"$root/batch=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.toSet === Set("id", "name", "score", "batch"))
    assert(merged.count() === 4)
    assert(merged.filter(col("score").isNull).select("id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))

    // the explicit-schema path (no footer sweep): same result
    val pinned = spark.read.schema(merged.schema.copy()).parquet(root)
    assert(pinned.count() === 4)
    assert(pinned.filter(col("score").isNotNull).count() === 2)
  }
}
