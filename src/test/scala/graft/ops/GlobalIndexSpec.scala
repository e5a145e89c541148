package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalIndexSpec extends SparkSpec {
  import spark.implicits._

  test("row ids are 1..n in key order, matching a global ROW_NUMBER") {
    // deliberately scrambled input partitioning
    val df = spark.range(0, 1000).select((($"id" * 2654435761L) % 997L)
      .as("k")).repartition(7).distinct()
    val got = GlobalIndex.withRowId(df, Seq($"k"), partitions = 5)
      .select($"k", $"row_id").as[(Long, Long)].collect().sortBy(_._1)
    val want = df.withColumn("row_id",
        row_number().over(Window.orderBy($"k")).cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("ids stay consecutive and sorted with duplicate keys") {
    val df = Seq(3L, 1L, 2L, 1L, 3L, 3L).toDF("k").repartition(3)
    val got = GlobalIndex.withRowId(df, Seq($"k"), partitions = 2)
      .select($"k", $"row_id").as[(Long, Long)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == (1L to 6L))         // consecutive
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted) // key-sorted
  }

  test("one materialization: ids consistent with exchange reuse OFF") {
    // r16 pin. An attempted pure-DataFrame rewrite (counts branch +
    // output branch as separate plan subtrees over one range exchange)
    // CORRUPTED ids whenever the frame carried a payload column beyond
    // the order keys: column pruning made the two branches' exchanges
    // canonically different, each branch re-sampled its own range
    // boundaries, and the per-partition counts silently stopped matching
    // the output stream (caught by the f_epoch_shuffle differential).
    // The shipped implementation shares ONE physical RDD between
    // zipWithIndex's count job and the output scan, which makes ids
    // consistent BY CONSTRUCTION — this test pins that property under
    // the hostile config (no exchange reuse, payload column, sampled
    // boundaries) so any future reimplementation must preserve it.
    val prev = spark.conf.getOption("spark.sql.exchange.reuse")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      (1 to 3).foreach { run =>
        val df = spark.range(0, 1000)
          .select((($"id" * 2654435761L) % 9973L).as("k"),
            md5($"id".cast("string")).as("payload"))
        val ids = GlobalIndex.withRowId(df, Seq($"k"), partitions = 5)
          .select($"row_id").as[Long].collect().sorted.toSeq
        assert(ids == (1L to 1000L), s"run $run: ids not consecutive")
      }
    } finally prev.fold(spark.conf.unset("spark.sql.exchange.reuse"))(v =>
      spark.conf.set("spark.sql.exchange.reuse", v))
  }

  test("ids survive aggressive AQE settings") {
    // AQE coalescing must never change the assigned ids: the explicit
    // partition count (REPARTITION_BY_NUM origin) keeps AQE's hands off
    // the range exchange, and the shared-RDD count job sees exactly the
    // partitioning the output scan sees.
    val prevCoalesce =
      spark.conf.getOption("spark.sql.adaptive.coalescePartitions.enabled")
    val prevAdvisory =
      spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1048576")
    try {
      val df = spark.range(0, 500).select((($"id" * 13L) % 499L).as("k"))
      val got = GlobalIndex.withRowId(df, Seq($"k"), partitions = 7)
        .orderBy($"row_id").select($"k").as[Long].collect().toSeq
      assert(got == got.sorted)
      val n = GlobalIndex.withRowId(df, Seq($"k"), partitions = 7)
        .agg(org.apache.spark.sql.functions.max($"row_id")).as[Long].head()
      assert(n == df.count())
    } finally {
      prevCoalesce.fold(spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.enabled"))(v =>
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", v))
      prevAdvisory.fold(spark.conf.unset(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes"))(v =>
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v))
    }
  }
}
