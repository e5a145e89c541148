package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("distributed running sum equals the single-reducer window SUM") {
    val df = spark.range(0, 2000)
      .select((($"id" * 2654435761L) % 1999L).as("k"),
        (($"id" % 7L) - 3L).as("v"))
      .distinct().repartition(8)
    val got = PrefixSum.runningSum(df, Seq($"k"), "v", "run", partitions = 5)
      .select($"k", $"run").as[(Long, Long)].collect().sortBy(_._1)
    val want = df.withColumn("run", sum($"v").over(
        Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, 0)))
      .select($"k", $"run").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("empty partitions contribute zero offset") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val got = PrefixSum.runningSum(df, Seq($"k"), "v", "run", partitions = 8)
      .select($"k", $"run").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L), (2L, 30L), (3L, 60L)))
  }
}
