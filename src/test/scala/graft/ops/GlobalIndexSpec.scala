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
}
