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

  test("grouped running sum matches window SUM on random skewed inputs (5 seeds)") {
    // randomized group/partition interactions: group sizes from 1 to
    // ~half the input (so groups span several range partitions), string
    // keys, negative values, duplicate order keys broken by a unique id —
    // the boundary-chaining walk is the code under test
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(300, for {
      g <- Gen.frequency(5 -> Gen.const("big"), 3 -> Gen.oneOf("m1", "m2"),
        2 -> Gen.chooseNum(0, 30).map(i => s"s$i"))
      o <- Gen.chooseNum(0L, 40L)
      v <- Gen.chooseNum(-50L, 50L)
    } yield (g, o, v))
    (1L to 5L).foreach { seedNo =>
      val rows = gen.pureApply(Gen.Parameters.default, Seed(seedNo))
        .zipWithIndex.map { case ((g, o, v), i) => (g, o, v, i.toLong) }
      val df = rows.toDF("g", "o", "v", "uid").repartition(7)
      val got = PrefixSum.groupedRunningSum(df, Seq("g"),
          Seq($"o", $"uid"), "v", "run", partitions = 6)
        .select($"uid", $"run").as[(Long, Long)].collect().toMap
      val want = df.withColumn("run", sum($"v").over(
          Window.partitionBy($"g").orderBy($"o", $"uid")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select($"uid", $"run").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed $seedNo")
    }
  }

  test("empty partitions contribute zero offset") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val got = PrefixSum.runningSum(df, Seq($"k"), "v", "run", partitions = 8)
      .select($"k", $"run").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L), (2L, 30L), (3L, 60L)))
  }

  test("grouped running sum equals the per-group window SUM") {
    // Skewed groups so the range partitioner makes ONE group span many
    // partitions (the boundary-chaining path) while others fit inside a
    // single partition; partitions > rows-per-small-group also exercises
    // empty and single-group partitions.
    // o = a bijection of id (unique ⇒ total order per group, so the
    // window twin is deterministic), scattered so within-group order is
    // uncorrelated with id ranges
    val df = spark.range(0, 3000)
      .select(
        when($"id" < 2400, lit("big"))
          .when($"id" < 2700, lit("mid"))
          .otherwise(concat(lit("s"), ($"id" % 5L).cast("string")))
          .as("g"),
        (($"id" * 1117L) % 3001L).as("o"),
        (($"id" % 11L) - 4L).as("v"))
      .repartition(8)
    val got = PrefixSum.groupedRunningSum(df, Seq("g"), Seq($"o"), "v",
        "run", partitions = 16)
      .select($"g", $"o", $"run").as[(String, Long, Long)]
      .collect().sortBy(t => (t._1, t._2))
    val want = df.withColumn("run", sum($"v").over(
        Window.partitionBy($"g").orderBy($"o")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select($"g", $"o", $"run").as[(String, Long, Long)]
      .collect().sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
  }

  test("grouped: one group filling several partitions chains offsets") {
    // 1000 rows of a single group across 8 partitions: every partition
    // after the first needs the full chained trailing sums of ALL its
    // predecessors (firstKey == lastKey throughout the run).
    val df = spark.range(0, 1000)
      .select(lit("only").as("g"), $"id".as("o"), lit(1L).as("v"))
    val got = PrefixSum.groupedRunningSum(df, Seq("g"), Seq($"o"), "v",
        "run", partitions = 8)
      .select($"o", $"run").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == (0L until 1000L).map(i => i -> (i + 1)))
  }

  test("grouped: NaN and -0.0 double keys follow Spark grouping semantics") {
    // Scala == unboxes numerics (NaN != NaN, 0.0 == -0.0 but distinct
    // bits), while Spark grouping treats all NaN as one group and -0.0 as
    // 0.0 — the boundary walk must agree with Spark, including chains of
    // NaN-keyed rows across partition boundaries
    val df = spark.range(0, 300).select(
      when($"id" % 3 === 0, lit(Double.NaN))
        .when($"id" % 3 === 1, lit(-0.0d)).otherwise(lit(7.5d)).as("g"),
      $"id".as("o"), lit(1L).as("v"))
    val got = PrefixSum.groupedRunningSum(df, Seq("g"), Seq($"o"), "v",
        "run", partitions = 8)
      .select($"o", $"run").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val want = df.withColumn("run", sum($"v").over(
        Window.partitionBy($"g").orderBy($"o")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select($"o", $"run").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
    // each of the 3 groups ends with a running count of 100
    assert(got.map(_._2).max == 100L)
  }

  test("grouped: non-value-comparable group keys are rejected at plan time") {
    // binary/array keys compare by reference inside the boundary walk —
    // cross-partition chaining would silently break, so fail loud instead
    val bin = spark.range(0, 10)
      .select(encode(lit("k"), "UTF-8").as("g"), $"id".as("o"),
        lit(1L).as("v"))
    val e1 = intercept[IllegalArgumentException] {
      PrefixSum.groupedRunningSum(bin, Seq("g"), Seq($"o"), "v")
    }
    assert(e1.getMessage.contains("binary"))
    val arr = spark.range(0, 10)
      .select(array(lit(1)).as("g"), $"id".as("o"), lit(1L).as("v"))
    intercept[IllegalArgumentException] {
      PrefixSum.groupedRunningSum(arr, Seq("g"), Seq($"o"), "v")
    }
  }
}
