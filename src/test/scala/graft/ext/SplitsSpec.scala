package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  test("assignment is stable under repartitioning and row additions") {
    val a = Splits.assign(ids, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    val b = Splits.assign(ids.repartition(13), "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b)
    // adding rows must not move existing assignments
    val c = Splits.assign((0L until 4000L).toDF("id"), "id")
      .filter($"id" < 2000).select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == c)
  }

  test("split fractions land near the requested percentages") {
    val counts = Splits.assign(ids, "id").groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 1600L) < 100, counts.toString)
    assert(math.abs(counts("val") - 200L) < 60, counts.toString)
    assert(math.abs(counts("test") - 200L) < 60, counts.toString)
  }

  test("stratifiedSample keeps per-stratum hash buckets; default for the rest") {
    val events = ids.withColumn("kind",
      element_at(array(lit("view"), lit("click"), lit("purchase"), lit("other")),
        (col("id") % 4 + 1).cast("int")))
    val pcts = Map("purchase" -> 100, "view" -> 10)
    val kept = Splits.stratifiedSample(events, "id", "kind", pcts, defaultPct = 30)
      .select("id", "kind").as[(Long, String)].collect()
    val buckets = Splits.assign(ids, "id").select("id", "bucket")
      .as[(Long, Long)].collect().toMap
    val all = events.select("id", "kind").as[(Long, String)].collect()
    val expected = all.filter { case (id, kind) =>
      buckets(id) < pcts.getOrElse(kind, 30)
    }
    assert(kept.sortBy(_._1).toSeq == expected.sortBy(_._1).toSeq)
    // pct=100 stratum is kept in full
    assert(kept.count(_._2 == "purchase") == all.count(_._2 == "purchase"))
    // deterministic: rerun returns identical rows
    val again = Splits.stratifiedSample(events, "id", "kind", pcts, 30)
      .select("id", "kind").as[(Long, String)].collect()
    assert(again.sortBy(_._1).toSeq == kept.sortBy(_._1).toSeq)
  }

  test("sample(pct) selects exactly the rows below the bucket threshold") {
    val sampled = Splits.sample(ids, "id", 10).as[Long].collect().toSet
    val buckets = Splits.assign(ids, "id").select("id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert(sampled == buckets.filter(_._2 < 10).keySet)
    // nested samples: a 5% sample is a subset of the 10% sample
    val smaller = Splits.sample(ids, "id", 5).as[Long].collect().toSet
    assert(smaller.subsetOf(sampled))
  }
}
