package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: "hot" 30%, "warm" 15%, the rest spread over 200 values
  private val n = 10000
  private val items: Seq[String] = {
    val r = new scala.util.Random(42)
    val raw = Seq.fill(3000)("hot") ++ Seq.fill(1500)("warm") ++
      (0 until (n - 4500)).map(_ => s"cold_${r.nextInt(200)}")
    r.shuffle(raw)
  }
  private val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong)

  test("MG sketch reports every value above the n/(k+1) threshold") {
    val k = 20
    val sketch = items.toDS().repartition(8)
      .select(FrequentItems.misraGries(k)).head().toMap
    assert(sketch.size <= k)
    val threshold = n.toDouble / (k + 1)
    trueCounts.filter(_._2 > threshold).foreach { case (item, true_) =>
      assert(sketch.contains(item), s"$item (freq $true_) missing from sketch")
    }
    // undercount bound: est <= true <= est + n/(k+1)
    sketch.foreach { case (item, est) =>
      val t = trueCounts.getOrElse(item, 0L)
      assert(est <= t, s"$item overcounted: est $est > true $t")
      assert(t - est <= threshold, s"$item undercount ${t - est} > $threshold")
    }
  }

  test("guarantees hold regardless of partitioning") {
    // MG merge is not associative, so exact counter values may differ
    // between partitionings — the CONTRACT (report + undercount bounds)
    // must hold for every one of them. Exact-value equality across runs
    // is deliberately NOT asserted (it would depend on shuffle-fetch
    // order, an environment accident).
    val threshold = n.toDouble / 11
    Seq(1, 4, 32).foreach { parts =>
      val sketch = items.toDS().repartition(parts)
        .select(FrequentItems.misraGries(10)).head().toMap
      assert(sketch.size <= 10)
      trueCounts.filter(_._2 > threshold).foreach { case (item, _) =>
        assert(sketch.contains(item), s"parts=$parts: $item missing")
      }
      sketch.foreach { case (item, est) =>
        val t = trueCounts.getOrElse(item, 0L)
        assert(est <= t && t - est <= threshold,
          s"parts=$parts: $item est=$est true=$t")
      }
    }
  }

  test("a_heavy_hitters_hicard's key saturates the sketch: distinct >> k") {
    // the query's own derived key over real events data — the bounded-memory
    // claim only means something when the sketch can't hold the distincts
    val k = 10
    val keyed = graft.io.Sources
      .table(spark, "/root/testdata/sf0.001", "events")
      .select(graft.queries.EngineQueries.hiCardKey.as("key"))
    val distinct = keyed.distinct().count()
    assert(distinct > 10L * k,
      s"key distinct count $distinct does not dwarf k=$k")
    // and the exact two-pass answer is non-empty: the hot keys clear n/(k+1)
    val n = keyed.count()
    val hot = keyed.groupBy("key").count()
      .filter(col("count") * (k + 1) > n).collect()
    assert(hot.nonEmpty, "no key clears the n/(k+1) bar — demo is vacuous")
    assert(hot.forall(_.getString(0).startsWith("hot_")))
  }

  test("k=1 degenerates to the majority-candidate (Boyer-Moore) element") {
    val maj = Seq.fill(60)("m") ++ (0 until 40).map(i => s"x$i")
    val sketch = maj.toDS().coalesce(1)
      .select(FrequentItems.misraGries(1)).head()
    assert(sketch.map(_._1) == Seq("m"), sketch.toString)
  }
}
