package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.functions.col

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64
  private def mix(x: Long): Long = {
    // splitmix-style scramble: deterministic stand-in for a uniform hash
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & Long.MaxValue // keep non-negative
  }

  test("state is the exact set below k distincts (estimate exact)") {
    val hashes = (1L to 40L).map(mix)
    val ds = (hashes ++ hashes ++ hashes).toDS().repartition(7)
    val st = ds.select(F.udaf(new KmvSketch(K), Encoders.scalaLong)(col("value")))
      .head().getSeq[Long](0)
    assert(st == hashes.distinct.sorted,
      "below k the sketch must hold exactly the distinct hash set")
  }

  test("state equals the k smallest distinct hashes, any partitioning") {
    val hashes = (1L to 5000L).map(mix)
    val expected = hashes.distinct.sorted.take(K)
    for (parts <- Seq(1, 4, 13)) {
      val st = hashes.toDS().repartition(parts)
        .select(F.udaf(new KmvSketch(K), Encoders.scalaLong)(col("value")))
        .head().getSeq[Long](0)
      assert(st == expected, s"KMV state differs at $parts partitions")
    }
  }

  test("duplicates never change the state (set semantics)") {
    val hashes = (1L to 1000L).map(mix)
    val dup = hashes ++ hashes.take(500) ++ hashes.takeRight(100)
    val a = hashes.toDS().repartition(5)
      .select(F.udaf(new KmvSketch(K), Encoders.scalaLong)(col("value")))
      .head().getSeq[Long](0)
    val b = dup.toDS().repartition(3)
      .select(F.udaf(new KmvSketch(K), Encoders.scalaLong)(col("value")))
      .head().getSeq[Long](0)
    assert(a == b)
  }

  test("estimator lands within 4 standard errors of the truth") {
    // rel std err ≈ 1/sqrt(k-2); 4σ keeps the deterministic fixture safe
    val maxH = Long.MaxValue.toDouble
    for (n <- Seq(500, 5000, 50000)) {
      val st = (1L to n.toLong).map(mix).toDS().repartition(8)
        .select(F.udaf(new KmvSketch(K), Encoders.scalaLong)(col("value")))
        .head().getSeq[Long](0)
      val est = (K - 1).toDouble * maxH / st.last.toDouble
      val relErr = math.abs(est - n) / n
      val bound = 4.0 / math.sqrt(K - 2.0)
      assert(relErr < bound, s"n=$n est=$est relErr=$relErr > $bound")
    }
  }
}
