package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  private val cms = new CountMinSketch(4, 256)

  test("never undercounts; merge order does not matter") {
    // skewed key mix: one hot key, many cold ones
    val keys = Seq.fill(500)(7L) ++ (0L until 2000L)
    val whole = keys.foldLeft(cms.zero)(cms.reduce)
    val (l, r) = keys.splitAt(keys.size / 3)
    val merged = cms.merge(l.foldLeft(cms.zero)(cms.reduce),
      r.foldLeft(cms.zero)(cms.reduce))
    assert(whole.toSeq == merged.toSeq)

    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
    def est(x: Long): Long =
      cms.probeIndices(x).map(whole(_)).min
    exact.foreach { case (k, n) => assert(est(k) >= n, s"undercount at $k") }
    // ε-bound with e/width factor, deterministic for the fixed hashes
    val bound = math.ceil(math.E * keys.size / cms.width).toLong
    exact.foreach { case (k, n) =>
      assert(est(k) <= n + bound, s"overcount at $k: ${est(k)} vs $n+$bound")
    }
  }

  test("distributed aggregation equals local fold") {
    val keys = (0L until 3000L).map(i => i % 37L)
    val local = keys.foldLeft(cms.zero)(cms.reduce)
    val dist = keys.toDF("k").repartition(7)
      .agg(udaf(cms).apply(col("k")).as("sk"))
      .as[Array[Long]].head()
    assert(dist.toSeq == local.toSeq)
  }
}
