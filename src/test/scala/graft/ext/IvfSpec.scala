package graft.ext

import graft.SparkSpec
import graft.io.Sources

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Sources.table(spark, "/root/testdata/sf0.001",
    "embeddings")
  private lazy val queries = emb.filter($"vec_id" < 10)

  test("IVF build is deterministic for a fixed seed") {
    val a = Ivf.build(emb).assignments.select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    val b = Ivf.build(emb).assignments.select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    assert(a == b)
    assert(a.size == emb.count())
  }

  test("IVF search recall vs brute force, and it scans fewer vectors") {
    val index = Ivf.build(emb, cells = 8)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Ivf.search(index, queries, k = 5, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every query must return results, from probed cells only
    assert(approx.keySet == exact.keySet)
    val recall = exact.map { case (q, ids) =>
      approx.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size
    }.sum / exact.size
    // 3 of 8 cells probed on unclusterable gaussian data still finds a
    // meaningful share of true neighbors; exact bound is data-dependent,
    // the invariant is "well above random" (random ≈ nprobe-independent
    // 5/500 per pick)
    assert(recall >= 0.3, s"recall@5 too low: $recall")
  }

  test("recall@5 is monotonically non-decreasing in nprobe (curve in SCALE.md)") {
    val index = Ivf.build(emb, cells = 8)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val curve = Seq(1, 2, 4, 8).map { nprobe =>
      val approx = Ivf.search(index, queries, k = 5, nprobe = nprobe)
        .select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = exact.map { case (q, ids) =>
        approx.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size
      }.sum / exact.size
      nprobe -> recall
    }
    info("recall@5 by nprobe (8 cells, sf0.001 embeddings): " +
      curve.map { case (np, r) => f"nprobe=$np%d -> $r%.2f" }.mkString(", "))
    curve.sliding(2).foreach { case Seq((npA, a), (npB, b)) =>
      assert(b >= a, f"recall fell from $a%.3f (nprobe=$npA) " +
        f"to $b%.3f (nprobe=$npB)")
    }
    // probing every cell IS brute force: recall must be exactly 1
    assert(curve.last._2 == 1.0, s"nprobe=cells recall ${curve.last._2} != 1")
  }
}
