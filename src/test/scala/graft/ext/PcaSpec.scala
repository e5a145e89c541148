package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  private lazy val emb =
    graft.io.Sources.table(spark, "/root/testdata/sf0.01", "embeddings")

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("fit is bit-identical under repartitioning (integer moment sums)") {
    val m1 = Pca.fit(emb)
    val m2 = Pca.fit(emb.repartition(13))
    assert(m1.n == m2.n)
    assert(m1.mean.toSeq == m2.mean.toSeq)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq ==
      m2.components.map(_.toSeq).toSeq)
  }

  test("jacobiEigen invariants on random symmetric matrices (6 seeds)") {
    // A·V = V·Λ, orthonormal V, trace preserved — checked on random
    // symmetric inputs including a NEAR-DEGENERATE one (c·I + tiny
    // perturbation), where naive sweep orderings can stall or emit
    // non-orthogonal vectors for the clustered eigenvalues
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val d = 6
    (1L to 6L).foreach { seedNo =>
      val raw = Gen.listOfN(d * d, Gen.chooseNum(-100, 100))
        .pureApply(Gen.Parameters.default, Seed(seedNo))
        .map(_ / 10.0).toArray
      val degenerate = seedNo % 3 == 0
      val a = Array.tabulate(d, d) { (i, j) =>
        val s = (raw(i * d + j) + raw(j * d + i)) / 2.0
        if (degenerate) (if (i == j) 5.0 else 0.0) + s / 1e4 else s
      }
      val (vals, vmat) = Pca.jacobiEigen(a.map(_.clone()))
      // eigenvector i is COLUMN i of the returned matrix (scaladoc)
      val vecs = Array.tabulate(d)(i => Array.tabulate(d)(r => vmat(r)(i)))
      // orthonormal eigenbasis
      for (i <- 0 until d; j <- i until d) {
        val e = if (i == j) 1.0 else 0.0
        assert(math.abs(dot(vecs(i), vecs(j)) - e) < 1e-8,
          s"seed $seedNo V$i.V$j")
      }
      // eigen equation per pair, against the ORIGINAL matrix
      for (i <- 0 until d) {
        val av = Array.tabulate(d)(r => dot(a(r), vecs(i)))
        val resid = math.sqrt(av.zip(vecs(i).map(_ * vals(i)))
          .map { case (x, y) => (x - y) * (x - y) }.sum)
        assert(resid < 1e-7, s"seed $seedNo eigpair $i residual $resid")
      }
      // trace preservation
      val tr = (0 until d).map(i => a(i)(i)).sum
      assert(math.abs(tr - vals.sum) < 1e-7, s"seed $seedNo trace")
    }
  }

  test("components are orthonormal; eigenvalues descend and are ~nonnegative") {
    val m = Pca.fit(emb)
    for (i <- 0 until 8; j <- i until 8) {
      val d = dot(m.components(i), m.components(j))
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-8, s"W${i}.W${j} = $d")
    }
    m.eigenvalues.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-12)
    }
    assert(m.eigenvalues.forall(_ > -1e-9))
  }

  test("projected component variance equals its eigenvalue") {
    val m = Pca.fit(emb)
    val proj = Pca.project(emb, m, k = 3)
      .select(element_at(col("projected"), 1).as("p0"),
        element_at(col("projected"), 2).as("p1"),
        element_at(col("projected"), 3).as("p2"))
    val vars = proj.agg(var_samp(col("p0")), var_samp(col("p1")),
      var_samp(col("p2"))).head()
    for (c <- 0 until 3) {
      val got = vars.getDouble(c)
      val want = m.eigenvalues(c)
      assert(math.abs(got - want) <= 1e-4 * math.max(1.0, want),
        s"component $c variance $got != eigenvalue $want")
    }
    // top-1 really is the max-variance direction: λ0 strictly dominates
    assert(m.eigenvalues(0) > m.eigenvalues(2))
  }

  test("mahalanobis: E[md2] ~ d on the corpus; a far-out point stands out") {
    val m = Pca.fit(emb)
    val used = m.eigenvalues.count(_ > 1e-9)
    val mean = Pca.mahalanobis(emb, m)
      .agg(avg(col("md2"))).head().getDouble(0)
    // for in-distribution data md2 averages ~rank (chi-square mean)
    assert(mean > used * 0.8 && mean < used * 1.2,
      s"mean md2 $mean far from rank $used")
    val far = spark.range(1).select(lit(9999L).as("vec_id"),
      typedLit(Array.fill(64)(1.0f)).as("embedding"))
    val farMd2 = Pca.mahalanobis(far, m).head().getDouble(1)
    assert(farMd2 > 10 * mean,
      s"outlier md2 $farMd2 not separated from mean $mean")
  }

  test("projection equals explicit centering for a sampled row") {
    val m = Pca.fit(emb)
    val row = emb.select(col("vec_id"),
      col("embedding").cast("array<double>")).head()
    val v = row.getSeq[Double](1).toArray
    val id = row.getLong(0)
    val got = Pca.project(emb.filter(col("vec_id") === id), m, k = 2)
      .head().getSeq[Double](1)
    for (c <- 0 until 2) {
      val want = dot(v.zip(m.mean).map { case (x, mu) => x - mu },
        m.components(c))
      assert(math.abs(got(c) - want) < 1e-9)
    }
  }
}
