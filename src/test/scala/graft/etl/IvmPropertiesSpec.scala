package graft.etl

import graft.SparkSpec
import graft.queries.IncrementalQueries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential property tests for the incremental-view-maintenance
  * propagation identities behind `etl_incremental_join` and
  * `etl_incremental_kpis`, which the Verify oracle pins only at one fixed
  * delta split (orderkey%10 / custkey%7, even/odd day). Random insert-only
  * splits across seeds pin the identities themselves:
  *
  *  - Δ(A⋈B) = (ΔA ⋈ B') ∪ (A_old ⋈ ΔB): unioned with the old view
  *    A_old⋈B_old it must reproduce A'⋈B' as a MULTISET (duplicate join
  *    keys are deliberately generated — a set-level check would miss a
  *    delta that drops or double-counts multiplicities);
  *  - merge(partial(A₁..Aₖ)) ≡ full(A₁∪..∪Aₖ) for the algebraic KPI
  *    partials (count adds, decimal sum adds, HLL sketch unions — the
  *    sketch estimate must be IDENTICAL, not merely close, because
  *    sketch-union is deterministic for a fixed lgK).
  *
  * Retraction streams (incl. net-zero keys) are covered separately in
  * [[CdcPropertiesSpec]] against `IncrementalQueries.retractMerge`.
  */
class IvmPropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Multiset view of a small result for exact comparison. */
  private def multiset(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().toSeq.map(_.toSeq).groupBy(identity)
      .map { case (r, rs) => r -> rs.size }

  test("join-view delta ∪ old view reproduces the full join as a " +
      "multiset on random insert-only splits") {
    (1 to 6).foreach { seed =>
      val rng = new scala.util.Random(300 + seed)
      // duplicate join keys on BOTH sides: A rows reuse custkeys, B holds
      // up to 2 rows per custkey — multiplicities in the join output
      val aAll = (1 to 80).map { i =>
        (i.toLong, rng.nextInt(12).toLong, s"p${rng.nextInt(4)}")
      }
      val bAll = (0 to 11).flatMap { k =>
        (0 until (1 + rng.nextInt(2))).map(j =>
          (k.toLong, s"seg${rng.nextInt(3)}-$j"))
      }
      // insert-only split: every row lands in exactly one of old/delta;
      // either delta may be empty (a nightly load touching one side only)
      val (dA, oA) = aAll.partition(_ => rng.nextDouble() < 0.3)
      val (dB, oB) = bAll.partition(_ => rng.nextDouble() < 0.25)
      val aOld = oA.toDF("o_orderkey", "o_custkey", "pay")
      val deltaA = dA.toDF("o_orderkey", "o_custkey", "pay")
      val bOld = oB.toDF("c_custkey", "seg")
      val deltaB = dB.toDF("c_custkey", "seg")
      val bNew = bOld.unionByName(deltaB)
      val aNew = aOld.unionByName(deltaA)
      val cond = col("o_custkey") === col("c_custkey")
      val got = multiset(aOld.join(bOld, cond).unionByName(
        IncrementalQueries.joinDelta(aOld, deltaA, bNew, deltaB, cond)))
      val want = multiset(aNew.join(bNew, cond))
      assert(got === want,
        s"seed $seed: delta-maintained view ≠ full recompute")
    }
  }

  test("merged KPI partials equal the full recompute (counts, decimal " +
      "sums, and the exact HLL estimate) on random batch splits") {
    (1 to 5).foreach { seed =>
      val rng = new scala.util.Random(400 + seed)
      val rows = (1 to 120).map { _ =>
        (s"t${rng.nextInt(4)}", rng.nextInt(25).toLong,
          new java.math.BigDecimal(rng.nextInt(5000) - 1000)
            .movePointLeft(2))
      }
      def df(xs: Seq[(String, Long, java.math.BigDecimal)]): DataFrame =
        xs.toDF("event_type", "user_id", "v")
          .withColumn("v", col("v").cast("decimal(18,6)"))
      // k-way random split, k in 2..4; same user appears across batches
      // (the sketch must not double-count a user the merge sees twice)
      val k = 2 + rng.nextInt(3)
      val batches = rows.groupBy(_ => rng.nextInt(k)).values.toSeq
      def finish(merged: DataFrame): Map[String, (Long, BigDecimal, Double)] =
        merged.select(col("event_type"), col("n"), col("sv"),
            hll_sketch_estimate(col("sk")).as("est"))
          .as[(String, Long, java.math.BigDecimal, Double)]
          .collect().map(r => r._1 -> ((r._2, BigDecimal(r._3), r._4))).toMap
      val got = finish(IncrementalQueries.kpiMerge(
        batches.map(b => IncrementalQueries.kpiPartial(df(b)))))
      // the full baseline is ONE direct aggregation over all rows — no
      // merge machinery on this side, so the comparison is genuinely
      // differential
      val full = finish(IncrementalQueries.kpiPartial(df(rows)))
      assert(got === full, s"seed $seed (k=$k): merged ≠ full")
      // and the exact scalars against a driver-side fold
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val (n, sv, _) = got(g)
        assert(n === rs.size.toLong, s"seed $seed $g: count")
        assert(sv === BigDecimal(rs.map(_._3).reduce(_ add _)),
          s"seed $seed $g: sum")
      }
    }
  }
}
