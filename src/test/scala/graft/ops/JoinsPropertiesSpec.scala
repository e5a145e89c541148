package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Differential property test for the as-of join: for ANY generated input
  * (null keys, null times, equal-time ties, keys missing on either side),
  * all four direction × strictness variants must match a brute-force
  * per-row reference evaluated in plain Scala. The union+window
  * formulation's edge semantics all live in sort-order details (tag
  * ordering, null placement), exactly the kind of thing a fixed fixture
  * with clean data never exercises — the r10 null-timed-left-row bug in
  * the forward direction is the motivating example. */
object JoinsPropertiesSpec {
  // top-level: Spark encoders can't be derived for spec-inner classes
  case class L(k: Option[Long], t: Option[Long], lidx: Long)
  case class R(k: Option[Long], rt: Option[Long], v: String)
}

class JoinsPropertiesSpec extends SparkSpec {
  import JoinsPropertiesSpec.{L, R}
  import spark.implicits._

  private val genCase: Gen[(List[L], List[R])] = for {
    nl <- Gen.chooseNum(0, 25)
    left <- Gen.listOfN(nl, for {
      k <- Gen.frequency(9 -> Gen.chooseNum(1L, 4L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
      t <- Gen.frequency(9 -> Gen.chooseNum(0L, 20L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
    } yield (k, t))
    nr <- Gen.chooseNum(0, 25)
    right <- Gen.listOfN(nr, for {
      k <- Gen.frequency(9 -> Gen.chooseNum(1L, 4L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
      rt <- Gen.frequency(9 -> Gen.chooseNum(0L, 20L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
    } yield (k, rt))
  } yield (
    left.zipWithIndex.map { case ((k, t), i) => L(k, t, i.toLong) },
    // the documented contract requires (key, rightTime) unique on the
    // right — keep the first of each generated collision
    right.zipWithIndex
      .groupBy { case ((k, rt), _) => (k, rt) }.toList
      .map { case (_, hits) => hits.minBy(_._2) }
      .map { case ((k, rt), i) => R(k, rt, s"v$i") })

  /** Brute-force reference: SQL comparison semantics — a null on either
    * side of the time comparison matches nothing; null-keyed right rows
    * are unmatchable (dropped by the operator's contract). */
  private def reference(left: Seq[L], right: Seq[R], strict: Boolean,
      forward: Boolean): Map[Long, Option[String]] = {
    val cmp: (Long, Long) => Boolean =
      if (forward && strict) (rt, lt) => rt > lt
      else if (forward) (rt, lt) => rt >= lt
      else if (strict) (rt, lt) => rt < lt
      else (rt, lt) => rt <= lt
    left.map { l =>
      val cand = for {
        r <- right
        rk <- r.k; lk <- l.k; if rk == lk
        rt <- r.rt; lt <- l.t
        if cmp(rt, lt)
      } yield (rt, r.v)
      val pick =
        if (cand.isEmpty) None
        else if (forward) Some(cand.minBy(_._1)._2)
        else Some(cand.maxBy(_._1)._2)
      l.lidx -> pick
    }.toMap
  }

  test("rangeJoinBucketed matches brute-force containment on signed domains (6 seeds)") {
    // negative coordinates exercise floor-division bucketing below zero —
    // integer division would round toward zero there and split a bucket
    // across the origin; floor() must keep point and interval bucketing
    // aligned on the same grid
    val genRange: Gen[(List[Long], List[(Long, Long)], Long)] = for {
      pts <- Gen.listOfN(30, Gen.chooseNum(-40L, 40L))
      ivs <- Gen.listOfN(12, for {
        lo <- Gen.chooseNum(-40L, 40L)
        span <- Gen.chooseNum(0L, 25L)
      } yield (lo, lo + span))
      w <- Gen.oneOf(1L, 3L, 7L, 10L)
    } yield (pts, ivs, w)
    (1L to 6L).foreach { seedNo =>
      val (pts, ivs, w) =
        genRange.pureApply(Gen.Parameters.default, Seed(seedNo))
      val pDf = pts.toDF("p")
      val iDf = ivs.zipWithIndex
        .map { case ((lo, hi), i) => (lo, hi, s"i$i") }.toDF("lo", "hi", "iv")
      val got = Joins.rangeJoinBucketed(pDf, iDf, "p", "lo", "hi", w)
        .select("p", "iv").as[(Long, String)].collect()
      val want = for {
        (p, pi) <- pts.zipWithIndex
        ((lo, hi), i) <- ivs.zipWithIndex
        if p >= lo && p <= hi
      } yield (p, s"i$i")
      // multiset compare: duplicate generated points must pair once EACH
      assert(got.sorted.toSeq == want.sorted,
        s"seed $seedNo width $w: got ${got.length}, want ${want.length}")
    }
  }

  test("multi-key as-of: a composite key behaves as its concatenation (4 seeds)") {
    // the Seq-of-keys plumbing (select lists, window partition, null-key
    // filters) must treat (k1, k2) exactly like a single fused key; any
    // null component makes the composite unmatchable on the right and
    // payload-less on the left, per SQL equality semantics
    val genPair: Gen[(Option[Long], Option[Long])] = for {
      k1 <- Gen.frequency(9 -> Gen.chooseNum(1L, 2L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
      k2 <- Gen.frequency(9 -> Gen.chooseNum(1L, 2L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
    } yield (k1, k2)
    val gen = for {
      left <- Gen.listOfN(20, for {
        ks <- genPair; t <- Gen.chooseNum(0L, 15L)
      } yield (ks, t))
      right <- Gen.listOfN(20, for {
        ks <- genPair; rt <- Gen.chooseNum(0L, 15L)
      } yield (ks, rt))
    } yield (left, right)
    (1L to 4L).foreach { seedNo =>
      val (l0, r0) = gen.pureApply(Gen.Parameters.default, Seed(seedNo))
      val left = l0.zipWithIndex
        .map { case (((k1, k2), t), i) => (k1, k2, t, i.toLong) }
      val right = r0.zipWithIndex
        .groupBy { case (((k1, k2), rt), _) => (k1, k2, rt) }.toList
        .map { case (_, hits) => hits.minBy(_._2) }
        .map { case (((k1, k2), rt), i) => (k1, k2, rt, s"v$i") }
      val got = Joins.asofJoin(
          left.toDF("k1", "k2", "t", "lidx"),
          right.toDF("k1", "k2", "rt", "v"), Seq("k1", "k2"), "t", "rt")
        .select("lidx", "v").as[(Long, Option[String])].collect().toMap
      // reference: fuse the composite key; null components never match
      val want = left.map { case (k1, k2, t, lidx) =>
        val cand = for {
          (rk1, rk2, rt, v) <- right
          a <- rk1; b <- rk2; c <- k1; d <- k2
          if a == c && b == d && rt <= t
        } yield (rt, v)
        lidx -> (if (cand.isEmpty) None else Some(cand.maxBy(_._1)._2))
      }.toMap
      assert(got == want, s"seed $seedNo")
    }
  }

  test("asofJoin/asofJoinForward match a brute-force reference (6 seeds × 4 variants)") {
    (1L to 6L).foreach { seedNo =>
      val (left, right) = genCase.pureApply(Gen.Parameters.default, Seed(seedNo))
      val lDf = left.toDF("k", "t", "lidx")
      val rDf = right.toDF("k", "rt", "v")
      for (forward <- Seq(false, true); strict <- Seq(false, true)) {
        val got = (if (forward)
            Joins.asofJoinForward(lDf, rDf, Seq("k"), "t", "rt", strict)
          else Joins.asofJoin(lDf, rDf, Seq("k"), "t", "rt", strict))
          .select("lidx", "v")
          .as[(Long, Option[String])].collect().toMap
        val want = reference(left, right, strict, forward)
        assert(got.size == left.size,
          s"seed $seedNo fwd=$forward strict=$strict: row count " +
            s"${got.size} != ${left.size} (left rows must be preserved)")
        assert(got == want,
          s"seed $seedNo fwd=$forward strict=$strict:\n got  $got\n want $want")
      }
    }
  }
}
