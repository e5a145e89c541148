package graft.etl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** MergeInto.applyChanges vs an in-memory reference merge, over
  * generated base tables and change sets (fixed seeds): for ANY valid
  * input — including keys that exist only in changes, delete-of-absent,
  * null payloads — the one-join formulation must equal the obvious
  * per-key Map-based semantics. */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private case class Row3(k: Long, name: String, bal: java.lang.Double)

  private val genCase: Gen[(List[(Long, String, java.lang.Double)],
      List[(Long, String, String, java.lang.Double)])] = for {
    baseKeys <- Gen.someOf(1L to 20L)
    changed <- Gen.someOf(1L to 25L) // overlaps base AND hits absent keys
    ops <- Gen.listOfN(25, Gen.oneOf("U", "D", "I"))
    nullBal <- Gen.listOfN(25, Gen.prob(0.2))
  } yield {
    val base = baseKeys.toList.sorted.map(k =>
      (k, s"n$k", if (k % 7 == 0) null
        else java.lang.Double.valueOf(k * 1.5)))
    val changes = changed.toList.sorted.zipWithIndex.map { case (k, i) =>
      val op = if (base.exists(_._1 == k)) (if (ops(i) == "I") "U" else ops(i))
        else "I" // valid MERGE input: I only for absent, U/D only present
      (k, op, s"c$k",
        if (nullBal(i)) null else java.lang.Double.valueOf(k * 2.0))
    }
    (base, changes)
  }

  /** Obvious per-key reference semantics. */
  private def reference(base: List[(Long, String, java.lang.Double)],
      changes: List[(Long, String, String, java.lang.Double)])
      : Set[(Long, String, java.lang.Double)] = {
    val byKey = changes.map(c => c._1 -> c).toMap
    val kept = base.flatMap { case (k, n, b) =>
      byKey.get(k) match {
        case Some((_, "D", _, _)) => None
        case Some((_, "U", cn, cb)) => Some((k, cn, cb))
        case _ => Some((k, n, b))
      }
    }
    val inserted = changes.collect { case (k, "I", cn, cb) => (k, cn, cb) }
    (kept ++ inserted).toSet
  }

  test("diffSnapshots then applyChanges reproduces the new snapshot") {
    // I/U/D/unchanged plus null payloads on both sides: null→null is
    // unchanged (suppressed), null→value and value→null are updates.
    val oldS = Seq[(Long, java.lang.Double)](
      (1L, 1.0), (2L, 2.0), (3L, null), (4L, 4.0), (5L, null))
      .toDF("id", "v")
    val newS = Seq[(Long, java.lang.Double)](
      (1L, 1.0),          // unchanged
      (2L, 20.0),         // updated
      (3L, 3.0),          // null → value update
      (5L, null),         // null → null unchanged
      (6L, 6.0))          // inserted; 4 deleted
      .toDF("id", "v")
    val diff = MergeInto.diffSnapshots(oldS, newS, "id", Seq("v"))
    val ops = diff.as[(Long, String, java.lang.Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(ops === Map(2L -> "U", 3L -> "U", 4L -> "D", 6L -> "I"))
    val applied = MergeInto.applyChanges(oldS, diff, "id", Seq("v"))
      .as[(Long, java.lang.Double)].collect().toSet
    val expected = newS.as[(Long, java.lang.Double)].collect().toSet
    assert(applied === expected)
  }

  test("one-join merge equals reference semantics on generated cases") {
    (1L to 6L).foreach { seedNo =>
      val (base, changes) =
        genCase.pureApply(Gen.Parameters.default, Seed(seedNo))
      val baseDf = base.toDF("k", "name", "bal")
      val changesDf = changes.toDF("k", "op", "name", "bal")
      val got = MergeInto.applyChanges(baseDf, changesDf, "k",
          Seq("name", "bal"))
        .as[(Long, String, java.lang.Double)].collect().toSet
      assert(got === reference(base, changes), s"seed $seedNo")
    }
  }
}
