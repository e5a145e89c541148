package graft.etl

import graft.SparkSpec
import graft.queries.IncrementalQueries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential property tests for the CDC/merge family, extending the
  * fixed-fixture oracles (`etl_merge_apply`, `etl_snapshot_diff`,
  * `etl_incremental_retract`) with randomized multi-batch streams:
  *
  *  - folding a random VALID CDC stream (I/U/D batches, keys touched
  *    repeatedly across batches, no-op updates, null payloads) through
  *    `MergeInto.applyChanges` must track the obvious per-key Map fold
  *    at every step;
  *  - `diffSnapshots(initial, final)` must equal the in-memory set diff
  *    (no spurious no-op rows, correct op per key) and
  *    `applyChanges(initial, diff)` must reproduce `final` — the
  *    apply ∘ diff ≡ identity law on arbitrary snapshots, not just the
  *    hand-built fixture;
  *  - the retractable-aggregate merge behind `etl_incremental_retract`
  *    (`IncrementalQueries.retractMerge`) must equal a direct recompute
  *    over the surviving multiset for random insert/retract streams,
  *    including groups whose every row retracts (they must VANISH, not
  *    surface with n = 0) and users who lose all rows in a group.
  *
  * State-dependent streams are generated with a seeded
  * [[scala.util.Random]] fold (ScalaCheck generators can't easily
  * thread evolving validity constraints); fixed seeds keep every run
  * reproducible.
  */
class CdcPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private type Payload = (String, java.lang.Double)
  private type State = Map[Long, Payload]

  private def payload(rng: scala.util.Random, k: Long): Payload = (
    if (rng.nextDouble() < 0.1) null else s"n$k-${rng.nextInt(5)}",
    if (rng.nextDouble() < 0.2) null
    else java.lang.Double.valueOf(rng.nextInt(40) * 0.25))

  /** One valid CDC batch against `state`: present keys draw U (possibly
    * a no-op carrying the identical payload) or D; absent keys draw I. */
  private def genBatch(rng: scala.util.Random, state: State)
      : List[(Long, String, String, java.lang.Double)] = {
    val keys = rng.shuffle((1L to 30L).toList).take(rng.nextInt(16))
    keys.sorted.map { k =>
      if (state.contains(k)) {
        if (rng.nextDouble() < 0.3) (k, "D", null: String,
          null: java.lang.Double)
        else {
          val (n, b) = if (rng.nextDouble() < 0.2) state(k) // no-op update
            else payload(rng, k)
          (k, "U", n, b)
        }
      } else {
        val (n, b) = payload(rng, k)
        (k, "I", n, b)
      }
    }
  }

  private def applyRef(state: State,
      batch: List[(Long, String, String, java.lang.Double)]): State =
    batch.foldLeft(state) {
      case (s, (k, "D", _, _)) => s - k
      case (s, (k, _, n, b)) => s + (k -> ((n, b)))
    }

  private def collectState(df: DataFrame): State =
    df.as[(Long, String, java.lang.Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  private def toDf(state: State): DataFrame =
    state.toList.sortBy(_._1)
      .map { case (k, (n, b)) => (k, n, b) }.toDF("k", "name", "bal")

  test("folding a random CDC stream through applyChanges tracks the " +
      "per-key reference at every step") {
    (1 to 5).foreach { seed =>
      val rng = new scala.util.Random(seed)
      var ref: State = (1L to 30L).filter(_ => rng.nextDouble() < 0.4)
        .map(k => k -> payload(rng, k)).toMap
      var cur = toDf(ref)
      (1 to 4).foreach { step =>
        val batch = genBatch(rng, ref)
        ref = applyRef(ref, batch)
        cur = MergeInto.applyChanges(cur,
          batch.toDF("k", "op", "name", "bal"), "k", Seq("name", "bal"))
        assert(collectState(cur) === ref, s"seed $seed step $step")
      }
    }
  }

  test("diffSnapshots equals the in-memory diff and apply ∘ diff " +
      "reproduces the new snapshot on random snapshot pairs") {
    (1 to 6).foreach { seed =>
      val rng = new scala.util.Random(100 + seed)
      val oldRef: State = (1L to 25L).filter(_ => rng.nextDouble() < 0.5)
        .map(k => k -> payload(rng, k)).toMap
      // new snapshot: keys kept/dropped/mutated/added independently,
      // with a slice kept bit-identical so no-op suppression is exercised
      val newRef: State = ((1L to 25L).flatMap { k =>
        oldRef.get(k) match {
          case Some(p) =>
            val r = rng.nextDouble()
            if (r < 0.25) None                       // deleted
            else if (r < 0.55) Some(k -> p)          // unchanged
            else Some(k -> payload(rng, k))          // updated (maybe no-op)
          case None =>
            if (rng.nextDouble() < 0.3) Some(k -> payload(rng, k)) // insert
            else None
        }
      }).toMap
      val oldDf = toDf(oldRef)
      val newDf = toDf(newRef)
      val diff = MergeInto.diffSnapshots(oldDf, newDf, "k",
        Seq("name", "bal"))
      val got = diff.as[(Long, String, String, java.lang.Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = ((oldRef.keySet ++ newRef.keySet).flatMap { k =>
        (oldRef.get(k), newRef.get(k)) match {
          case (None, Some((n, b))) => Some(k -> (("I", n, b)))
          case (Some(_), None) =>
            Some(k -> (("D", null: String, null: java.lang.Double)))
          case (Some(o), Some(p)) if o != p => Some(k -> (("U", p._1, p._2)))
          case _ => None // unchanged (incl. null-payload equality) suppressed
        }
      }).toMap
      assert(got === want, s"seed $seed: diff mismatch")
      val applied = collectState(
        MergeInto.applyChanges(oldDf, diff, "k", Seq("name", "bal")))
      assert(applied === newRef, s"seed $seed: apply ∘ diff ≠ identity")
    }
  }

  test("retractMerge equals a post-CDC recompute on random " +
      "insert/retract streams") {
    (1 to 5).foreach { seed =>
      val rng = new scala.util.Random(200 + seed)
      // base multiset; group "Z" exists only in fully-retracted form
      val base = (1 to 60).map { i =>
        val g = if (i <= 4) "Z" else s"G${rng.nextInt(3)}"
        (g, rng.nextInt(8).toLong,
          new java.math.BigDecimal(rng.nextInt(400)).movePointLeft(2))
      }
      val retractIdx = base.indices.filter(i =>
        base(i)._1 == "Z" || rng.nextDouble() < 0.35).toSet
      val inserts = (1 to 15).map { _ =>
        (s"G${rng.nextInt(3)}", rng.nextInt(8).toLong,
          new java.math.BigDecimal(rng.nextInt(400)).movePointLeft(2))
      }
      val deltas =
        base.map { case (g, u, v) => (g, u, v, 1L) } ++
        retractIdx.toList.sorted
          .map(base).map { case (g, u, v) => (g, u, v, -1L) } ++
        inserts.map { case (g, u, v) => (g, u, v, 1L) }
      val deltasDf = deltas.toDF("event_type", "user_id", "v", "m")
        .withColumn("v", col("v").cast("decimal(18,6)"))
      val got = IncrementalQueries.retractMerge(deltasDf)
        .as[(String, Long, Double, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      val surviving = base.indices.filterNot(retractIdx).map(base) ++ inserts
      val want = surviving.groupBy(_._1).map { case (g, rows) =>
        val n = rows.size.toLong
        val sv = rows.map(_._3).reduce(_ add _)
        g -> ((n, sv.doubleValue / n, rows.map(_._2).distinct.size.toLong))
      }
      assert(got === want, s"seed $seed")
      assert(!got.contains("Z"), s"seed $seed: fully-retracted group must vanish")
    }
  }
}
