package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property pin for the signed-partial fold behind
  * `streaming_retract_totals` (StreamingKpis.retractFoldBatch +
  * retractState), which the Verify oracle checks only at ONE batch split
  * (AvailableNow delivers the whole fixture as a single micro-batch).
  * Random multi-batch splits across seeds pin the two invariants the
  * design claims:
  *
  *  - batch-split invariance: folding the events through the persistent
  *    net-multiplicity state in k random micro-batches must equal the
  *    direct recompute over the surviving (post-CDC) multiset, for any k
  *    and any assignment of events to batches — counts and decimal sums
  *    retract exactly, and a (type, user) whose rows all retract drops
  *    out of the live-user count;
  *  - redelivery fence: re-applying any subset of already-applied batch
  *    ids (including the full stream, the runner's replay shape) must
  *    leave the state bit-identical, because an additive merge
  *    double-applies without the atomically-committed batch markers.
  *
  * The fold is driven directly (batchId = position), exactly the
  * foreachBatch contract — monotonically increasing ids, one call per
  * micro-batch; the AvailableNow plumbing itself is covered by the
  * streaming_retract_totals oracle, whose runner already replays the
  * whole stream once.
  */
class RetractReplaySpec extends SparkSpec {
  import spark.implicits._

  private def stateRows(target: String): Map[String, (Long, Double, Long)] =
    StreamingKpis.retractState(spark, target)
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("random batch splits of the signed-partial fold equal the direct " +
      "post-CDC recompute, and redelivery is fenced") {
    (1 to 4).foreach { seed =>
      val rng = new scala.util.Random(600 + seed)
      // distinct event ids so the %11/%13 fixture rule marks each row
      // exactly once; duplicate (type, user) pairs are the interesting
      // state shape (net multiplicities above 1, partial retractions)
      val events = (1 to 130).map { id =>
        (id.toLong, s"t${rng.nextInt(4)}", rng.nextInt(9).toLong,
          (rng.nextInt(4000) - 500) / 100.0)
      }
      val k = 2 + rng.nextInt(3)
      // genuinely random assignment of events to micro-batches
      val assign = events.map(_ => rng.nextInt(k))
      val batches = (0 until k).map(i =>
        events.zip(assign).collect { case (e, a) if a == i => e })
      val root = java.nio.file.Files
        .createTempDirectory("graft_retract_prop").toFile
      val target = new java.io.File(root, "state").toString
      try {
        def df(xs: Seq[(Long, String, Long, Double)]) =
          xs.toDF("event_id", "event_type", "user_id", "value")
        batches.zipWithIndex.foreach { case (b, id) =>
          StreamingKpis.retractFoldBatch(df(b), target, id.toLong)
        }
        val afterFirst = stateRows(target)

        // the direct recompute over the surviving multiset
        val surviving = events.filter(e => e._1 % 11 == 0 || e._1 % 13 != 0)
        val want = surviving.groupBy(_._2).map { case (g, rs) =>
          val n = rs.size.toLong
          val sv = rs.map(e => new java.math.BigDecimal(e._4.toString)
            .setScale(6)).reduce(_ add _)
          g -> ((n, sv.doubleValue / n, rs.map(_._3).distinct.size.toLong))
        }
        assert(afterFirst === want, s"seed $seed (k=$k): fold ≠ recompute")

        // redelivery: a random subset of batch ids, then the FULL stream
        // again (the runner's replay shape) — state must not move
        val replayIds = (0 until k).filter(_ => rng.nextBoolean())
        replayIds.foreach(id =>
          StreamingKpis.retractFoldBatch(df(batches(id)), target, id.toLong))
        batches.zipWithIndex.foreach { case (b, id) =>
          StreamingKpis.retractFoldBatch(df(b), target, id.toLong)
        }
        assert(stateRows(target) === afterFirst,
          s"seed $seed: redelivery moved the state")
      } finally graft.io.LocalFs.deleteRecursively(root)
    }
  }
}
