package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

/** Join-strategy hints: the manual override surface for when the
  * optimizer's size estimates are wrong (stale stats, exploding UDF
  * selectivity). Each hint must actually change the physical strategy —
  * a hint that silently no-ops is worse than none, so the plans are
  * asserted, not assumed. */
class JoinHintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.toString

  private def joined(hint: String) = {
    val e = Sources.table(spark, dir, "events")
    val c = Sources.table(spark, dir, "customer")
    e.join(c.hint(hint), col("user_id") === col("c_custkey"))
      .select("event_id", "c_mktsegment")
  }

  test("merge hint forces a sort-merge join") {
    val p = plan(joined("merge"))
    assert(p.contains("SortMergeJoin"), p.take(500))
  }

  test("shuffle_hash hint forces a shuffled hash join") {
    val p = plan(joined("shuffle_hash"))
    assert(p.contains("ShuffledHashJoin"), p.take(500))
  }

  test("broadcast hint forces a broadcast join even on the fact side") {
    val e = Sources.table(spark, dir, "events")
    val c = Sources.table(spark, dir, "customer")
    // broadcast the LARGER side on purpose — the hint must win over
    // the size heuristic (that's what hints are for)
    val p = plan(e.hint("broadcast")
      .join(c, col("user_id") === col("c_custkey")))
    assert(p.contains("BroadcastHashJoin") && p.contains("BuildLeft"),
      p.take(600))
  }
}
