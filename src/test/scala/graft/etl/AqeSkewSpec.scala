package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** When NOT to hand-salt: AQE's OptimizeSkewedJoin detects an oversized
  * shuffle partition at runtime (from the actual map-output statistics,
  * which no compile-time plan can know) and splits it across reducers,
  * duplicating the matching build-side partition — same effect as
  * etl/Skew.saltedJoin, zero query rewrite. Hand-salting remains for the
  * cases AQE can't touch: skewed AGGREGATIONS (no join to replicate), and
  * pipelines that must pin a deterministic partitioning across stages.
  * Documented in SCALE.md §skew. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot join partition at runtime (skew=true in plan)") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // production defaults are 5x-median / 256 MiB; scaled to fixture size
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "262144")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 5/6 of the fact rows share key 0; payload is md5-derived so the
      // skew survives shuffle compression (constant padding would deflate
      // the hot partition below the detection threshold)
      val facts = spark.range(0, 120000).select(
        when($"id" % 6 =!= 0, lit(0L)).otherwise($"id" % 100 + 1).as("k"),
        concat(md5($"id".cast("string")),
          md5(concat($"id".cast("string"), lit("b"))),
          md5(concat($"id".cast("string"), lit("c")))).as("payload"))
      val dim = spark.range(0, 101).select($"id".as("k"),
        md5($"id".cast("string")).as("attr"))
      val joined = facts.join(dim, "k")
      // execute THIS df's plan (count() would build a separate pruned
      // aggregate plan and leave this one un-finalized under AQE)
      assert(joined.collect().length == 120000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not split the hot partition:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
