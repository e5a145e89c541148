package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — the shuffle-join analog of
  * broadcast-side pruning. When a selective filter sits on the creation
  * (dim) side of a shuffle join, Catalyst injects a bloom_filter_agg over
  * the dim keys and a BloomFilterMightContain predicate on the fact scan:
  * fact rows that cannot match are dropped BEFORE the exchange, which at
  * 100 TB means the shuffle carries only the ~matching fraction instead
  * of the whole fact table. This spec pins (a) the filter appears under
  * the documented conditions, and (b) the result is unchanged — so a
  * conf/regression that silently loses the rewrite fails here, not in a
  * 100 TB run. Thresholds are scaled to fixture size exactly like
  * AqeSkewSpec (production defaults: 10 MB creation side, 10 GB
  * application-side scan). */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter injects a Bloom filter on the fact side of a shuffle join") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "10MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join

      val dir = "/root/testdata/sf0.001"
      val fact = graft.io.Sources.table(spark, dir, "lineitem")
        .select($"l_orderkey", $"l_extendedprice")
      val dim = graft.io.Sources.table(spark, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")

      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") || opt.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$opt")

      // and the rewrite is semantics-preserving
      val expect = fact.join(dim.hint("broadcast"),
        $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() == expect)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
