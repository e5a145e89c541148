package graft.etl

import graft.SparkSpec
import graft.io.Sinks
import org.apache.spark.sql.functions._

/** At-scale mechanics: salting equivalence and bucketed shuffle-free joins. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted count/sum equal their direct formulations") {
    val df = (1 to 500).map(i => (if (i % 10 == 0) "hot" else s"k$i", i * 1.0))
      .toDF("k", "v").repartition(8)
    val direct = df.groupBy("k").agg(count(lit(1)).as("count"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(df, Seq("k"))
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
    val directSum = df.groupBy("k").agg(sum($"v").as("sum"))
      .as[(String, Double)].collect().toMap
    val saltedSum = Skew.saltedSum(df, Seq("k"), "v")
      .as[(String, Double)].collect().toMap
    assert(saltedSum.keySet == directSum.keySet)
    saltedSum.foreach { case (k, v) =>
      assert(math.abs(v - directSum(k)) < 1e-9)
    }
  }

  test("salted join equals plain left join") {
    val facts = (1L to 300L).map(i => (i % 7, i)).toDF("k", "fact_id")
    val dim = (0L to 4L).map(k => (k, s"d$k")).toDF("k", "attr")
    val plain = facts.join(dim, Seq("k"), "left")
      .select("fact_id", "attr").as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(facts, dim, "k")
      .select("fact_id", "attr").as[(Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("applyClusters carries no mandatory broadcast when the hint is off") {
    // Web-scale corpora run 30-50% near-dup membership, so the cluster map
    // can be corpus-scale: the join must let AQE decide. With the broadcast
    // threshold disabled, a hint-free plan must NOT contain a
    // BroadcastExchange (a forced hint would override the threshold).
    val docs = (1L to 200L).map(i => (i, s"body$i")).toDF("doc_id", "body")
    val clusters = (1L to 100L).map(i => (i, (i - 1) / 2 * 2 + 1))
      .toDF("doc_id", "cluster_id")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val free = graft.ext.Dedup.applyClusters(docs, clusters)
      val freePlan = free.queryExecution.executedPlan.toString
      assert(!freePlan.contains("BroadcastExchange"),
        s"hint-free applyClusters must leave the join strategy to AQE:\n$freePlan")
      val hinted = graft.ext.Dedup.applyClusters(docs, clusters,
        broadcastHint = true)
      val hintedPlan = hinted.queryExecution.executedPlan.toString
      assert(hintedPlan.contains("BroadcastExchange"),
        s"broadcastHint=true must force the broadcast:\n$hintedPlan")
      // Both strategies produce the same cleaned corpus: unclustered docs
      // plus one canonical (min-id) member per cluster.
      assert(free.count() == hinted.count())
      assert(free.select("doc_id").as[Long].collect().toSet ==
        hinted.select("doc_id").as[Long].collect().toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("same-bucketed tables join without an exchange") {
    // stale-location cleanup now lives inside Sinks.bucketedTable
    Sinks.bucketedTable((1L to 1000L).map(i => (i, i * 2)).toDF("id", "x"),
      "g_bucket_a", Seq("id"), buckets = 8)
    Sinks.bucketedTable((1L to 1000L).map(i => (i, i * 3)).toDF("id", "y"),
      "g_bucket_b", Seq("id"), buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("g_bucket_a")
        .join(spark.table("g_bucket_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("signature-store admission join reads the store without an exchange") {
    // the daily-admission plan contract (r14): the base side of the
    // delta×store band join is the bucketed (band, sig) signature store,
    // so the only (band, sig) exchange in the plan is the DELTA side's —
    // a second one would mean the store's bucketing was not honored and
    // the corpus-scale table would re-shuffle every day
    val base = (1L to 200L).map(i =>
      (i, s"base document number $i about topic${i % 5} material here"))
      .toDF("doc_id", "text")
    val delta = (1000L to 1010L).map(i =>
      (i, s"base document number ${i - 999} about topic${(i - 999) % 5} " +
        "material here")).toDF("doc_id", "text")
    graft.ext.Dedup.writeSignatureStore(base, "g_sig_store", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cand = graft.ext.Dedup.incrementalCandidatesFromStore(
        spark.table("g_sig_store"), delta)
      val plan = cand.queryExecution.executedPlan.toString
      val bandSigExchanges = "Exchange hashpartitioning\\(band".r
        .findAllIn(plan).size
      assert(bandSigExchanges == 1,
        s"expected exactly the delta-side (band, sig) exchange:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(cand.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_sig_store")
    }
  }
}
