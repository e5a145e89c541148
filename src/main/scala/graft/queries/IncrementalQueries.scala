package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Incremental view maintenance: the algebraic-merge pattern that turns
  * a daily 100 TB recompute into a small-delta update, plus
  * deterministic pseudonymization for privacy-safe training exports.
  */
object IncrementalQueries extends QueryGroup {

  /** Incrementally-maintained KPI table: the events stream is processed
    * as two disjoint batches (even vs odd day — standing in for
    * yesterday's materialized state + today's delta); each batch
    * produces ALGEBRAIC partials (count, decimal sum, HLL sketch for
    * distinct users), and the view is the MERGE of partials — counts
    * and sums add, sketches union. The final averages derive from
    * merged sums, never from averaging averages.
    *
    * The query hash-matching a plain full aggregation (the oracle) is
    * the cross-engine proof that merge(partial(A), partial(B)) =
    * full(A ∪ B) — the property that makes the view maintainable
    * without re-touching history. (countDistinct would NOT merge; the
    * sketch is what buys mergeability, its 5% bound pinned as data like
    * a_approx_distinct.) */
  /** One batch's ALGEBRAIC partials over (event_type, user_id, v): count,
    * decimal sum, HLL sketch. Shared with IvmPropertiesSpec, which pins
    * merge(partial(A), partial(B)) ≡ full(A ∪ B) on random splits. */
  private[graft] def kpiPartial(batch: DataFrame): DataFrame = batch
    .groupBy(col("event_type"))
    .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
      hll_sketch_agg(col("user_id")).as("sk"))

  /** Merge of per-batch partials: counts and sums add, sketches union —
    * the algebra that makes the view maintainable without re-touching
    * history. */
  private[graft] def kpiMerge(partials: Seq[DataFrame]): DataFrame =
    partials.reduce(_ unionByName _)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"),
        hll_union_agg(col("sk")).as("sk"))

  private def incrementalKpis(s: SparkSession, dir: String): DataFrame = {
    val e = Sources.table(s, dir, "events")
      .select(col("event_type"), col("user_id"),
        col("value").cast("decimal(18,6)").as("v"),
        (datediff(col("ts").cast("date"), lit("1970-01-01")) % 2 === 0)
          .as("even_day"))
    val merged = kpiMerge(Seq(
      kpiPartial(e.filter(col("even_day"))),
      kpiPartial(e.filter(!col("even_day")))))
    val exactUsers = Sources.table(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(exactUsers, Seq("event_type"))
      .select(col("event_type"), col("n"),
        // avg from MERGED sums: decimal→double cast is exact here
        // (< 16 sig digits), then one IEEE division — identical in any
        // engine, no decimal-division scale rules to reconcile
        (col("sv").cast("double") / col("n")).as("avg_value"),
        col("exact_users"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("merged_within_5pct"))
      .orderBy("event_type")
  }

  private val incrementalOracle: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
      |    AS avg_value,
      |  COUNT(DISTINCT user_id) AS exact_users,
      |  TRUE AS merged_within_5pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Incremental JOIN maintenance (insert-only IVM): with A' = A ∪ ΔA
    * and B' = B ∪ ΔB, the view delta is Δ(A⋈B) = (ΔA ⋈ B') ∪ (A ⋈ ΔB)
    * — two joins DRIVEN by the deltas (ΔA×ΔB rides the first term, the
    * A-sides keep the union disjoint), so maintaining the view costs
    * |Δ|-proportional probe work instead of recomputing A'⋈B'. At 100 TB
    * this is why nightly loads don't rebuild join views: each delta
    * broadcast-probes (or bucket-joins) the big side once. The oracle is
    * the DEFINITIONAL form — every A'⋈B' row where either member is new
    * (¬(old ∧ old) = Δ∨Δ) — so the hash match proves the propagation
    * identity, not just the plumbing. Deletes are the complement path and
    * flow through the CDC changeset (`etl_snapshot_diff`) + MERGE
    * (`etl_merge_apply`). */
  /** The insert-only join-view delta: Δ(A⋈B) = (ΔA ⋈ B') ∪ (A_old ⋈ ΔB),
    * where B' = B_old ∪ ΔB (the ΔA×ΔB pairs ride the first term; keeping
    * the second term's A-side to A_old keeps the union disjoint). Shared
    * with IvmPropertiesSpec, which pins Δ ∪ (A_old ⋈ B_old) ≡ A'⋈B' on
    * random splits — the propagation identity itself, beyond the fixed
    * fixture the oracle checks. */
  private[graft] def joinDelta(aOld: DataFrame, deltaA: DataFrame,
      bNew: DataFrame, deltaB: DataFrame,
      cond: org.apache.spark.sql.Column): DataFrame =
    deltaA.join(bNew, cond).unionByName(aOld.join(deltaB, cond))

  private def incrementalJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Sources.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Sources.table(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val deltaA = o.filter(col("o_orderkey") % 10 === 0)
    val aOld = o.filter(col("o_orderkey") % 10 =!= 0)
    val deltaB = c.filter(col("c_custkey") % 7 === 0)
    joinDelta(aOld, deltaA, c, deltaB,
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_mktsegment"))
      .orderBy("o_orderkey", "c_custkey")
  }

  private val incrementalJoinOracle: String =
    """SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE o.o_orderkey % 10 = 0 OR c.c_custkey % 7 = 0
      |ORDER BY o_orderkey, c_custkey""".stripMargin

  /** Retractable aggregate maintenance — the deletes path the two
    * queries above defer: a CDC batch carries inserts AND retractions,
    * each row with a multiplicity m ∈ {+1, −1}, and the view merges
    * Σm / Σm·v per group (counts and decimal sums retract exactly).
    * DISTINCT cannot retract from a sketch (HLL unions only — the
    * insert-only query's documented trade), so live-user distinct runs
    * the two-level design every retracting engine uses (Flink retract
    * streams, IVM papers): a per-(group, user) NET-multiplicity table —
    * the maintained state, sharded by key, updated delta-
    * proportionally — and users with net > 0 count as live.
    *
    * Fixture: base = events with id % 11 ≠ 0; the delta inserts the
    * %11 rows and retracts base rows with id % 13 = 0. The oracle
    * recomputes directly over the post-CDC set, so the hash match
    * proves merge(base, +Δ, −Δ) = full(final) — including that a user
    * whose every row retracts drops out of the distinct. */
  /** The retract-merge core, shared by [[incrementalRetract]] and the
    * randomized CdcPropertiesSpec (retractable merge ≡ post-CDC
    * recompute on arbitrary delta streams): `deltas` carries
    * (event_type, user_id, v, m) with multiplicity m ∈ {+1, −1};
    * output is one row per group with net-positive count. */
  private[graft] def retractMerge(deltas: DataFrame): DataFrame = {
    val scalars = deltas.groupBy(col("event_type"))
      .agg(sum(col("m")).as("n"), sum(col("m") * col("v")).as("sv"))
    val live = deltas.groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("m")).as("net"))
      .filter(col("net") > 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("live_users"))
    scalars.join(live, Seq("event_type"))
      .select(col("event_type"), col("n"),
        (col("sv").cast("double") / col("n")).as("avg_value"),
        col("live_users"))
      .orderBy("event_type")
  }

  private def incrementalRetract(s: SparkSession, dir: String): DataFrame = {
    val e = Sources.table(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("user_id"),
        col("value").cast("decimal(18,6)").as("v"))
    val base = e.filter(col("event_id") % 11 =!= 0).withColumn("m", lit(1L))
    val ins = e.filter(col("event_id") % 11 === 0).withColumn("m", lit(1L))
    val del = e.filter(col("event_id") % 11 =!= 0 &&
        col("event_id") % 13 === 0)
      .withColumn("m", lit(-1L))
    retractMerge(base.unionByName(ins).unionByName(del))
  }

  private val incrementalRetractOracle: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
      |    AS avg_value,
      |  COUNT(DISTINCT user_id) AS live_users
      |FROM events
      |WHERE event_id % 11 = 0 OR event_id % 13 <> 0
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Deterministic pseudonymization: user ids become salted SHA-256
    * tokens — stable across runs and engines (re-joinable on the token),
    * irreversible without the salt, and a pure codegen'd map stage. The
    * cross-engine oracle doubles as proof the tokenization is
    * reproducible anywhere. */
  private def pseudonymize(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .select(col("event_id"),
        sha2(concat(lit("graft-salt-v1:"),
          col("user_id").cast("string")).cast("binary"), 256)
          .as("user_token"),
        col("event_type"))
      .orderBy("event_id")

  private val pseudonymizeOracle: String =
    """SELECT event_id,
      |  sha256('graft-salt-v1:' || CAST(user_id AS VARCHAR)) AS user_token,
      |  event_type
      |FROM events ORDER BY event_id""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("etl_incremental_kpis", incrementalKpis, Some(incrementalOracle)),
    QueryDef("etl_incremental_join", incrementalJoin,
      Some(incrementalJoinOracle)),
    QueryDef("etl_incremental_retract", incrementalRetract,
      Some(incrementalRetractOracle)),
    QueryDef("f_pseudonymize", pseudonymize, Some(pseudonymizeOracle)),
  )
}
