package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Statistical-sketch and information-theoretic operators: KMV distinct
  * estimation (the deterministic, oracle-checkable sketch), Shannon
  * entropy profiles, and a chi-square independence test — the
  * distribution-monitoring surface a production pipeline runs next to its
  * KPIs (drift detection, mix-shift alarms, cardinality tracking).
  *
  * Cross-engine exactness strategy (see [[QueryDef]]): every per-cell
  * irrational (ln, a squared deviation ratio) is quantized to micro-units
  * as BIGINT immediately, so all SUMs are exact integer arithmetic in any
  * order and any engine; exactly one double division happens at the end.
  */
object SketchQueries extends QueryGroup {

  private val KmvK = 64
  // Hashes are the first 15 hex digits of md5 → uniform on [0, 16^15);
  // 16^15 = 2^60, exactly representable as a double.
  private val MaxHash = 1152921504606846976L

  /** KMV distinct user-day estimate per event type, verified in-plan
    * against the exact count (the bound-as-data pattern of
    * `a_approx_distinct`). The key is the (user, epoch-day) composite —
    * the "daily active entity" grain whose cardinality actually needs
    * sketching at 100 TB — encoded as user_id·10⁶ + day so both engines
    * hash the identical string.
    *
    * Unlike HLL, the KMV state — the k smallest distinct md5-derived
    * hashes — is a pure function of the SET of keys: visit order,
    * partitioning, and engine internals cannot change it, so DuckDB
    * computes the identical sketch from the identical rows and the whole
    * estimate hash-matches with no tolerance. The estimator is
    * (k−1)·2⁶⁰ / h_k (Bar-Yossef et al.; rel. std. err ≈ 1/√(k−2) ≈ 13%
    * at k=64); below k distincts the sketch IS the distinct set and the
    * estimate is exact.
    *
    * Scale: the [[graft.functions.KmvSketch]] buffer is ≤ k longs,
    * map-side combined and merged associatively — O(k) per partition
    * through the exchange, where the exact twin (count_distinct) expands
    * every distinct key. The exact column here is the verification twin
    * at test SF, not part of the production recipe. */
  private def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(new graft.functions.KmvSketch(KmvK), Encoders.scalaLong)
    val key = (col("user_id") * lit(1000000L) +
      datediff(col("ts").cast("date"), lit("1970-01-01"))).cast("long")
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long")
    val est = when(size(col("mins")) < KmvK,
        size(col("mins")).cast("double"))
      .otherwise(lit((KmvK - 1).toDouble) * lit(MaxHash.toDouble) /
        element_at(col("mins"), KmvK).cast("double"))
    Sources.table(s, dir, "events")
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), h.as("h"))
      .groupBy(col("event_type"))
      .agg(kmv(col("h")).as("mins"),
        count_distinct(col("h")).as("n_exact"))
      .select(col("event_type"), col("n_exact"),
        round(est, 4).as("est_kmv"),
        (abs(est - col("n_exact")) <= lit(0.5) * col("n_exact"))
          .as("within_bound"))
      .orderBy("event_type")
  }

  private val kmvDistinctOracle: String =
    s"""WITH h AS (SELECT DISTINCT event_type,
       |    ('0x' || substr(md5(CAST(CAST(user_id * 1000000
       |        + (CAST(ts AS DATE) - DATE '1970-01-01') AS BIGINT)
       |        AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM events WHERE user_id IS NOT NULL),
       |r AS (SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS nd
       |  FROM h),
       |a AS (SELECT event_type, CAST(MAX(nd) AS BIGINT) AS n_exact,
       |    CASE WHEN MAX(nd) < $KmvK THEN CAST(MAX(nd) AS DOUBLE)
       |         ELSE ${KmvK - 1}.0 * $MaxHash /
       |              CAST(MAX(CASE WHEN rn = $KmvK THEN h END) AS DOUBLE)
       |    END AS est
       |  FROM r GROUP BY event_type)
       |SELECT event_type, n_exact, round(est, 4) AS est_kmv,
       |       abs(est - n_exact) <= 0.5 * n_exact AS within_bound
       |FROM a ORDER BY event_type""".stripMargin

  /** Shannon entropy (nats) of the event-type mix per day-of-week — the
    * mix-shift drift signal: a collapsing entropy means one event type is
    * swallowing the distribution.
    *
    * H = ln(n) − Σ cᵢ·ln(cᵢ) / n, computed from integer counts with each
    * ln quantized to micro-nats (BIGINT) first: the Σ is exact integer
    * arithmetic — associative, order-free, engine-free — and exactly one
    * double division happens at the end (the `text_bigram_surprisal`
    * recipe). One narrow projection + two hash aggregates; nothing wide. */
  private def entropyByDow(s: SparkSession, dir: String): DataFrame = {
    def qln(c: org.apache.spark.sql.Column) =
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    Sources.table(s, dir, "events")
      .select((dayofweek(col("ts")) - lit(1)).as("dow"), col("event_type"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("dow"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("cnt") * qln(col("cnt"))).as("s"),
        count(lit(1)).as("n_types"))
      .select(col("dow"), col("n").as("n_events"), col("n_types"),
        round((qln(col("n")) * col("n") - col("s")).cast("double") /
          (col("n") * lit(1000000L)).cast("double"), 6).as("entropy_nats"))
      .orderBy("dow")
  }

  private val entropyByDowOracle: String =
    """WITH c AS (SELECT dayofweek(ts) AS dow, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |a AS (SELECT dow, SUM(cnt) AS n,
      |    SUM(cnt * CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT))
      |      AS s,
      |    CAST(COUNT(*) AS BIGINT) AS n_types
      |  FROM c GROUP BY dow)
      |SELECT dow, CAST(n AS BIGINT) AS n_events, n_types,
      |  round(CAST(CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) * n
      |             - s AS DOUBLE)
      |        / CAST(n * 1000000 AS DOUBLE), 6) AS entropy_nats
      |FROM a ORDER BY dow""".stripMargin

  /** Chi-square test of independence between event type and day-of-week —
    * "is the event mix stable across the week?", the categorical-drift
    * check run over every training-data refresh.
    *
    * Per-cell statistic from the contingency table: with o the observed
    * count, r/c the margins and n the total,
    * (o − r·c/n)²/(r·c/n) = (o·n − r·c)² / (n·r·c) — numerator and
    * denominator are EXACT BIGINT products, each cast to double once;
    * the per-cell term is then quantized to micro-units so the final sum
    * is exact integer arithmetic (order-free across engines), divided
    * back once. The margins come from windows over the tiny cell table
    * (|types| × 7 rows), so the fact table is scanned exactly once. */
  private def chiSquare(s: SparkSession, dir: String): DataFrame = {
    val cells = Sources.table(s, dir, "events")
      .select((dayofweek(col("ts")) - lit(1)).as("dow"), col("event_type"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("o"))
    val wt = Window.partitionBy(col("event_type"))
    val wd = Window.partitionBy(col("dow"))
    val wa = Window.partitionBy()
    val withMargins = cells
      .withColumn("r", sum(col("o")).over(wt))
      .withColumn("c", sum(col("o")).over(wd))
      .withColumn("n", sum(col("o")).over(wa))
    val a = (col("o") * col("n") - col("r") * col("c")).cast("double")
    val term = a * a / (col("n") * col("r") * col("c")).cast("double")
    withMargins
      .select(col("dow"), col("event_type"), col("n"),
        round(term * lit(1e6)).cast("long").as("q"))
      .agg(
        round(sum(col("q")).cast("double") / lit(1e6), 6).as("chi2"),
        ((count_distinct(col("event_type")) - 1) *
          (count_distinct(col("dow")) - 1)).as("dof"),
        max(col("n")).as("n_events"))
  }

  private val chiSquareOracle: String =
    """WITH cells AS (SELECT dayofweek(ts) AS dow, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT dow, event_type, o,
      |    SUM(o) OVER (PARTITION BY event_type) AS r,
      |    SUM(o) OVER (PARTITION BY dow) AS c,
      |    SUM(o) OVER () AS n
      |  FROM cells),
      |t AS (SELECT n, CAST(round(
      |      CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE)
      |        / CAST(n * r * c AS DOUBLE) * 1e6) AS BIGINT) AS q,
      |    event_type, dow
      |  FROM m)
      |SELECT round(CAST(SUM(q) AS DOUBLE) / 1e6, 6) AS chi2,
      |  CAST((COUNT(DISTINCT event_type) - 1)
      |       * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof,
      |  CAST(MAX(n) AS BIGINT) AS n_events
      |FROM t""".stripMargin

  /** Weighted median: the price at which half the QUANTITY (not half the
    * rows) has shipped, per return flag — the "median dollar" statistic
    * that plain median misrepresents whenever weights skew.
    *
    * Lower weighted median by cumulative-weight crossing: order by price
    * with a total tie-break, running weight sum, first row where
    * 2·cum ≥ total. Weights are integer-valued quantities cast to
    * BIGINT, so the crossing comparison is exact integer arithmetic in
    * both engines.
    *
    * The cumulative sum runs through [[graft.ops.PrefixSum
    * .groupedRunningSum]], NOT `sum() OVER (PARTITION BY l_returnflag
    * ORDER BY …)`: the window form hash-partitions on the group key, and
    * a SIX-value key runs the whole fact table through six tasks no
    * matter the cluster size — the one-reducer global-window disease,
    * divided by |groups|, and the reason this query would stall at
    * 100 TB. The grouped two-phase prefix range-partitions on (flag,
    * price, tie-break) instead, so a single flag's rows spread over many
    * partitions and every partition works; the oracle stays the window
    * formulation this operator replaces (identical cum values, same
    * contract as o_prefix_sum/o_global_rowid). Group totals ride a
    * six-row broadcast aggregate, and the first crossing row per group
    * is a struct-min hash aggregate over the surviving half — no window
    * anywhere in the plan. */
  private def weightedMedian(s: SparkSession, dir: String): DataFrame = {
    val base = Sources.table(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("price"),
        col("l_quantity").cast("long").as("qty"),
        col("l_orderkey"), col("l_linenumber"))
    val totals = broadcast(base.groupBy(col("l_returnflag"))
      .agg(sum(col("qty")).as("total")))
    graft.ops.PrefixSum.groupedRunningSum(base, Seq("l_returnflag"),
        Seq(col("price"), col("l_orderkey"), col("l_linenumber")),
        "qty", "cum")
      .join(totals, "l_returnflag")
      .filter(col("cum") * 2 >= col("total"))
      .groupBy(col("l_returnflag"))
      .agg(min(struct(col("price"), col("l_orderkey"),
          col("l_linenumber"))).as("m"),
        max(col("total")).as("total_qty"))
      .select(col("l_returnflag"), col("m.price").as("wmedian_price"),
        col("total_qty"))
      .orderBy("l_returnflag")
  }

  private val weightedMedianOracle: String =
    """WITH r AS (SELECT l_returnflag, l_extendedprice AS price,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    SUM(CAST(l_quantity AS BIGINT)) OVER (
      |      PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(CAST(l_quantity AS BIGINT)) OVER (
      |      PARTITION BY l_returnflag) AS total,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |f AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
      |        ORDER BY price ASC, l_orderkey ASC, l_linenumber ASC) AS rn
      |      FROM r WHERE cum * 2 >= total)
      |SELECT l_returnflag, price AS wmedian_price,
      |       CAST(total AS BIGINT) AS total_qty
      |FROM f WHERE rn = 1 ORDER BY l_returnflag""".stripMargin

  /** KMV sketch ALGEBRA — distinct-set union/intersection estimates for
    * every event-type pair FROM THE SKETCHES ALONE (Beyer et al. 2007):
    * merging two KMV sketches and keeping the k smallest is exactly the
    * union's sketch, and the fraction ρ of merged entries present in
    * BOTH input sketches estimates Jaccard, so |A∩B| ≈ ρ·|A∪B|-est.
    * This is the audience-overlap path at 100 TB: once per-segment
    * sketches (k longs each) exist, every pairwise overlap query runs on
    * O(k) state with NO rescan of the fact table — the exact twin
    * (per-pair distinct counts, carried here as the bound-as-data
    * verification) would rescan and reshuffle the corpus per query.
    * Like `a_kmv_distinct`, everything is deterministic given the md5
    * hash, so DuckDB reproduces the sketches — and the estimates —
    * bit-for-bit. */
  private def kmvSetOps(s: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(new graft.functions.KmvSketch(KmvK), Encoders.scalaLong)
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val ev = Sources.table(s, dir, "events")
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), h.as("h"))
    val sk = ev.groupBy(col("event_type")).agg(kmv(col("h")).as("mins"))
    val pairs = sk.select(col("event_type").as("type_a"), col("mins").as("ma"))
      .crossJoin(sk.select(col("event_type").as("type_b"),
        col("mins").as("mb")))
      .filter(col("type_a") < col("type_b"))
      .withColumn("m", slice(array_sort(array_union(col("ma"), col("mb"))),
        1, KmvK))
      .withColumn("nm", size(col("m")))
    val estU = when(col("nm") < KmvK, col("nm").cast("double"))
      .otherwise(lit((KmvK - 1).toDouble) * lit(MaxHash.toDouble) /
        element_at(col("m"), KmvK).cast("double"))
    val kBoth = size(array_intersect(array_intersect(col("m"), col("ma")),
      col("mb"))).cast("long")
    val est = pairs.select(col("type_a"), col("type_b"),
      round(estU, 4).as("est_union"), kBoth.as("k_both"),
      round(kBoth.cast("double") / col("nm").cast("double") * estU, 4)
        .as("est_intersect"))
    // exact verification twin (test-SF only; production keeps sketches)
    val u = ev.distinct()
    val exact = est.select(col("type_a"), col("type_b"))
      .withColumn("event_type",
        explode(array(col("type_a"), col("type_b"))))
      .join(u, "event_type")
      .groupBy(col("type_a"), col("type_b"), col("h"))
      .agg(count_distinct(col("event_type")).as("nt"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("exact_union"),
        sum(when(col("nt") === 2, 1L).otherwise(0L)).as("exact_int"))
    est.join(exact, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("est_union"),
        col("k_both"), col("est_intersect"), col("exact_union"),
        col("exact_int"),
        (abs(col("est_union") - col("exact_union")) <=
          lit(0.5) * col("exact_union")).as("union_in_bound"),
        (abs(col("est_intersect") - col("exact_int")) <=
          lit(0.5) * col("exact_int")).as("int_in_bound"))
      .orderBy("type_a", "type_b")
  }

  private val kmvSetOpsOracle: String =
    s"""WITH h AS (SELECT DISTINCT event_type,
       |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
       |      AS h
       |  FROM events WHERE user_id IS NOT NULL),
       |r AS (SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h),
       |sk AS (SELECT event_type, h FROM r WHERE rn <= $KmvK),
       |p AS (SELECT a.event_type AS ta, b.event_type AS tb
       |      FROM (SELECT DISTINCT event_type FROM sk) a,
       |           (SELECT DISTINCT event_type FROM sk) b
       |      WHERE a.event_type < b.event_type),
       |mu AS (SELECT p.ta, p.tb, s.h FROM p JOIN sk s ON s.event_type = p.ta
       |       UNION
       |       SELECT p.ta, p.tb, s.h FROM p JOIN sk s ON s.event_type = p.tb),
       |mr AS (SELECT ta, tb, h,
       |    row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
       |  FROM mu),
       |m AS (SELECT ta, tb, h FROM mr WHERE rn <= $KmvK),
       |mm AS (SELECT ta, tb, CAST(COUNT(*) AS INTEGER) AS nm, MAX(h) AS hk
       |       FROM m GROUP BY 1, 2),
       |kb AS (SELECT m.ta, m.tb, CAST(COUNT(*) AS BIGINT) AS k_both
       |       FROM m
       |       JOIN sk s1 ON s1.event_type = m.ta AND s1.h = m.h
       |       JOIN sk s2 ON s2.event_type = m.tb AND s2.h = m.h
       |       GROUP BY 1, 2),
       |est AS (SELECT mm.ta, mm.tb, mm.nm,
       |    CASE WHEN mm.nm < $KmvK THEN CAST(mm.nm AS DOUBLE)
       |         ELSE ${KmvK - 1}.0 * $MaxHash / CAST(mm.hk AS DOUBLE)
       |    END AS est_u,
       |    COALESCE(kb.k_both, 0) AS k_both
       |  FROM mm LEFT JOIN kb ON kb.ta = mm.ta AND kb.tb = mm.tb),
       |ex AS (SELECT q.ta, q.tb,
       |    CAST(COUNT(*) AS BIGINT) AS exact_union,
       |    CAST(SUM(CASE WHEN q.nt = 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS exact_int
       |  FROM (SELECT p.ta, p.tb, h.h,
       |          COUNT(DISTINCT h.event_type) AS nt
       |        FROM p JOIN h
       |          ON h.event_type = p.ta OR h.event_type = p.tb
       |        GROUP BY 1, 2, 3) q
       |  GROUP BY 1, 2)
       |SELECT est.ta AS type_a, est.tb AS type_b,
       |  round(est_u, 4) AS est_union, k_both,
       |  round(CAST(k_both AS DOUBLE) / nm * est_u, 4) AS est_intersect,
       |  ex.exact_union, ex.exact_int,
       |  abs(round(est_u, 4) - exact_union) <= 0.5 * exact_union
       |    AS union_in_bound,
       |  abs(round(CAST(k_both AS DOUBLE) / nm * est_u, 4) - exact_int)
       |    <= 0.5 * exact_int AS int_in_bound
       |FROM est JOIN ex ON ex.ta = est.ta AND ex.tb = est.tb
       |ORDER BY 1, 2""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("a_kmv_distinct", kmvDistinct, Some(kmvDistinctOracle)),
    QueryDef("a_kmv_setops", kmvSetOps, Some(kmvSetOpsOracle)),
    QueryDef("a_weighted_median", weightedMedian, Some(weightedMedianOracle)),
    QueryDef("a_entropy_by_dow", entropyByDow, Some(entropyByDowOracle)),
    QueryDef("a_chi_square", chiSquare, Some(chiSquareOracle)),
  )
}
