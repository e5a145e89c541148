package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Layout
import graft.io.Sources

/** Data-profiling and layout operators: the "what is in this table"
  * surface a data engineer runs before trusting 100 TB of input —
  * one-pass column profiles, value histograms, exact outlier flags, and
  * the z-order clustering key used for multi-dimensional data skipping.
  */
object ProfilingQueries extends QueryGroup {

  /** One-pass column profiler over events: per column — row count, null
    * count, distinct count, min and max (stringified with per-type
    * canonical formatting so the engines agree bitwise).
    *
    * Scale: ONE scan computes every column's stats in a single aggregate
    * (the multi-distinct goes through Spark's Expand — rows × profiled
    * columns, the standard exact shape); the per-column rows are then
    * unpivoted from the single result row with stack(). The naive
    * alternative — one query per column — scans the table C times. */
  private def profileColumns(s: SparkSession, dir: String): DataFrame =
    profileExact(Sources.table(s, dir, "events"))

  /** Frame-level body of [[profileColumns]] — public so the corpus-growth
    * harness ([[graft.BenchGrowth]]) times the identical shape on
    * replicated corpora. */
  def profileExact(e: DataFrame): DataFrame =
    profile(e, c => countDistinct(col(c)))

  /** The PRODUCTION sketch-only profiler: identical output shape to
    * [[profileExact]] but distinct counts come from HLL++ sketches
    * (`approx_count_distinct`, rsd 2%), so the aggregate has NO Expand —
    * the scan stays one pass at true row grain regardless of how many
    * columns are profiled. This is the per-batch form at 100 TB; the
    * exact profiler is the audit tool. Not an oracle entry (estimates are
    * engine-specific); the oracle-checked `f_profile_columns_approx`
    * instead pins each sketch within 5% of exact. The corpus-growth
    * harness ([[graft.BenchGrowth]]) measures the exact-vs-sketch
    * crossover with this shape. */
  def profileSketch(e: DataFrame): DataFrame =
    profile(e, c => approx_count_distinct(col(c), 0.02))

  /** Shared body of [[profileExact]] / [[profileSketch]]: the two differ
    * ONLY in the distinct-count aggregator, so the profiled column set
    * and the unpivot layout cannot drift between the audit and
    * production shapes (BenchGrowth's exact-vs-sketch crossover depends
    * on them timing the same shape). */
  private def profile(e: DataFrame,
                      dist: String => org.apache.spark.sql.Column)
      : DataFrame = {
    def nulls(c: String) =
      sum(when(col(c).isNull, 1L).otherwise(0L))
    val one = e.agg(
      count(lit(1)).as("n_rows"),
      nulls("event_id").as("null_event_id"),
      dist("event_id").as("dist_event_id"),
      min(col("event_id")).cast("string").as("min_event_id"),
      max(col("event_id")).cast("string").as("max_event_id"),
      nulls("user_id").as("null_user_id"),
      dist("user_id").as("dist_user_id"),
      min(col("user_id")).cast("string").as("min_user_id"),
      max(col("user_id")).cast("string").as("max_user_id"),
      nulls("event_type").as("null_event_type"),
      dist("event_type").as("dist_event_type"),
      min(col("event_type")).as("min_event_type"),
      max(col("event_type")).as("max_event_type"),
      nulls("value").as("null_value"),
      dist("value").as("dist_value"),
      min(col("value")).cast("decimal(18,2)").cast("string").as("min_value"),
      max(col("value")).cast("decimal(18,2)").cast("string").as("max_value"))
    one.selectExpr("n_rows", s"""stack(4,
        'event_id',  null_event_id,  dist_event_id,  min_event_id,  max_event_id,
        'user_id',   null_user_id,   dist_user_id,   min_user_id,   max_user_id,
        'event_type',null_event_type,dist_event_type,min_event_type,max_event_type,
        'value',     null_value,     dist_value,     min_value,     max_value
      ) AS (column_name, n_null, n_distinct, min_s, max_s)""")
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
      .orderBy("column_name")
  }

  private val profileOracle: String =
    """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM events)
      |SELECT * FROM (
      |  SELECT 'event_id' AS column_name, n.n_rows,
      |    CAST(COUNT(*) FILTER (event_id IS NULL) AS BIGINT) AS n_null,
      |    CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
      |    CAST(MIN(event_id) AS VARCHAR) AS min_s,
      |    CAST(MAX(event_id) AS VARCHAR) AS max_s
      |  FROM events, n GROUP BY n.n_rows
      |  UNION ALL
      |  SELECT 'user_id', n.n_rows,
      |    CAST(COUNT(*) FILTER (user_id IS NULL) AS BIGINT),
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT),
      |    CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
      |  FROM events, n GROUP BY n.n_rows
      |  UNION ALL
      |  SELECT 'event_type', n.n_rows,
      |    CAST(COUNT(*) FILTER (event_type IS NULL) AS BIGINT),
      |    CAST(COUNT(DISTINCT event_type) AS BIGINT),
      |    MIN(event_type), MAX(event_type)
      |  FROM events, n GROUP BY n.n_rows
      |  UNION ALL
      |  SELECT 'value', n.n_rows,
      |    CAST(COUNT(*) FILTER (value IS NULL) AS BIGINT),
      |    CAST(COUNT(DISTINCT value) AS BIGINT),
      |    CAST(CAST(MIN(value) AS DECIMAL(18,2)) AS VARCHAR),
      |    CAST(CAST(MAX(value) AS DECIMAL(18,2)) AS VARCHAR)
      |  FROM events, n GROUP BY n.n_rows
      |) ORDER BY column_name""".stripMargin

  /** The monitoring twin of [[profileColumns]]: distinct counts via HLL
    * sketches. The PRODUCTION form is sketch-only — no Expand, the scan
    * stays one pass at true row grain, which is the per-batch profiler
    * at 100 TB (the exact one is the audit tool). This verification
    * entry additionally computes the exact counts so the oracle can pin
    * each sketch estimate within 5% (bound as data, same pattern as
    * a_approx_distinct) — the Expand here belongs to the CHECK, not the
    * operator.
    *
    * The sketches live in their OWN single-group aggregate, broadcast
    * back over the exact side (r17). Mixing them into the exact
    * multi-distinct `agg` plants partial_approx_count_distinct into the
    * Expand-dedup HashAggregate, which keys on (gid, event_id, user_id,
    * value) — millions of groups — and so allocates THREE ~1 KB HLL
    * register arrays PER DEDUP GROUP: gigabytes of aggregation buffer
    * at any scale, measured 11.3 CPU-s at sf0.1 (SuiteAttr r17) for a
    * ~1 M-row input. Split, the dedup buffers are a bare count and the
    * sketch aggregate keeps 3 registers total with map-side partials;
    * the second scan of the 3-column pruned parquet is the cheap side
    * of that trade at every scale. HLL++ is deterministic (fixed-seed
    * xxhash64 over the same column values), so the estimates — and
    * every output row — are bit-identical to the fused form's. */
  private def profileColumnsApprox(s: SparkSession, dir: String): DataFrame = {
    val e = Sources.table(s, dir, "events")
    val exact = e.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("event_id")).as("d_event_id"),
      countDistinct(col("user_id")).as("d_user_id"),
      countDistinct(col("value")).as("d_value"))
    val sketch = e.agg(
      approx_count_distinct(col("event_id"), 0.02).as("a_event_id"),
      approx_count_distinct(col("user_id"), 0.02).as("a_user_id"),
      approx_count_distinct(col("value"), 0.02).as("a_value"))
    def within(c: String) =
      (abs(col(s"a_$c") - col(s"d_$c")) <= col(s"d_$c") * lit(0.05))
        .as(s"ok_$c")
    val one = exact.crossJoin(broadcast(sketch))
      .select(col("n_rows"),
        col("d_event_id"), within("event_id"),
        col("d_user_id"), within("user_id"),
        col("d_value"), within("value"))
    one.selectExpr("n_rows", s"""stack(3,
        'event_id', d_event_id, ok_event_id,
        'user_id',  d_user_id,  ok_user_id,
        'value',    d_value,    ok_value
      ) AS (column_name, exact_distinct, approx_within_5pct)""")
      .select(col("column_name"), col("n_rows"), col("exact_distinct"),
        col("approx_within_5pct"))
      .orderBy("column_name")
  }

  private val profileApproxOracle: String =
    """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM events)
      |SELECT * FROM (
      |  SELECT 'event_id' AS column_name, n.n_rows,
      |    CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_distinct,
      |    TRUE AS approx_within_5pct
      |  FROM events, n GROUP BY n.n_rows
      |  UNION ALL
      |  SELECT 'user_id', n.n_rows,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE
      |  FROM events, n GROUP BY n.n_rows
      |  UNION ALL
      |  SELECT 'value', n.n_rows,
      |    CAST(COUNT(DISTINCT value) AS BIGINT), TRUE
      |  FROM events, n GROUP BY n.n_rows
      |) ORDER BY column_name""".stripMargin

  /** Fixed-width value histogram: 25-unit bins over events.value with
    * exact decimal mass per bin — the data-distribution probe that sizes
    * skew mitigations. One hash aggregate; bin id from arithmetic, not a
    * dimension join. */
  private def valueHistogram(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(floor(col("value") / lit(25.0)).as("bin"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast("double").as("mass"))
      .select(col("bin"), (col("bin") * 25).cast("double").as("bin_lo"),
        ((col("bin") + 1) * 25).cast("double").as("bin_hi"),
        col("n"), col("mass"))
      .orderBy("bin")

  private val histogramOracle: String =
    """SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
      |  CAST(CAST(FLOOR(value / 25.0) AS BIGINT) * 25 AS DOUBLE) AS bin_lo,
      |  CAST((CAST(FLOOR(value / 25.0) AS BIGINT) + 1) * 25 AS DOUBLE)
      |    AS bin_hi,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS mass
      |FROM events WHERE value IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Equi-DEPTH histogram (8 bins of ~equal row count) — the quantile
    * cousin of [[valueHistogram]]'s fixed-width bins, and what range
    * partition boundaries / skew diagnostics actually want. The global
    * rank comes from [[graft.ops.GlobalIndex.withRowId]] (range exchange
    * + per-partition offsets), NOT `row_number() OVER (ORDER BY …)` whose
    * empty PARTITION BY funnels the corpus through one reducer; the
    * DuckDB oracle CAN afford that single-node window, and the ids agree
    * because (value, event_id) is a total order. Bin id is the same
    * integer arithmetic ((rank−1)·8 div n) on both engines — not ntile,
    * whose remainder distribution differs. */
  private def equidepthBins(s: SparkSession, dir: String): DataFrame = {
    val v = Sources.table(s, dir, "events")
      .select(col("event_id"), col("value"))
      .filter(col("value").isNotNull)
    val idx = graft.ops.GlobalIndex.withRowId(v,
      Seq(col("value"), col("event_id")))
    val n = broadcast(idx.agg(count(lit(1)).as("_n")))
    idx.crossJoin(n)
      .select(expr("CAST(((row_id - 1) * 8) div _n AS INT)").as("bin"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).cast("double").as("lo"),
        max(col("v")).cast("double").as("hi"),
        sum(col("v")).cast("double").as("mass"))
      .orderBy("bin")
  }

  private val equidepthOracle: String =
    """WITH v AS (SELECT event_id, value FROM events
      |           WHERE value IS NOT NULL),
      |r AS (SELECT value,
      |        row_number() OVER (ORDER BY value ASC, event_id ASC) AS rn,
      |        COUNT(*) OVER () AS n
      |      FROM v)
      |SELECT CAST(((rn - 1) * 8) // n AS INTEGER) AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS lo,
      |  CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hi,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS mass
      |FROM r GROUP BY 1 ORDER BY bin""".stripMargin

  /** 2-D z-order (Morton) key per line item over (partkey, suppkey) low
    * 16 bits — the clustering key Layout.clusterByZ2 range-partitions
    * by at write time. The oracle re-derives the interleave from the
    * same five shift/mask steps, pinning the bit math cross-engine. */
  private def zorderKey(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        Layout.zvalue2(col("l_partkey"), col("l_suppkey")).as("zkey"))
      .orderBy("l_orderkey", "l_linenumber")

  private val zorderOracle: String =
    """WITH b0 AS (SELECT l_orderkey, l_linenumber,
      |    l_partkey & 65535 AS x, l_suppkey & 65535 AS y FROM lineitem),
      |b1 AS (SELECT *, (x | (x << 8)) & 16711935 AS xa,
      |               (y | (y << 8)) & 16711935 AS ya FROM b0),
      |b2 AS (SELECT *, (xa | (xa << 4)) & 252645135 AS xb,
      |               (ya | (ya << 4)) & 252645135 AS yb FROM b1),
      |b3 AS (SELECT *, (xb | (xb << 2)) & 858993459 AS xc,
      |               (yb | (yb << 2)) & 858993459 AS yc FROM b2),
      |b4 AS (SELECT *, (xc | (xc << 1)) & 1431655765 AS xd,
      |               (yc | (yc << 1)) & 1431655765 AS yd FROM b3)
      |SELECT l_orderkey, l_linenumber, CAST(xd | (yd << 1) AS BIGINT) AS zkey
      |FROM b4 ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Hilbert key per line item over the same (partkey, suppkey) low-16
    * dims as o_zorder_key. The oracle UNROLLS the 16 dependent rounds of
    * the xy2d walk as a CTE chain generated from the same bit constants
    * the codegen'd expression uses — every quadrant contribution and
    * rotation is pinned cross-engine. */
  private def hilbertKey(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        Layout.hvalue2(col("l_partkey"), col("l_suppkey")).as("hkey"))
      .orderBy("l_orderkey", "l_linenumber")

  private val hilbertOracle: String = {
    val bits = 16
    val n = 1L << bits
    val rounds = (bits - 1 to 0 by -1).zipWithIndex.map { case (bit, idx) =>
      val s = 1L << bit
      s"""h${idx + 1} AS (SELECT l_orderkey, l_linenumber,
         |  d + ${s * s} * xor(3 * rx, ry) AS d,
         |  CASE WHEN ry = 0 THEN
         |    (CASE WHEN rx = 1 THEN ${n - 1} - y ELSE y END)
         |  ELSE x END AS x,
         |  CASE WHEN ry = 0 THEN
         |    (CASE WHEN rx = 1 THEN ${n - 1} - x ELSE x END)
         |  ELSE y END AS y
         |FROM (SELECT *,
         |    CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |    CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
         |  FROM h$idx))""".stripMargin
    }.mkString(",\n")
    s"""WITH h0 AS (SELECT l_orderkey, l_linenumber, CAST(0 AS BIGINT) AS d,
       |    CAST(l_partkey & ${n - 1} AS BIGINT) AS x,
       |    CAST(l_suppkey & ${n - 1} AS BIGINT) AS y
       |  FROM lineitem),
       |$rounds
       |SELECT l_orderkey, l_linenumber, CAST(d AS BIGINT) AS hkey
       |FROM h$bits ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  /** Exact outlier flagging per event_type: count values more than two
    * sample standard deviations from the group mean — computed ENTIRELY
    * in integer arithmetic on cent-scaled values, so there is no float
    * anywhere and the cross-engine comparison is exact:
    *   (x-μ)² > 4σ²  ⇔  (n-1)·(n·x-s)² > 4·n·(n·q-s²)
    * with s = Σx, q = Σx² over cents.
    *
    * Scale: the classic two-pass exact shape — tiny per-group moment
    * table (one hash agg), broadcast back over the stream for the flag
    * pass. No window over the whole group, no sort. */
  private def zscoreOutliers(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val e = Sources.table(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100).cast(dec).as("v"))
    val g = e.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec).as("gn"),
        sum(col("v")).cast(dec).as("gs"),
        sum(col("v") * col("v")).cast(dec).as("gq"))
    val lhs = (col("gn") - 1) *
      (col("gn") * col("v") - col("gs")) * (col("gn") * col("v") - col("gs"))
    val rhs = (col("gn") * col("gq") - col("gs") * col("gs")) *
      col("gn") * 4
    e.join(broadcast(g), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(lhs > rhs, 1L).otherwise(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  private val zscoreOracle: String =
    """WITH e AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
      |           FROM events WHERE value IS NOT NULL),
      |g AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS gn,
      |             CAST(SUM(v) AS HUGEINT) AS gs,
      |             CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS gq
      |      FROM e GROUP BY 1)
      |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN (g.gn - 1) * (g.gn * e.v - g.gs)
      |                     * (g.gn * e.v - g.gs)
      |                   > 4 * g.gn * (g.gn * g.gq - g.gs * g.gs)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM e JOIN g USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("f_profile_columns", profileColumns, Some(profileOracle)),
    QueryDef("f_profile_columns_approx", profileColumnsApprox,
      Some(profileApproxOracle)),
    QueryDef("a_value_histogram", valueHistogram, Some(histogramOracle)),
    QueryDef("a_equidepth_bins", equidepthBins, Some(equidepthOracle)),
    QueryDef("o_zorder_key", zorderKey, Some(zorderOracle)),
    QueryDef("o_hilbert_key", hilbertKey, Some(hilbertOracle)),
    QueryDef("a_zscore_outliers", zscoreOutliers, Some(zscoreOracle)),
  )
}
