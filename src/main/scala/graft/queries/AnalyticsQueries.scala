package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Time-series analytics operators: gap filling with carry-forward and
  * ordered funnel analysis — the product-analytics surface a streaming
  * warehouse serves, expressed in the shapes that survive 100 TB.
  */
object AnalyticsQueries extends QueryGroup {

  /** Gap-filled daily activity per user: a dense day scaffold between each
    * user's first and last active day, 0-filled event counts, and
    * carry-forward (LOCF) of the last observed daily max value.
    *
    * Scale: the scaffold is GENERATED DISTRIBUTED — sequence() + explode
    * per user, never a driver-side calendar join; span and daily rows
    * partition by the same user key, so the join and the carry-forward
    * window reuse one partitioning. Dense output is bounded by
    * users × span-days, not events. */
  private def gapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = Sources.table(s, dir, "events")
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01"))
          .cast("long").as("d"),
        col("value"))
      .groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
    val scaffold = daily.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("d"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    scaffold.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("mx"), ignoreNulls = true).over(w).as("filled_max"))
      .orderBy("user_id", "d")
  }

  private val gapFillOracle: String =
    """WITH daily AS (SELECT user_id,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS n, MAX(value) AS mx
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1
      |         FROM daily GROUP BY 1),
      |scaffold AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS d FROM span)
      |SELECT s.user_id, s.d, COALESCE(daily.n, 0) AS n_events,
      |  last_value(daily.mx IGNORE NULLS) OVER (
      |    PARTITION BY s.user_id ORDER BY s.d) AS filled_max
      |FROM scaffold s LEFT JOIN daily
      |  ON s.user_id = daily.user_id AND s.d = daily.d
      |ORDER BY s.user_id, s.d""".stripMargin

  /** Ordered funnel per user: earliest view, earliest click at-or-after
    * that view, earliest purchase at-or-after that click — strictly
    * sequence-respecting (a purchase before the qualifying click does not
    * count).
    *
    * Single scan: running conditional minima over the same (user, time)
    * window chain the stages — no self-joins, and both windows plus the
    * final aggregation share ONE user-keyed exchange. Frames are
    * value-bounded (RANGE), so same-millisecond ties behave identically
    * in any engine. Timestamps out as epoch ms. */
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Sources.table(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts_ms"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" &&
          col("t_view").isNotNull, col("ts_ms"))).over(w))
      .withColumn("t_purchase",
        when(col("event_type") === "purchase" &&
          col("t_click").isNotNull, col("ts_ms")))
      .groupBy(col("user_id"))
      .agg(min(col("t_view")).as("first_view_ms"),
        min(col("t_click")).as("first_click_ms"),
        min(col("t_purchase")).as("first_purchase_ms"))
      .orderBy("user_id")
  }

  private val funnelOracle: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms
      |           FROM events),
      |s1 AS (SELECT *,
      |    MIN(CASE WHEN event_type = 'view' THEN ts_ms END) OVER (
      |      PARTITION BY user_id ORDER BY ts_ms
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_view
      |  FROM e),
      |s2 AS (SELECT *,
      |    MIN(CASE WHEN event_type = 'click' AND t_view IS NOT NULL
      |             THEN ts_ms END) OVER (
      |      PARTITION BY user_id ORDER BY ts_ms
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_click
      |  FROM s1)
      |SELECT user_id, MIN(t_view) AS first_view_ms,
      |  MIN(t_click) AS first_click_ms,
      |  MIN(CASE WHEN event_type = 'purchase' AND t_click IS NOT NULL
      |           THEN ts_ms END) AS first_purchase_ms
      |FROM s2 GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Exponentially-weighted moving average of daily play counts per type:
    * the trend-smoothing signal monitoring dashboards chart. Half-life
    * decay (α = 1/2 per day) over a 14-day horizon — beyond 13 days a
    * weight is < 2⁻¹³ of today's and is cut.
    *
    * Shape: ONE shuffle builds the daily grain; the decayed sum is a RANGE
    * window (value-bounded on the epoch-day key, so missing days weight
    * correctly — a ROWS frame would mis-date gaps) collecting ≤ 14
    * (day, count) structs, folded by a codegen'd HOF. No self-join, no
    * second exchange.
    *
    * Cross-engine exactness: weights are 1/2ᵏ via integer shift-left and
    * one division — exact dyadic rationals, so every term and the ≤14-term
    * sum are exact IEEE doubles in any engine and any addition order (no
    * pow(), whose last-bit rounding libm does not guarantee). */
  private def ewma(s: SparkSession, dir: String): DataFrame = {
    val daily = Sources.table(s, dir, "events")
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01"))
          .cast("long").as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rangeBetween(-13, Window.currentRow)
    daily
      .withColumn("hist",
        collect_list(struct(col("d").as("hd"), col("cnt").as("hc"))).over(w))
      .select(col("event_type"), col("d"),
        expr("""aggregate(hist, cast(0.0 as double), (acc, h) ->
                |  acc + h.hc / cast(shiftleft(1L, cast(d - h.hd as int))
                |                    as double))""".stripMargin).as("ewma"))
      .orderBy("event_type", "d")
  }

  private val ewmaOracle: String =
    """WITH daily AS (SELECT event_type,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
      |    CAST(COUNT(*) AS DOUBLE) AS cnt
      |  FROM events GROUP BY 1, 2)
      |SELECT c.event_type, c.d,
      |  SUM(h.cnt / CAST(1 << (c.d - h.d) AS DOUBLE)) AS ewma
      |FROM daily c JOIN daily h
      |  ON c.event_type = h.event_type
      | AND h.d BETWEEN c.d - 13 AND c.d
      |GROUP BY c.event_type, c.d
      |ORDER BY c.event_type, c.d""".stripMargin

  /** Market-basket co-occurrence: part pairs ordered together, with
    * support ≥ 2 orders — the item-item signal collaborative filtering
    * starts from.
    *
    * Scale: the naive formulation (the oracle's self-join on order key)
    * shuffles the fact table TWICE and materializes every comparison.
    * Here one shuffle builds sorted per-order baskets, pair expansion is
    * a narrow codegen'd HOF bounded by C(basket, 2) — baskets are
    * naturally small (TPC-H ≤ 7 items; a production variant caps the
    * basket at top-N items, the standard guard) — and the pair count is
    * map-side combinable. Sorting inside the basket gives p1 < p2 without
    * a distinct pass. The build lives in [[GraphQueries.edgePairs]]: the
    * counted pair table IS the co-purchase graph's edge set, which
    * `g_triangle_count` and `g_pagerank_int` consume too — a warmed
    * runner materializes it once for all three. */
  private def copurchase(s: SparkSession, dir: String): DataFrame =
    GraphQueries.sharedEdges(s, dir, checkpointFallback = false)
      .orderBy(col("n_orders").desc, col("p1").asc, col("p2").asc)

  private val copurchaseOracle: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS p1, b.l_partkey AS p2,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM li a JOIN li b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |ORDER BY n_orders DESC, p1 ASC, p2 ASC""".stripMargin

  /** 2-D skyline (Pareto frontier) of parts: cheapest-for-their-size
    * parts — no other part is both ≤ price and ≥ size with one strict.
    * The multi-objective "best tradeoff" query (Börzsönyi et al. 2001,
    * "The Skyline Operator") that naive SQL answers with an O(n²)
    * NOT EXISTS self-join.
    *
    * Here the 2-D case collapses to a sort-sweep, expressed declaratively:
    * group per price (max size per price group), one running-max window
    * over the price-ordered group table, then a semi-join back. A point
    * survives iff it holds its price group's max size AND beats the max
    * size of every strictly cheaper group. The fact table is scanned
    * once; the window runs over DISTINCT PRICES (already aggregated, ≪
    * rows); the join back is a broadcast of the tiny frontier-candidate
    * table. The sweep provably equals the NOT EXISTS definition (checked
    * against it in DuckDB; ties on both dims survive on both sides —
    * neither dominates without a strict inequality). */
  private def skylinePareto(s: SparkSession, dir: String): DataFrame = {
    val pts = Sources.table(s, dir, "part")
      .filter(col("p_retailprice").isNotNull && col("p_size").isNotNull)
      .select(col("p_partkey"), col("p_retailprice").as("price"),
        col("p_size").as("size"))
    val gm = pts.groupBy(col("price")).agg(max(col("size")).as("gm"))
    val w = Window.orderBy(col("price").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = gm.withColumn("prev_max", max(col("gm")).over(w))
      .filter(col("prev_max").isNull || col("gm") > col("prev_max"))
    pts.join(broadcast(frontier), Seq("price"))
      .filter(col("size") === col("gm"))
      .select(col("p_partkey"), col("price"), col("size"))
      .orderBy(col("price").asc, col("p_partkey").asc)
  }

  private val skylineOracle: String =
    """WITH g AS (SELECT p_retailprice AS price, MAX(p_size) AS gm
      |  FROM part
      |  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
      |  GROUP BY 1),
      |r AS (SELECT price, gm, MAX(gm) OVER (ORDER BY price
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |        AS prev_max
      |      FROM g)
      |SELECT p.p_partkey, p.p_retailprice AS price, p.p_size AS size
      |FROM part p JOIN r ON p.p_retailprice = r.price
      |WHERE p.p_size = r.gm
      |  AND (r.prev_max IS NULL OR p.p_size > r.prev_max)
      |ORDER BY price, p.p_partkey""".stripMargin

  /** Max concurrent sessions per day — interval overlap by sweep line.
    * Sessions (closed intervals [start, end], from the oracle-pinned
    * Sessionize.batch) become ±1 deltas, AGGREGATED PER TIMESTAMP first
    * (the big shrink: distinct sweep points, and it makes the running
    * value order-free — per-row ties would be partitioning-dependent),
    * then the global cumulative count runs through
    * [[graft.ops.PrefixSum]] — range-partitioned two-phase prefix sum,
    * NOT a single-reducer `SUM OVER (ORDER BY t)`. Closed-interval rule:
    * sessions ending exactly at t are still alive at t, so concurrency
    * at t adds ends(t) back onto the cumulative net. */
  private def maxConcurrency(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.streaming.Sessionize
      .batch(Sources.table(s, dir, "events"), gapMs = 1800000L)
    val deltas = sess
      .select(col("session_start_ms").as("t"), lit(1L).as("d_s"),
        lit(0L).as("d_e"))
      .unionAll(sess.select(col("session_end_ms").as("t"), lit(0L).as("d_s"),
        lit(1L).as("d_e")))
      .groupBy(col("t"))
      .agg(sum(col("d_s")).as("starts"), sum(col("d_e")).as("ends"))
      .withColumn("net", col("starts") - col("ends"))
    graft.ops.PrefixSum.runningSum(deltas, Seq(col("t")), "net", "cum")
      .withColumn("conc", col("cum") + col("ends"))
      .groupBy(date_format(timestamp_millis(col("t")), "yyyy-MM-dd")
        .as("date"))
      .agg(max(col("conc")).as("max_concurrency"))
      .orderBy("date")
  }

  private val maxConcurrencyOracle: String =
    """WITH o AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
      |b AS (SELECT user_id, ts_ms,
      |        CASE WHEN ts_ms - lag(ts_ms) OVER
      |               (PARTITION BY user_id ORDER BY ts_ms) > 1800000
      |             THEN 1 ELSE 0 END AS brk
      |      FROM o),
      |s AS (SELECT user_id, ts_ms,
      |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
      |          ROWS UNBOUNDED PRECEDING) AS session_no
      |      FROM b),
      |sess AS (SELECT user_id, session_no, MIN(ts_ms) AS st,
      |               MAX(ts_ms) AS en
      |         FROM s GROUP BY 1, 2),
      |d AS (SELECT t, SUM(d_s) AS starts, SUM(d_e) AS ends
      |      FROM (SELECT st AS t, 1 AS d_s, 0 AS d_e FROM sess
      |            UNION ALL SELECT en, 0, 1 FROM sess)
      |      GROUP BY t),
      |c AS (SELECT t, ends,
      |        SUM(starts - ends) OVER (ORDER BY t
      |          ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM d)
      |SELECT strftime(epoch_ms(CAST(t AS BIGINT)), '%Y-%m-%d') AS date,
      |       CAST(MAX(cum + ends) AS BIGINT) AS max_concurrency
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Autocorrelation of daily play counts per event type, lags 1..7 —
    * the seasonality/drift detector (a weekly cycle shows as a lag-7
    * peak). Exact to the last bit across engines: with n days, S = Σx,
    * every centered term is scaled by n — (n·xₜ − S) is BIGINT — so
    * r_L = Σ(n·xₜ−S)(n·xₜ₊L−S) / Σ(n·xₜ−S)² needs ONE double division
    * at the end (the entropy/chi-square recipe; the n² scale factor
    * cancels). Per-type series ride one keyed window (n, S, den as
    * whole-partition aggregates; the lag via lead) — the series length
    * is days, so the window partition is tiny however big the corpus. */
  private def acf(s: SparkSession, dir: String): DataFrame = {
    val maxLag = 7
    val daily = Sources.table(s, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val centered = daily
      .withColumn("n", count(lit(1)).over(full))
      .withColumn("ss", sum(col("x")).over(full))
      .withColumn("c", col("n") * col("x") - col("ss"))
      .withColumn("den", sum(col("c") * col("c")).over(full))
    val lagged = (1 to maxLag).foldLeft(centered) { (df, l) =>
      df.withColumn(s"c$l", lead(col("c"), l).over(w))
    }
    val stacked = lagged.select(col("event_type"), col("c"), col("den"),
      explode(array((1 to maxLag).map(l =>
        struct(lit(l).as("lag"), col(s"c$l").as("cl"))): _*)).as("z"))
      .select(col("event_type"), col("z.lag").as("lag"),
        col("c"), col("z.cl").as("cl"), col("den"))
    stacked.filter(col("cl").isNotNull)
      .groupBy(col("event_type"), col("lag"))
      .agg(sum(col("c") * col("cl")).as("num"), max(col("den")).as("den"))
      .select(col("event_type"), col("lag"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("acf"))
      .orderBy("event_type", "lag")
  }

  private val acfOracle: String =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |c AS (SELECT event_type, day, x,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    SUM(x) OVER (PARTITION BY event_type) AS ss
      |  FROM d),
      |e AS (SELECT event_type, day, n * x - ss AS ctr,
      |    SUM((n * x - ss) * (n * x - ss))
      |      OVER (PARTITION BY event_type) AS den
      |  FROM c),
      |l AS (SELECT event_type, lag, ctr,
      |    lead(ctr, lag) OVER (PARTITION BY event_type, lag ORDER BY day)
      |      AS cl, den
      |  FROM e CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7]) AS lag))
      |SELECT event_type, lag,
      |  round(CAST(SUM(ctr * cl) AS DOUBLE) / CAST(MAX(den) AS DOUBLE), 6)
      |    AS acf
      |FROM l WHERE cl IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Seasonal-naive forecasting with backtest: predict each day's count
    * from 7 days earlier (the weekly cycle t_acf_daily detects), scored
    * by MAE against the lag-1 naive baseline over the same evaluation
    * days. All errors are exact BIGINT sums; the two MAEs divide once at
    * the end — the standard "is there seasonality worth modeling" gate
    * a forecasting pipeline runs before reaching for real models. */
  private def forecastSnaive(s: SparkSession, dir: String): DataFrame = {
    val daily = Sources.table(s, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("lag7", lag(col("x"), 7).over(w))
      .withColumn("lag1", lag(col("x"), 1).over(w))
      .filter(col("lag7").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("x") - col("lag7"))).as("e7"),
        sum(abs(col("x") - col("lag1"))).as("e1"))
      .select(col("event_type"), col("n_eval"),
        round(col("e7").cast("double") / col("n_eval").cast("double"), 6)
          .as("mae_snaive"),
        round(col("e1").cast("double") / col("n_eval").cast("double"), 6)
          .as("mae_naive"),
        (col("e7") < col("e1")).as("snaive_wins"))
      .orderBy("event_type")
  }

  private val forecastOracle: String =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |l AS (SELECT event_type, x,
      |    lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS lag7,
      |    lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS lag1
      |  FROM d)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_eval,
      |  round(CAST(SUM(abs(x - lag7)) AS DOUBLE) / COUNT(*), 6)
      |    AS mae_snaive,
      |  round(CAST(SUM(abs(x - lag1)) AS DOUBLE) / COUNT(*), 6)
      |    AS mae_naive,
      |  SUM(abs(x - lag7)) < SUM(abs(x - lag1)) AS snaive_wins
      |FROM l WHERE lag7 IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("t_forecast_snaive", forecastSnaive, Some(forecastOracle)),
    QueryDef("t_acf_daily", acf, Some(acfOracle)),
    QueryDef("t_gap_fill", gapFill, Some(gapFillOracle)),
    QueryDef("t_skyline_pareto", skylinePareto, Some(skylineOracle)),
    QueryDef("f_funnel_stages", funnel, Some(funnelOracle)),
    QueryDef("t_ewma_daily", ewma, Some(ewmaOracle)),
    QueryDef("g_copurchase_pairs", copurchase, Some(copurchaseOracle)),
    QueryDef("t_max_concurrency", maxConcurrency, Some(maxConcurrencyOracle)),
  )
}
