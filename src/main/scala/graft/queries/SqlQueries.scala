package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources

/** SQL-authored analytical surface: correlated subqueries, lateral
  * joins, and mergeable-sketch rollups — the shapes analysts write that
  * exercise Catalyst's subquery decorrelation and the re-aggregation
  * path sketches exist for.
  */
object SqlQueries extends QueryGroup {

  private def view(s: SparkSession, dir: String, name: String): String = {
    val v = s"${name}_sq"
    Sources.table(s, dir, name).createOrReplaceTempView(v)
    v
  }

  /** Correlated scalar subqueries + EXISTS, authored as SQL: orders more
    * than twice their customer's average order value that contain at
    * least one near-max-quantity line. Catalyst decorrelates both into
    * aggregate-joins (no per-row re-execution — the rewrite that makes
    * subqueries survive scale). The average is compared via exact
    * integer/decimal cross-multiplication (price·n > 2·sum), not a
    * float mean. */
  private def subqueries(s: SparkSession, dir: String): DataFrame = {
    val o = view(s, dir, "orders")
    val l = view(s, dir, "lineitem")
    s.sql(
      s"""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
         |FROM $o o
         |WHERE o.o_totalprice *
         |    (SELECT COUNT(*) FROM $o o2
         |     WHERE o2.o_custkey = o.o_custkey)
         |  > CAST(2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,2)))
         |              FROM $o o3 WHERE o3.o_custkey = o.o_custkey)
         |         AS DOUBLE)
         |  AND EXISTS (SELECT 1 FROM $l l
         |              WHERE l.l_orderkey = o.o_orderkey
         |                AND l.l_quantity >= 45)
         |ORDER BY o.o_orderkey""".stripMargin)
  }

  private val subqueriesOracle: String =
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
      |FROM orders o
      |WHERE o.o_totalprice *
      |    (SELECT COUNT(*) FROM orders o2
      |     WHERE o2.o_custkey = o.o_custkey)
      |  > CAST(2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,2)))
      |              FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
      |         AS DOUBLE)
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_quantity >= 45)
      |ORDER BY o.o_orderkey""".stripMargin

  /** LATERAL join: each customer's two largest orders — the top-N-per-
    * key shape written the way analysts write it. Spark plans the
    * correlated LIMIT as a per-key window group limit, not a per-row
    * subquery re-execution. Ties break on orderkey so both engines pick
    * the same two rows. */
  private def lateralTop2(s: SparkSession, dir: String): DataFrame = {
    val c = view(s, dir, "customer")
    val o = view(s, dir, "orders")
    s.sql(
      s"""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
         |FROM $c c
         |JOIN LATERAL (
         |  SELECT o.o_orderkey, o.o_totalprice FROM $o o
         |  WHERE o.o_custkey = c.c_custkey
         |  ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
         |  LIMIT 2) t
         |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  private val lateralOracle: String =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c
      |JOIN LATERAL (
      |  SELECT o.o_orderkey, o.o_totalprice FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
      |  LIMIT 2) t ON TRUE
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  /** Mergeable-sketch rollup: per-day HLL sketches of active users are
    * UNIONED into per-event-type totals — the pre-aggregated-cube path
    * that answers any-period distinct-count questions without touching
    * raw events again (approx_count_distinct alone cannot be
    * re-aggregated; sketches can). Emitted as the repo's bound-as-data
    * pattern: exact count + "merged estimate within 5%" boolean, so the
    * row hash-matches iff the sketch math held. */
  private def hllMergeDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = Sources.table(s, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = Sources.table(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(merged, Seq("event_type"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("merged_within_5pct"))
      .orderBy("event_type")
  }

  private val hllMergeOracle: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
      |       TRUE AS merged_within_5pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Rolling 7-day actives from HLL sketches merged OVER A WINDOW — the
    * at-scale twin of `w_rolling_distinct`: per-day sketch state is a
    * few KB however many users a day has, and each rolling value merges
    * 7 sketches instead of unioning 7 user sets. Bound-as-data: the
    * estimate must sit within 5% of the exact window count (itself the
    * oracle-verified `w_rolling_distinct` value); only engine-stable
    * columns are emitted. */
  private def hllRolling(s: SparkSession, dir: String): DataFrame = {
    // exact_7d must stay formulation-identical to WarehouseQueries
    // .rollingDistinct (same null filter, day grain, -6..0 range): the
    // 5% bound below is only meaningful against the series that
    // w_rolling_distinct pins. Not shared as code because this plan
    // fuses the sketch and the exact set into ONE per-day aggregate —
    // reusing rollingDistinct would split that into two scans.
    val ev = Sources.table(s, dir, "events")
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01")).as("day"),
        col("user_id"))
    val daily = ev.groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        collect_set(col("user_id")).as("users"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day")).rangeBetween(-6, 0)
    daily
      .withColumn("est",
        hll_sketch_estimate(hll_union_agg(col("sk")).over(w)))
      .withColumn("exact_7d",
        size(array_distinct(flatten(collect_list(col("users")).over(w))))
          .cast("long"))
      .select(col("event_type"), col("day").cast("long").as("day"),
        col("exact_7d"),
        (abs(col("est") - col("exact_7d")) <=
          col("exact_7d").cast("double") * lit(0.05)).as("within_5pct"))
      .orderBy("event_type", "day")
  }

  private val hllRollingOracle: String =
    """WITH d AS (SELECT DISTINCT event_type,
      |    (CAST(ts AS DATE) - DATE '1970-01-01') AS day, user_id
      |  FROM events WHERE user_id IS NOT NULL),
      |days AS (SELECT DISTINCT event_type, day FROM d)
      |SELECT days.event_type, CAST(days.day AS BIGINT) AS day,
      |  CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS exact_7d,
      |  TRUE AS within_5pct
      |FROM days JOIN d
      |  ON d.event_type = days.event_type
      | AND d.day BETWEEN days.day - 6 AND days.day
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Recursive CTE (Spark 4): ancestor closure of a decimal-decade key
    * hierarchy — the adjacency-walk shape warehouses run for org charts,
    * category trees, and BOM explosion. Spark's recursion is UNION ALL
    * form; it terminates here because the parent step is strictly
    * monotone (k div 10 < k), giving log-depth recursion where every
    * level is one narrow projection of the previous — a shape that
    * survives any table size. Cyclic graphs (connected components) stay
    * with the iterative min-label operator: UNION-distinct recursion is
    * not in Spark yet, and `dedup_clusters` already pins that twin
    * against DuckDB's recursive closure. */
  private def recursiveHierarchy(s: SparkSession, dir: String): DataFrame = {
    val c = view(s, dir, "customer")
    s.sql(
      s"""WITH RECURSIVE anc(custkey, ancestor, depth) AS (
         |  SELECT c_custkey, c_custkey DIV 10, 1
         |  FROM $c WHERE c_custkey > 0
         |  UNION ALL
         |  SELECT custkey, ancestor DIV 10, depth + 1 FROM anc
         |  WHERE ancestor > 0)
         |SELECT custkey, ancestor, depth FROM anc
         |ORDER BY custkey, depth""".stripMargin)
  }

  private val recursiveOracle: String =
    """WITH RECURSIVE anc(custkey, ancestor, depth) AS (
      |  SELECT c_custkey, c_custkey // 10, 1
      |  FROM customer WHERE c_custkey > 0
      |  UNION ALL
      |  SELECT custkey, ancestor // 10, depth + 1 FROM anc
      |  WHERE ancestor > 0)
      |SELECT custkey, ancestor, depth FROM anc
      |ORDER BY custkey, depth""".stripMargin

  /** SQL pipe syntax (Spark 4): the linear dataflow dialect — FROM
    * |> EXTEND |> AGGREGATE |> WHERE |> ORDER BY reads top-to-bottom in
    * execution order instead of inside-out. Parses to exactly the plan
    * of the nested form (the oracle's HAVING formulation), so the
    * surface costs nothing; the post-AGGREGATE WHERE is the HAVING
    * equivalent. */
  private def pipeSyntax(s: SparkSession, dir: String): DataFrame = {
    val e = view(s, dir, "events")
    s.sql(
      s"""FROM $e
         ||> EXTEND CAST(CAST(ts AS DATE) AS STRING) AS date
         ||> AGGREGATE COUNT(*) AS plays GROUP BY date, event_type
         ||> WHERE plays >= 5
         ||> SELECT date, event_type, plays
         ||> ORDER BY date, event_type""".stripMargin)
  }

  private val pipeOracle: String =
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS date, event_type,
      |       COUNT(*) AS plays
      |FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 5
      |ORDER BY date, event_type""".stripMargin

  /** GROUP BY ALL / ORDER BY ALL (Spark 4 ≡ DuckDB syntax — the oracle
    * is the IDENTICAL text modulo table name): every non-aggregate
    * select item becomes a group key, the whole select list the sort
    * key. Sugar over the same Aggregate node — the plan is byte-for-byte
    * the explicit GROUP BY's, so nothing changes at scale; the query
    * pins that the sugar resolves the same columns in both engines. */
  private def groupByAll(s: SparkSession, dir: String): DataFrame = {
    val e = view(s, dir, "events")
    s.sql(
      s"""SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS day,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
         |FROM $e
         |GROUP BY ALL
         |ORDER BY ALL""".stripMargin)
  }

  private val groupByAllOracle: String =
    """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
      |FROM events
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  /** NOT IN vs NOT EXISTS under NULLs — the three-valued-logic footgun
    * pinned as data: ONE null in the subquery makes `NOT IN` return
    * zero rows (every comparison is UNKNOWN), while `NOT EXISTS` and
    * the null-filtered NOT IN behave as intended. Both engines
    * implement the standard, so the oracle is the same query — the
    * value is the regression pin: an "optimization" that rewrites
    * NOT IN to an anti-join without the null guard fails here. */
  private def notInNull(s: SparkSession, dir: String): DataFrame = {
    val e = view(s, dir, "events")
    s.sql(
      s"""WITH sub AS (SELECT user_id FROM $e WHERE event_type = 'purchase'
         |             UNION ALL SELECT CAST(NULL AS BIGINT))
         |SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $e
         |   WHERE user_id NOT IN (SELECT user_id FROM sub))
         |    AS not_in_with_null,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $e e1
         |   WHERE NOT EXISTS (SELECT 1 FROM sub
         |                     WHERE sub.user_id = e1.user_id))
         |    AS not_exists_with_null,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $e
         |   WHERE user_id NOT IN (SELECT user_id FROM sub
         |                         WHERE user_id IS NOT NULL))
         |    AS not_in_null_filtered""".stripMargin)
  }

  private val notInNullOracle: String =
    """WITH sub AS (SELECT user_id FROM events WHERE event_type = 'purchase'
      |             UNION ALL SELECT CAST(NULL AS BIGINT))
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events
      |   WHERE user_id NOT IN (SELECT user_id FROM sub))
      |    AS not_in_with_null,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events e1
      |   WHERE NOT EXISTS (SELECT 1 FROM sub
      |                     WHERE sub.user_id = e1.user_id))
      |    AS not_exists_with_null,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events
      |   WHERE user_id NOT IN (SELECT user_id FROM sub
      |                         WHERE user_id IS NOT NULL))
      |    AS not_in_null_filtered""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q_not_in_null", notInNull, Some(notInNullOracle)),
    QueryDef("q_group_by_all", groupByAll, Some(groupByAllOracle)),
    QueryDef("q_subqueries", subqueries, Some(subqueriesOracle)),
    QueryDef("j_lateral_top2", lateralTop2, Some(lateralOracle)),
    QueryDef("a_hll_merge_daily", hllMergeDaily, Some(hllMergeOracle)),
    QueryDef("a_hll_rolling", hllRolling, Some(hllRollingOracle)),
    QueryDef("q_recursive_hierarchy", recursiveHierarchy,
      Some(recursiveOracle)),
    QueryDef("q_pipe_syntax", pipeSyntax, Some(pipeOracle)),
  )
}
