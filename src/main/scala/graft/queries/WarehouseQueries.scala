package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Warehouse-modeling operators the reference's Redshift consumers would
  * reach for next: slowly-changing-dimension construction, cohort
  * retention, full-outer reconciliation, and trailing time-range rollups.
  * All shapes chosen so the heavy windows/joins share ONE user-keyed
  * exchange — the property that matters at 100 TB.
  */
object WarehouseQueries extends QueryGroup {

  /** SCD Type-2 build: collapse each user's event stream into versioned
    * state intervals — a new version opens whenever event_type changes,
    * closes at the next change (valid_to NULL = current row).
    *
    * Scale: change-detection (lag), interval close (lead) and version
    * numbering (row_number) all sit on the SAME (user_id → ts) window, so
    * the whole build is one exchange + two sorts of the change rows; no
    * self-join against "next row" as a naive SQL port would do. Ordering
    * carries an event_id tie-break so same-millisecond events version
    * deterministically in any engine. */
  /** Unsorted SCD2 version table — shared by the build query (which adds
    * the presentation sort) and the temporal join (which must NOT pay a
    * total sort it would immediately re-shuffle). */
  private[queries] def scd2Versions(s: SparkSession, dir: String)
      : DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    val changes = Sources.table(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      // null-safe: the first row per user (prev = NULL) always opens v1
      .filter(!(col("prev") <=> col("event_type")))
    changes
      .select(col("user_id"),
        row_number().over(w).cast("long").as("version"),
        col("event_type").as("state"),
        col("ts_ms").as("valid_from_ms"),
        lead(col("ts_ms"), 1).over(w).as("valid_to_ms"))
      .withColumn("is_current", col("valid_to_ms").isNull)
  }

  private def scd2Build(s: SparkSession, dir: String): DataFrame =
    scd2Versions(s, dir).orderBy("user_id", "version")

  private val scd2Oracle: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
      |           FROM events),
      |c AS (SELECT *, lag(event_type) OVER (
      |        PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
      |      FROM e),
      |ch AS (SELECT user_id, event_type, ts_ms, event_id FROM c
      |       WHERE prev IS DISTINCT FROM event_type)
      |SELECT user_id,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |    AS version,
      |  event_type AS state, ts_ms AS valid_from_ms,
      |  lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |    AS valid_to_ms,
      |  lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |    IS NULL AS is_current
      |FROM ch ORDER BY user_id, version""".stripMargin

  /** Weekly cohort retention: users bucketed by first-active week, then
    * distinct actives per (cohort, weeks-since-cohort) cell. Weeks are
    * integer arithmetic off a fixed Monday epoch (1970-01-05), not
    * date_trunc — identical in every engine and timezone.
    *
    * Scale: the cohort table is an aggregate of the same user-keyed scan,
    * so scan → first-week agg → join all share the user_id partitioning
    * (one exchange), and only the final small (cohort × offset) rollup
    * reshuffles. */
  private def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = Sources.table(s, dir, "events")
      .select(col("user_id"),
        floor(datediff(col("ts").cast("date"), lit("1970-01-05")) / lit(7))
          .as("wk"))
    val cohorts = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    e.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_wk", "week_offset")
  }

  private val cohortOracle: String =
    """WITH e AS (SELECT user_id,
      |    CAST(FLOOR((CAST(ts AS DATE) - DATE '1970-01-05') / 7.0) AS BIGINT)
      |      AS wk
      |  FROM events),
      |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY 1)
      |SELECT f.cohort_wk, e.wk - f.cohort_wk AS week_offset,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Full outer reconciliation: per-user view counts vs purchase counts,
    * preserving users that appear on only one side (NULL on the other) —
    * the audit shape for comparing two independently-produced rollups.
    * Both sides aggregate BEFORE the join, so the full-outer matches one
    * row per user per side (no fan-out) and the join is between two
    * pre-shrunk user-keyed tables. */
  private def fullOuterReconcile(s: SparkSession, dir: String): DataFrame = {
    val e = Sources.table(s, dir, "events")
    def side(t: String, as: String): DataFrame =
      e.filter(col("event_type") === t)
        .groupBy(col("user_id")).agg(count(lit(1)).as(as))
    val v = side("view", "n_views")
    val p = side("purchase", "n_purchases")
    v.join(p, Seq("user_id"), "full_outer")
      .select(col("user_id"), col("n_views"), col("n_purchases"))
      .orderBy("user_id")
  }

  private val fullOuterOracle: String =
    """WITH v AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_views
      |           FROM events WHERE event_type = 'view' GROUP BY 1),
      |p AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT COALESCE(v.user_id, p.user_id) AS user_id,
      |       v.n_views, p.n_purchases
      |FROM v FULL OUTER JOIN p ON v.user_id = p.user_id
      |ORDER BY user_id""".stripMargin

  /** Trailing 7-day rollup per event: how many events and how much value
    * the user produced in the 7 days ending at each event — a
    * value-bounded (RANGE) frame, so same-millisecond peers aggregate
    * identically in any engine, and the sum runs in DECIMAL (exact,
    * order-independent) before one final double cast. */
  private def rolling7d(s: SparkSession, dir: String): DataFrame = {
    val sevenDaysMs = 7L * 24 * 3600 * 1000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      .rangeBetween(-sevenDaysMs, Window.currentRow)
    Sources.table(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("value").cast("decimal(18,6)").as("v"))
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_7d"),
        sum(col("v")).over(w).cast("double").as("sum_7d"))
      .orderBy("user_id", "event_id")
  }

  private val rolling7dOracle: String =
    """SELECT user_id, event_id,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |  RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** USE the SCD2 dimension: enrich each purchase with the version valid
    * at its event time. At scale this is an AS-OF join (one keyed
    * exchange via ops/Joins.asofJoin — last version whose valid_from ≤
    * event time), NOT the interval join the oracle states: BETWEEN
    * predicates either broadcast or explode, while the as-of shape runs
    * on two 100 TB inputs. Versions are deduped to the max version per
    * (user, valid_from) first — an empty [t, t) interval can hold no
    * event — which is exactly what makes the two formulations equal. */
  private def scd2Temporal(s: SparkSession, dir: String): DataFrame = {
    val purchases = Sources.table(s, dir, "events")
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"))
    val versions = scd2Versions(s, dir)
      .groupBy(col("user_id"), col("valid_from_ms"))
      .agg(max_by(struct(col("version"), col("state")), col("version"))
        .as("vs"))
      .select(col("user_id"), col("valid_from_ms").as("vts"),
        col("vs.version").as("version"), col("vs.state").as("state"))
    graft.ops.Joins.asofJoin(purchases, versions, Seq("user_id"),
        "ts_ms", "vts")
      .select(col("event_id"), col("user_id"), col("ts_ms"), col("state"),
        col("version"))
      .orderBy("event_id")
  }

  private val scd2TemporalOracle: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
      |           FROM events),
      |c AS (SELECT *, lag(event_type) OVER (
      |        PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
      |      FROM e),
      |ch AS (SELECT user_id, event_type, ts_ms, event_id FROM c
      |       WHERE prev IS DISTINCT FROM event_type),
      |v AS (SELECT user_id,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts_ms, event_id) AS version,
      |        event_type AS state, ts_ms AS valid_from_ms,
      |        lead(ts_ms) OVER (PARTITION BY user_id
      |          ORDER BY ts_ms, event_id) AS valid_to_ms
      |      FROM ch),
      |p AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
      |      WHERE event_type = 'purchase' AND user_id IS NOT NULL)
      |SELECT p.event_id, p.user_id, p.ts_ms, v.state,
      |       CAST(v.version AS BIGINT) AS version
      |FROM p JOIN v ON v.user_id = p.user_id
      | AND v.valid_from_ms <= p.ts_ms
      | AND (v.valid_to_ms IS NULL OR p.ts_ms < v.valid_to_ms)
      |ORDER BY event_id""".stripMargin

  /** k-anonymity audit over quasi-identifiers (segment, nation,
    * account-balance band): the equivalence-class sizes that decide
    * whether a training-data release re-identifies — classes below k
    * must be suppressed or generalized. One hash aggregate at any scale;
    * the banding (integer floor division) is the generalization step. */
  private def kAnonymity(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / lit(1000)).cast("long").as("acctbal_band"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"), col("acctbal_band"))
      .agg(count(lit(1)).as("class_size"))
      .withColumn("meets_k", col("class_size") >= lit(5L))
      .orderBy("c_mktsegment", "c_nationkey", "acctbal_band")

  private val kAnonymityOracle: String =
    """SELECT c_mktsegment, c_nationkey,
      |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_band,
      |  CAST(COUNT(*) AS BIGINT) AS class_size,
      |  COUNT(*) >= 5 AS meets_k
      |FROM customer
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** l-diversity — k-anonymity's necessary companion: a class can be
    * large (k-anonymous) yet reveal everyone's sensitive value if that
    * value is uniform within it. Quasi-identifiers here are (segment,
    * balance band); the sensitive attribute is nationality; a class
    * passes at l ≥ 3 distinct values. Same single hash-aggregate shape
    * as the k-audit. */
  private def lDiversity(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "customer")
      .select(col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000)).cast("long").as("acctbal_band"),
        col("c_nationkey"))
      .groupBy(col("c_mktsegment"), col("acctbal_band"))
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col("c_nationkey")).as("l_distinct"))
      .withColumn("meets_l", col("l_distinct") >= lit(3L))
      .orderBy("c_mktsegment", "acctbal_band")

  private val lDiversityOracle: String =
    """SELECT c_mktsegment,
      |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_band,
      |  CAST(COUNT(*) AS BIGINT) AS class_size,
      |  COUNT(DISTINCT c_nationkey) AS l_distinct,
      |  COUNT(DISTINCT c_nationkey) >= 3 AS meets_l
      |FROM customer
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** 7-day rolling DISTINCT actives per event type — the window
    * COUNT(DISTINCT) SQL forbids: composed as per-day distinct sets
    * (one hash agg — the big shrink), then a days-window flatten →
    * distinct → size over the tiny (type × day) grid. At fixture scale
    * the exact set union is fine; at 100 TB of users/day the same query
    * swaps collect_set for HLL sketches with identical shape
    * (`a_hll_merge_daily` is that path, oracle-checked) — this query
    * pins the EXACT twin. The oracle counts distinct via a day-range
    * self-join, a totally different formulation. */
  private def rollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val daily = Sources.table(s, dir, "events")
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01")).as("day"))
      .agg(collect_set(col("user_id")).as("users"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-6, 0)
    daily
      .withColumn("win_users",
        size(array_distinct(flatten(collect_list(col("users")).over(w))))
          .cast("long"))
      .select(col("event_type"), col("day").cast("long").as("day"),
        col("win_users").as("actives_7d"))
      .orderBy("event_type", "day")
  }

  private val rollingDistinctOracle: String =
    """WITH d AS (SELECT DISTINCT event_type,
      |    (CAST(ts AS DATE) - DATE '1970-01-01') AS day, user_id
      |  FROM events WHERE user_id IS NOT NULL),
      |days AS (SELECT DISTINCT event_type, day FROM d)
      |SELECT days.event_type, CAST(days.day AS BIGINT) AS day,
      |  CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS actives_7d
      |FROM days JOIN d
      |  ON d.event_type = days.event_type
      | AND d.day BETWEEN days.day - 6 AND days.day
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("w_rolling_distinct", rollingDistinct,
      Some(rollingDistinctOracle)),
    QueryDef("etl_scd2_build", scd2Build, Some(scd2Oracle)),
    QueryDef("j_scd2_temporal", scd2Temporal, Some(scd2TemporalOracle)),
    QueryDef("f_k_anonymity", kAnonymity, Some(kAnonymityOracle)),
    QueryDef("f_l_diversity", lDiversity, Some(lDiversityOracle)),
    QueryDef("a_cohort_retention", cohortRetention, Some(cohortOracle)),
    QueryDef("j_full_outer", fullOuterReconcile, Some(fullOuterOracle)),
    QueryDef("w_rolling_7d", rolling7d, Some(rolling7dOracle)),
  )
}
