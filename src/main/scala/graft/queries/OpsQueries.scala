package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.ops.Joins

/** Temporal/range join operators (graft.ops.Joins), oracle-checked against
  * DuckDB's native formulations — ASOF JOIN for the as-of operator, a plain
  * inequality join for the bucketed range join (the bucketing is a physical
  * rewrite; the oracle IS the logical spec).
  */
object OpsQueries extends QueryGroup {

  /** As-of self-enrichment: for every order, the customer's most recent
    * PRIOR order (strictly earlier date) — the "latest snapshot before t"
    * shape. Right side pre-aggregates to one row per (custkey, date) so the
    * as-of match is unique; ties inside a date resolve to max orderkey. */
  private def asofPrevOrder(s: SparkSession, dir: String): DataFrame = {
    val o = Sources.table(s, dir, "orders")
    val left = o.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderdate").cast("date").as("d"))
    val right = o.groupBy(col("o_custkey"),
        col("o_orderdate").cast("date").as("prev_order_date"))
      .agg(max(col("o_orderkey")).as("prev_order_key"))
    Joins.asofJoin(left, right, Seq("o_custkey"),
        leftTime = "d", rightTime = "prev_order_date", strict = true)
      .select(col("o_orderkey"),
        col("prev_order_date").cast("string").as("prev_order_date"),
        col("prev_order_key"))
      .orderBy("o_orderkey")
  }

  private val asofPrevOrderOracle: String =
    """WITH r AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS prev_order_date,
      |                  MAX(o_orderkey) AS prev_order_key
      |           FROM orders GROUP BY 1, 2),
      |l AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d
      |      FROM orders)
      |SELECT l.o_orderkey,
      |       CAST(r.prev_order_date AS VARCHAR) AS prev_order_date,
      |       r.prev_order_key
      |FROM l ASOF LEFT JOIN r
      |  ON l.o_custkey = r.o_custkey AND l.d > r.prev_order_date
      |ORDER BY l.o_orderkey""".stripMargin

  /** Forward as-of: for each order, the customer's NEXT order at-or-after
    * the same date (inclusive — a same-day order matches). DuckDB's ASOF
    * is backward-only, so the oracle negates the time axis (max(-t) ≤ -t₀
    * ⇔ min(t) ≥ t₀) — an exact reduction, not an approximation. */
  private def asofNextOrder(s: SparkSession, dir: String): DataFrame = {
    val o = Sources.table(s, dir, "orders")
    val left = o.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderdate").cast("date").as("d"))
    val right = o.groupBy(col("o_custkey"),
        col("o_orderdate").cast("date").as("next_order_date"))
      .agg(max(col("o_orderkey")).as("next_order_key"))
    Joins.asofJoinForward(left, right, Seq("o_custkey"),
        leftTime = "d", rightTime = "next_order_date")
      .select(col("o_orderkey"),
        col("next_order_date").cast("string").as("next_order_date"),
        col("next_order_key"))
      .orderBy("o_orderkey")
  }

  private val asofNextOrderOracle: String =
    """WITH r AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS next_order_date,
      |                  MAX(o_orderkey) AS next_order_key
      |           FROM orders GROUP BY 1, 2),
      |rn AS (SELECT o_custkey, next_order_date, next_order_key,
      |              -(next_order_date - DATE '1970-01-01') AS nd FROM r),
      |l AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
      |             -(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS nd
      |      FROM orders)
      |SELECT l.o_orderkey,
      |       CAST(rn.next_order_date AS VARCHAR) AS next_order_date,
      |       rn.next_order_key
      |FROM l ASOF LEFT JOIN rn
      |  ON l.o_custkey = rn.o_custkey AND l.nd >= rn.nd
      |ORDER BY l.o_orderkey""".stripMargin

  /** Keyed range join: line items shipped within 90 days of their order's
    * date, counted per order. Point/interval domain = epoch days. */
  private def rangeShipWindow(s: SparkSession, dir: String): DataFrame = {
    val points = Sources.table(s, dir, "lineitem")
      .select(col("l_orderkey"),
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01"))
          .cast("long").as("p"))
    val intervals = Sources.table(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
          .cast("long").as("lo"))
      .withColumn("hi", col("lo") + lit(90L))
    Joins.rangeJoinBucketed(points, intervals, "p", "lo", "hi",
        bucketWidth = 64, keys = Seq("l_orderkey"))
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("n_in_window"))
      .orderBy("o_orderkey")
  }

  private val rangeShipWindowOracle: String =
    """SELECT o.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_in_window
      |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      | AND CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
      | AND CAST(l.l_shipdate AS DATE) <= CAST(o.o_orderdate AS DATE) + 90
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Keyless range join: parts whose price falls inside each brand's
    * [min, max] price band — bands overlap, so one part matches several
    * brands; the bucketed rewrite avoids the cross join a naive plan needs
    * when the interval side is too large to broadcast. */
  private def rangePriceBands(s: SparkSession, dir: String): DataFrame = {
    val part = Sources.table(s, dir, "part")
    val points = part.select(col("p_partkey"), col("p_retailprice").as("p"))
    val bands = part.groupBy(col("p_brand"))
      .agg(min(col("p_retailprice")).as("lo"),
        max(col("p_retailprice")).as("hi"))
    Joins.rangeJoinBucketed(points, bands, "p", "lo", "hi", bucketWidth = 100)
      .groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("p_partkey")
  }

  private val rangePriceBandsOracle: String =
    """WITH b AS (SELECT p_brand, MIN(p_retailprice) AS lo,
      |                  MAX(p_retailprice) AS hi
      |           FROM part GROUP BY 1)
      |SELECT p.p_partkey, CAST(COUNT(*) AS BIGINT) AS n_bands
      |FROM part p JOIN b ON p.p_retailprice >= b.lo AND p.p_retailprice <= b.hi
      |GROUP BY 1 ORDER BY 1""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("j_asof_prev_order", asofPrevOrder, Some(asofPrevOrderOracle)),
    QueryDef("j_asof_next_order", asofNextOrder, Some(asofNextOrderOracle)),
    QueryDef("j_range_ship_window", rangeShipWindow,
      Some(rangeShipWindowOracle)),
    QueryDef("j_range_price_bands", rangePriceBands,
      Some(rangePriceBandsOracle)),
  )
}
