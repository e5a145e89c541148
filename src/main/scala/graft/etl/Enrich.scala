package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-enrichment primitives (SURVEY §2.2 P4/P5, §2.4 J1, §2.3 F4).
  * Domain-agnostic: the same functions serve the reference's streams⟕songs
  * shape and the testdata events⟕customer shape.
  */
object Enrich {

  /** The high-balance customer dimension in its reference mapping
    * (songs/users stand-in, SURVEY §5.2): c_acctbal > 5000, keyed by
    * user_id. Shared by every query/stream that joins the dimension —
    * callers project what they need; column pruning drops the rest.
    * Lives here (not in the query layer) so streaming and operator code
    * can use it without depending on the query registry. */
  def dimUsers(s: SparkSession, dir: String): DataFrame =
    graft.io.Sources.table(s, dir, "customer")
      .filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("user_id"), col("c_name"),
        col("c_mktsegment"), col("c_acctbal"))

  /** P4 — coerce a string column to timestamp, null on unparseable values.
    * The reference uses `pd.to_datetime(..., errors="coerce")`
    * (reference: dags/music_streaming_services_dag.py:155-156); the Spark
    * equivalent is `try_to_timestamp`, NOT an ANSI failing cast. */
  def coerceTimestamp(df: DataFrame, src: String, dst: String): DataFrame =
    df.withColumn(dst, try_to_timestamp(col(src)))

  /** P5 — derive event date and hour-of-day from a timestamp column
    * (reference: dags/music_streaming_services_dag.py:162-163). */
  def withDateHour(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("date", to_date(col(tsCol)))
      .withColumn("hour", hour(col(tsCol)))

  /** J1 — enrich the fact stream with dimension attributes via a LEFT OUTER
    * equi-join (reference: dags/music_streaming_services_dag.py:159).
    * The dimension (songs: ~100k rows; here: customer) is orders of magnitude
    * smaller than the 100 TB fact side, so we broadcast it — no shuffle of the
    * fact table at all. If the dim ever outgrows broadcast, drop the hint and
    * let AQE decide (sort-merge with shuffle on the key). */
  def leftEnrich(facts: DataFrame, dim: DataFrame, key: String,
                 broadcastDim: Boolean = true): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    facts.join(d, Seq(key), "left")
  }

  /** F4 — pandas groupby silently drops null-keyed rows (dropna=True); Spark
    * groupBy keeps them. Filtering null keys explicitly BEFORE aggregating is
    * required for parity (reference behavior at
    * dags/music_streaming_services_dag.py:166,173,204,215; SURVEY §1.3).
    * Also a scan-level win: the IsNotNull predicate pushes into the source. */
  def dropNullKeys(df: DataFrame, keys: String*): DataFrame =
    keys.foldLeft(df)((d, k) => d.filter(col(k).isNotNull))
}
