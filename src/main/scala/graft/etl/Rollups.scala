package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's analyst-facing validation queries (SURVEY §3.3, A9/O3;
  * reference: Documentation.pdf §"SQL Queries for Validating KPIs") as
  * `spark.sql` over temp views of the two KPI outputs — the reference's third
  * entry point is interactive SQL against Redshift, so these run through the
  * SQL surface, not the DataFrame API.
  *
  * Averages over double-valued KPI columns go through DECIMAL(28,10) so the
  * result is independent of partial-aggregation order, then round to 6 dp:
  * once the decimal sum exceeds ~16 significant digits, DECIMAL→DOUBLE
  * conversion differs by 1 ulp between engines (DuckDB computes int128/10^s
  * in floating point — two roundings; the JVM converts exactly), and the
  * rounding absorbs it. Found by the sf0.1 differential run.
  */
object Rollups {

  /** Same SELECT text runs in Spark SQL (on temp views) and in DuckDB (on
    * CTE-defined relations of the same names). */
  val sql: Map[String, String] = Map(
    "rollup_1a_listen_count_by_genre" ->
      """SELECT track_genre,
        |       CAST(SUM(listen_count) AS BIGINT) AS total_listen_count
        |FROM genre_kpis GROUP BY track_genre
        |ORDER BY total_listen_count DESC, track_genre""".stripMargin,
    "rollup_1b_avg_duration_by_genre" ->
      """SELECT track_genre,
        |       round(CAST(SUM(CAST(avg_duration_ms AS DECIMAL(28,10)))
        |         AS DOUBLE) / COUNT(avg_duration_ms), 6)
        |         AS avg_listening_duration
        |FROM genre_kpis GROUP BY track_genre
        |ORDER BY avg_listening_duration DESC, track_genre""".stripMargin,
    "rollup_1c_avg_popularity_by_genre" ->
      """SELECT track_genre,
        |       round(CAST(SUM(CAST(popularity_index AS DECIMAL(28,10)))
        |         AS DOUBLE) / COUNT(popularity_index), 6) AS avg_popularity
        |FROM genre_kpis GROUP BY track_genre
        |ORDER BY avg_popularity DESC, track_genre""".stripMargin,
    "rollup_1d_most_popular_track_per_day" ->
      """SELECT date, track_genre, most_popular_track,
        |       most_popular_track_popularity
        |FROM genre_kpis ORDER BY date, track_genre""".stripMargin,
    "rollup_2a_listeners_by_hour" ->
      """SELECT date, hour,
        |       CAST(SUM(unique_listeners) AS BIGINT) AS total_unique_listeners
        |FROM hourly_kpis GROUP BY date, hour ORDER BY date, hour""".stripMargin,
    "rollup_2b_top_artist_by_hour" ->
      """SELECT date, hour, top_artist
        |FROM hourly_kpis ORDER BY date, hour""".stripMargin,
    "rollup_2c_diversity_by_hour" ->
      """SELECT date, hour,
        |       round(CAST(SUM(CAST(track_diversity_index AS DECIMAL(28,10)))
        |         AS DOUBLE) / COUNT(track_diversity_index), 6)
        |         AS avg_diversity
        |FROM hourly_kpis GROUP BY date, hour ORDER BY date, hour""".stripMargin,
  )

  /** Register the KPI outputs and run one validation query by name. */
  def run(spark: SparkSession, name: String,
          genreKpis: DataFrame, hourlyKpis: DataFrame): DataFrame = {
    genreKpis.createOrReplaceTempView("genre_kpis")
    hourlyKpis.createOrReplaceTempView("hourly_kpis")
    spark.sql(sql(name))
  }
}
