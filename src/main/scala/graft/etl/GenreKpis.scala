package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily genre-level KPIs (SURVEY §2.5 A1-A4, §2.6 W1, §2.4 J2).
  *
  * Reference computes, per (date, track_genre):
  * listen_count, avg_duration_ms, popularity_index (avg popularity), and the
  * most popular track (pandas `idxmax` row lookup)
  * (reference: dags/music_streaming_services_dag.py:166-190).
  *
  * Column-name-parameterized so the same operator runs on the reference's
  * streams⟕songs and on the testdata events⟕customer mapping.
  *
  * Scale notes: the whole table is ONE shuffle — the top-1-per-group window and
  * the groupBy aggregate share the (date, genre) hash partitioning, and AQE
  * coalesces post-shuffle partitions. pandas `idxmax` takes the first row on
  * ties and raises when a group is all-null; the window formulation pins ties
  * deterministically (popularity DESC NULLS LAST, then track name, then a
  * unique id) and yields a null-popularity row for all-null groups instead of
  * crashing (SURVEY §2.11-4).
  */
object GenreKpis {

  case class Cols(date: String = "date", genre: String = "track_genre",
                  track: String = "track_name", duration: String = "duration_ms",
                  popularity: String = "popularity", rowId: String = "track_id")

  /** Null-skipping mean. Default is plain `avg`; callers verifying against an
    * external engine pass an exact-decimal mean (sum(decimal)→double / count)
    * so the result is bitwise reproducible regardless of partial-agg order. */
  type Mean = String => Column
  val defaultMean: Mean = c => avg(col(c))

  private def aggExprs(c: Cols, mean: Mean): Seq[Column] = Seq(
    count(col(c.rowId)).as("listen_count"),                    // A1
    mean(c.duration).as("avg_duration_ms"),                    // A2
    mean(c.popularity).as("popularity_index"),                 // A3
  )

  /** A1-A3 aggregate (no top-track columns). */
  def aggregate(enriched: DataFrame, c: Cols = Cols(),
                mean: Mean = defaultMean): DataFrame =
    Enrich.dropNullKeys(enriched, c.genre, c.date)
      .groupBy(col(c.date), col(c.genre))
      .agg(aggExprs(c, mean).head, aggExprs(c, mean).tail: _*)

  /** A4/W1 — most popular track per (date, genre), deterministic tie-break. */
  def mostPopularTrack(enriched: DataFrame, c: Cols = Cols()): DataFrame = {
    val w = Window.partitionBy(col(c.date), col(c.genre))
      .orderBy(col(c.popularity).desc_nulls_last, col(c.track).asc_nulls_last,
        col(c.rowId).asc)
    Enrich.dropNullKeys(enriched, c.genre, c.date)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(c.date), col(c.genre),
        col(c.track).as("most_popular_track"),
        col(c.popularity).cast("double").as("most_popular_track_popularity"))
  }

  /** Fused formulation: aggregate + window over one shuffle of the enriched
    * stream. Preferred plan — the J2 join below exists for operator parity. */
  def compute(enriched: DataFrame, c: Cols = Cols(),
              mean: Mean = defaultMean): DataFrame = {
    val w = Window.partitionBy(col(c.date), col(c.genre))
      .orderBy(col(c.popularity).desc_nulls_last, col(c.track).asc_nulls_last,
        col(c.rowId).asc)
    Enrich.dropNullKeys(enriched, c.genre, c.date)
      .withColumn("rn", row_number().over(w))
      .groupBy(col(c.date), col(c.genre))
      .agg(
        count(col(c.rowId)).as("listen_count"),
        mean(c.duration).as("avg_duration_ms"),
        mean(c.popularity).as("popularity_index"),
        max(when(col("rn") === 1, col(c.track)))
          .as("most_popular_track"),
        max(when(col("rn") === 1, col(c.popularity).cast("double")))
          .as("most_popular_track_popularity"))
  }

  /** J2 — the reference's join formulation: aggregate table LEFT JOIN the
    * top-1 table on (date, genre)
    * (reference: dags/music_streaming_services_dag.py:179-184). The right side
    * is unique per key so the join is 1:1. */
  def computeViaJoin(enriched: DataFrame, c: Cols = Cols(),
                     mean: Mean = defaultMean): DataFrame =
    aggregate(enriched, c, mean).join(
      mostPopularTrack(enriched, c), Seq(c.date, c.genre), "left")
}
