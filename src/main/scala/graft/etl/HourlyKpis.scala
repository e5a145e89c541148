package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily hour-level KPIs (SURVEY §2.5 A5-A8, §2.2 P3, §2.6 W2, §2.4 J3).
  *
  * Reference computes, per (date, hour): unique_listeners (nunique user),
  * total_plays, unique_tracks, track_diversity_index = unique_tracks /
  * total_plays, and top_artist = argmax play-count
  * (reference: dags/music_streaming_services_dag.py:204-233).
  *
  * Scale notes: unique_listeners/unique_tracks use EXACT countDistinct — the
  * oracle is exact; Spark plans the two distincts in one aggregate via Expand.
  * The reference's top-artist tie-break relies on pandas' unstable quicksort
  * (nondeterministic; SURVEY §2.6 W2) — we pin ties by play_count DESC then
  * artist name ASC. The artist ranking aggregates (date, hour, artist) FIRST —
  * at 100 TB the window never sees raw plays, only per-artist counts, and that
  * pre-aggregation gets map-side partial combine for free.
  */
object HourlyKpis {

  case class Cols(date: String = "date", hour: String = "hour",
                  user: String = "user_id", track: String = "track_id",
                  artist: String = "artists")

  /** A5-A7 + P3 — the per-hour aggregate. */
  def aggregate(enriched: DataFrame, c: Cols = Cols()): DataFrame =
    Enrich.dropNullKeys(enriched, c.date)
      .groupBy(col(c.date), col(c.hour))
      .agg(
        countDistinct(col(c.user)).as("unique_listeners"),     // A5
        count(col(c.track)).as("total_plays"),                 // A6
        countDistinct(col(c.track)).as("unique_tracks"))       // A7
      .withColumn("track_diversity_index",                     // P3
        col("unique_tracks").cast("double") / col("total_plays").cast("double"))

  /** A8 — play counts per (date, hour, artist); feeds W2. */
  def playCounts(enriched: DataFrame, c: Cols = Cols()): DataFrame =
    Enrich.dropNullKeys(enriched, c.date, c.artist)
      .groupBy(col(c.date), col(c.hour), col(c.artist))
      .agg(count(col(c.track)).as("play_count"))

  /** W2 / O2 — top artist per (date, hour) with deterministic tie-break. */
  def topArtist(enriched: DataFrame, c: Cols = Cols()): DataFrame = {
    val w = Window.partitionBy(col(c.date), col(c.hour))
      .orderBy(col("play_count").desc, col(c.artist).asc)
    playCounts(enriched, c)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(c.date), col(c.hour), col(c.artist).as("top_artist"))
  }

  /** J3 — hourly aggregate LEFT JOIN top-artist on (date, hour)
    * (reference: dags/music_streaming_services_dag.py:225-230), then the P1
    * final projection (:233). Both sides are already tiny post-aggregation
    * (days × 24 rows), so join cost is irrelevant; keys are unique → 1:1.
    *
    * This reference-parity formulation scans the fact table TWICE (once per
    * branch). [[computeFused]] is the preferred single-scan plan. */
  def compute(enriched: DataFrame, c: Cols = Cols()): DataFrame =
    aggregate(enriched, c)
      .join(topArtist(enriched, c), Seq(c.date, c.hour), "left")
      .select(col(c.date), col(c.hour), col("unique_listeners"),
        col("top_artist"), col("track_diversity_index"))

  /** Single-scan formulation of [[compute]] — identical results, one fact
    * scan. Both branches consume ONE shared pre-aggregation at the finest
    * grain either needs, (date, hour, artist, user, track):
    *
    *  - the physical plans of the two branches then contain the SAME
    *    partial-aggregate → exchange subtree, which Spark's exchange reuse
    *    turns into one executed stage (asserted as ReusedExchange /
    *    single-scan in PlanSpec) — the fact table is read and shuffled once;
    *  - map-side partial combine collapses repeat (user, track) plays before
    *    the only wide exchange, so at 100 TB the shuffle moves at most one
    *    row per distinct key combination, not one per event;
    *  - downstream aggregations (the two distincts via Expand, the artist
    *    ranking) run over the pre-aggregated rows — strictly smaller input
    *    than the raw scan the join formulation feeds them.
    *
    * Null-artist handling differs mechanically from [[topArtist]] but not
    * observably: instead of filtering null artists before ranking (a filter
    * that Catalyst would push below the shared subtree, splitting it), null
    * artists sort LAST in the rank window, so rank 1 is the best non-null
    * artist, and a group with only null artists yields a null top_artist —
    * exactly what the parity join's miss produces. */
  def computeFused(enriched: DataFrame, c: Cols = Cols()): DataFrame = {
    // hour is dropped alongside date even though it is semantically implied
    // (hour derives from the same timestamp): the final left join infers an
    // IsNotNull(hour) constraint on the top-artist branch only, and without
    // the explicit symmetric filter the two l1 subtrees would no longer be
    // identical — which is what lets AQE execute the shared stage once.
    val l1 = Enrich.dropNullKeys(enriched, c.date, c.hour)
      .groupBy(col(c.date), col(c.hour), col(c.artist), col(c.user),
        col(c.track))
      .agg(count(col(c.track)).as("track_rows"))

    val agg = l1.groupBy(col(c.date), col(c.hour))
      .agg(
        countDistinct(col(c.user)).as("unique_listeners"),
        sum(col("track_rows")).as("total_plays"),
        countDistinct(col(c.track)).as("unique_tracks"))
      .withColumn("track_diversity_index",
        col("unique_tracks").cast("double") /
          col("total_plays").cast("double"))

    val w = Window.partitionBy(col(c.date), col(c.hour))
      .orderBy(col(c.artist).isNull.asc, col("play_count").desc,
        col(c.artist).asc)
    val top = l1.groupBy(col(c.date), col(c.hour), col(c.artist))
      .agg(sum(col("track_rows")).as("play_count"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(c.date), col(c.hour), col(c.artist).as("top_artist"))

    agg.join(top, Seq(c.date, c.hour), "left")
      .select(col(c.date), col(c.hour), col("unique_listeners"),
        col("top_artist"), col("track_diversity_index"))
  }
}
