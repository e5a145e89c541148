package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale notes: the fact table is never shuffled — A1-A3 and the argmax's
  * `max(popularity)` run in one CODEGEN hash aggregate with map-side
  * partials (the exchange carries at most |date×genre| rows per input
  * partition), and the argmax tie-break resolves against a broadcast of
  * the per-group maxima over a second pruned scan (see [[tieKey]] for the
  * full design, including why a one-pass min-over-struct was rejected).
  * pandas `idxmax` takes the first row on ties and raises when a group is
  * all-null; the tie-break pins ties deterministically (popularity DESC
  * NULLS LAST, then track name, then a unique id) and yields a
  * null-popularity row for all-null groups instead of crashing
  * (SURVEY §2.11-4).
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
                mean: Mean = defaultMean): DataFrame = {
    val aggs = aggExprs(c, mean)
    Enrich.dropNullKeys(enriched, c.genre, c.date)
      .groupBy(col(c.date), col(c.genre))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The A4/W1 argmax as a MAX-THEN-TIEBREAK, never a fact-table window.
    *
    * Semantics to reproduce: the row `ROW_NUMBER() OVER (PARTITION BY
    * date, genre ORDER BY popularity DESC NULLS LAST, track ASC NULLS
    * LAST, rowId ASC) = 1`. The classic window formulation shuffles EVERY
    * enriched row into a per-group sort; a one-pass `min(orderable
    * struct)` alternative was measured and rejected — Spark plans min/max
    * over var-length buffers (structs, strings) as SortAggregate, which
    * drags the whole aggregate (decimal sums included) out of hash mode
    * and per-partition-sorts the fact stream anyway (100M-row corpus:
    * window 19.4 s warm, min-struct SortAggregate 16.6 s warm / 89 s
    * cold). This two-stage shape keeps every heavy operator codegen'd:
    *
    *  1. `max(popularity)` rides the SAME fully-codegen hash aggregate as
    *     A1-A3 (primitive buffer, map-side partials — the exchange carries
    *     at most |date×genre| rows per input partition);
    *  2. a second scan joins the BROADCAST per-group maxima with a
    *     null-safe match on popularity (`<=>` routes all-null groups to
    *     their null max), so ONLY max-tied rows survive the join — the
    *     (track ASC NULLS LAST, rowId ASC) tie-break then runs as a
    *     `min(struct)` over those few rows, where the SortAggregate
    *     fallback is immaterial.
    *
    * At 100 TB: two pruned column scans + a |groups|-row broadcast beat
    * one full-fact shuffle-and-sort by the width of the fact table; in
    * the bench the second scan reads the warmShared cache. rowId must be
    * unique (it is the table's key) for the tie-break to be total. The
    * broadcast presumes group grain ≪ fact grain (days × genres — KBs
    * even at 100 TB); for a pathologically high-cardinality group column
    * pass `hintBroadcast = false` and AQE plans the same join from the
    * measured maxima size (broadcast only if it actually fits, else a
    * shuffle join on the group keys — still never sorting the fact). The
    * explicit hint would OVERRIDE that size check and force a driver-side
    * build, so it must be droppable, not just documented. */
  private def tieKey(c: Cols): Column = struct(
    when(col(c.track).isNull, 1).otherwise(0).as("tn"),
    coalesce(col(c.track), lit("")).as("tv"),
    col(c.rowId).as("rid"),
    col(c.track).as("track"),
    col(c.popularity).cast("double").as("pop"))

  private def argmaxOfMax(f: DataFrame, maxes: DataFrame, c: Cols,
                          hintBroadcast: Boolean = true): DataFrame = {
    val m0 = maxes.select(col(c.date).as("_md"), col(c.genre).as("_mg"),
      col("max_pop"))
    val m = if (hintBroadcast) broadcast(m0) else m0
    // max and match on the popularity column's NATIVE type: casting both
    // sides to double here would merge values a long/high-precision
    // decimal column keeps distinct (2^53 and 2^53+1) and could crown a
    // non-max row; the double cast belongs only to the OUTPUT column
    f.join(m,
        col(c.date) === col("_md") && col(c.genre) === col("_mg") &&
          col(c.popularity) <=> col("max_pop"))
      .groupBy(col(c.date), col(c.genre))
      .agg(min(tieKey(c)).as("arg"))
      .select(col(c.date), col(c.genre),
        col("arg.track").as("most_popular_track"),
        col("arg.pop").as("most_popular_track_popularity"))
  }

  /** A4/W1 — most popular track per (date, genre), deterministic tie-break
    * (see [[tieKey]] for why this is max-then-tiebreak, not a window). */
  def mostPopularTrack(enriched: DataFrame, c: Cols = Cols(),
                       hintBroadcast: Boolean = true): DataFrame = {
    val f = Enrich.dropNullKeys(enriched, c.genre, c.date)
    val maxes = f.groupBy(col(c.date), col(c.genre))
      .agg(max(col(c.popularity)).as("max_pop"))
    argmaxOfMax(f, maxes, c, hintBroadcast)
  }

  /** Fused formulation: A1-A3 and the argmax's max stage in ONE codegen
    * hash aggregate; the tie-break resolves against the broadcast maxima
    * (see [[tieKey]]). Preferred plan — the J2 join below exists for
    * operator parity. */
  def compute(enriched: DataFrame, c: Cols = Cols(),
              mean: Mean = defaultMean,
              hintBroadcast: Boolean = true): DataFrame = {
    val f = Enrich.dropNullKeys(enriched, c.genre, c.date)
    val agg = f.groupBy(col(c.date), col(c.genre))
      .agg(
        count(col(c.rowId)).as("listen_count"),
        mean(c.duration).as("avg_duration_ms"),
        mean(c.popularity).as("popularity_index"),
        max(col(c.popularity)).as("max_pop"))
    // inner, provably total: every (date, genre) group has >=1 row whose
    // popularity null-safe-equals the group's max (the max itself, or any
    // null-popularity row when the group is all-null), so the argmax side
    // contains every group key
    agg.join(argmaxOfMax(f, agg, c, hintBroadcast),
        Seq(c.date, c.genre), "inner")
      .select(col(c.date), col(c.genre), col("listen_count"),
        col("avg_duration_ms"), col("popularity_index"),
        col("most_popular_track"), col("most_popular_track_popularity"))
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
