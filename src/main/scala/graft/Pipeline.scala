package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl._
import graft.io.{Sinks, Sources}
import graft.model.Schemas

/** The reference pipeline end-to-end (SURVEY §3.1), as driver code.
  *
  * Airflow task graph (reference: dags/music_streaming_services_dag.py:447-455):
  * probe S3 → extract+combine streams → extract users/songs → validate
  * columns → transform/compute KPIs → DDL → stage to S3 → COPY to Redshift.
  * Tasks there are separate OS processes exchanging whole datasets through
  * CSV files + XCom paths; here stages 2-5 are ONE lazy DataFrame DAG (a
  * single Spark job per output), and the load steps are `df.write`.
  * Control flow (empty-input stop, missing-column stop) stays driver-side
  * Scala, mirroring the DAG's branch operators.
  *
  * 100 TB posture: the stream scan is a distributed multi-file read (never
  * driver-concatenated), the dimension join broadcasts, KPI outputs are
  * partitioned by date so daily re-runs overwrite only their partition
  * (fixes the reference's append-duplicates bug, SURVEY §2.11-2).
  */
object Pipeline {

  sealed trait Outcome
  case object NoStreams extends Outcome
  final case class InvalidColumns(errs: Seq[Validate.MissingColumns])
      extends Outcome
  final case class Completed(genreKpis: DataFrame, hourlyKpis: DataFrame)
      extends Outcome

  /** Transform stage: raw streams/users/songs frames → the two KPI tables.
    * Pure `DataFrame => DataFrame` composition; no side effects. */
  def transform(streams: DataFrame, songs: DataFrame): Completed = {
    val coerced = Enrich.withDateHour(
      Enrich.coerceTimestamp(streams, "listen_time", "listen_ts"), "listen_ts")
    val enriched = Enrich.leftEnrich(
      coerced,
      songs.select("track_id", "artists", "track_name", "popularity",
        "duration_ms", "track_genre"),
      "track_id")
    Completed(
      GenreKpis.compute(enriched, GenreKpis.Cols()),
      HourlyKpis.compute(enriched, HourlyKpis.Cols()))
  }

  /** Full run against CSV inputs, KPI parquet out. Returns what the DAG's
    * branch operators would have decided. */
  def run(spark: SparkSession, streamsGlob: String, usersCsv: String,
          songsCsv: String, outDir: String): Outcome = {
    // S1 — probe (BranchPythonOperator: stop the run when no batches landed).
    if (!Sources.inputExists(spark, streamsGlob)) return NoStreams

    // S2-S4 — extract with the files' own headers (so validation is real).
    val streamsRaw = Sources.csvRaw(spark, streamsGlob)
    val usersRaw = Sources.csvRaw(spark, usersCsv)
    val songsRaw = Sources.csvRaw(spark, songsCsv)

    // F1 — validate required columns; stop (don't swallow) on failure.
    val errs = Seq(
      Validate.requiredColumns("streams", streamsRaw, Schemas.requiredStreamCols),
      Validate.requiredColumns("users", usersRaw, Schemas.requiredUserCols),
      Validate.requiredColumns("songs", songsRaw, Schemas.requiredSongCols),
    ).collect { case Left(e) => e }
    if (errs.nonEmpty) return InvalidColumns(errs)

    // Conform to declared schemas by name, then transform + load
    // (idempotent overwrite by date partition).
    val streams = Sources.conform(streamsRaw, Schemas.streams)
    val songs = Validate.fillUnknown(Sources.conform(songsRaw, Schemas.songs))
    val out = transform(streams, songs)
    Sinks.parquet(out.genreKpis, s"$outDir/genre_kpis", Seq("date"))
    Sinks.parquet(out.hourlyKpis, s"$outDir/hourly_kpis", Seq("date"))
    out
  }
}
