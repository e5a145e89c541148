package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas — both for the reference's own domain tables (streams /
  * users / songs, used by the Pipeline and unit tests) and for the driver's
  * synthetic testdata tables.
  *
  * The reference infers every schema with `pd.read_csv`
  * (reference: dags/music_streaming_services_dag.py:101-103,150-152); the only
  * typed declarations are the DDLs (users_to_rds.py:34-40, songs_to_rds.py:49-71,
  * dags/music_streaming_services_dag.py:253-274). We declare schemas explicitly:
  * at 100 TB, schema inference means a full extra pass over the data.
  */
object Schemas {

  // --- Reference domain (SURVEY §1.2) ---

  /** streams: S3 CSV batches. listen_time arrives as a string and is coerced
    * to timestamp with null-on-failure later (Enrich.coerceTimestamp);
    * reference: dags/music_streaming_services_dag.py:155-156. */
  val streams: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("track_id", StringType),
    StructField("listen_time", StringType),
  ))

  /** users: Postgres DDL, reference: users_to_rds.py:34-40. */
  val users: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("user_name", StringType),
    StructField("user_age", IntegerType),
    StructField("user_country", StringType),
    StructField("created_at", DateType),
  ))

  /** songs: MySQL DDL, reference: songs_to_rds.py:49-71. */
  val songs: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("track_id", StringType),
    StructField("artists", StringType),
    StructField("album_name", StringType),
    StructField("track_name", StringType),
    StructField("popularity", IntegerType),
    StructField("duration_ms", IntegerType),
    StructField("explicit", BooleanType),
    StructField("danceability", DoubleType),
    StructField("energy", DoubleType),
    StructField("song_key", IntegerType),
    StructField("loudness", DoubleType),
    StructField("mode", IntegerType),
    StructField("speechiness", DoubleType),
    StructField("acousticness", DoubleType),
    StructField("instrumentalness", DoubleType),
    StructField("liveness", DoubleType),
    StructField("valence", DoubleType),
    StructField("tempo", DoubleType),
    StructField("time_signature", IntegerType),
    StructField("track_genre", StringType),
  ))

  /** Required column sets for the validation branch,
    * reference: dags/music_streaming_services_dag.py:106-112. */
  val requiredStreamCols: Set[String] = Set("user_id", "track_id", "listen_time")
  val requiredUserCols: Set[String] =
    Set("user_id", "user_name", "user_age", "user_country", "created_at")
  val requiredSongCols: Set[String] = songs.fieldNames.toSet - "id"

  /** genre_kpis output, reference: dags/music_streaming_services_dag.py:253-263. */
  val genreKpis: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("track_genre", StringType),
    StructField("listen_count", LongType),
    StructField("avg_duration_ms", DoubleType),
    StructField("popularity_index", DoubleType),
    StructField("most_popular_track", StringType),
    StructField("most_popular_track_popularity", DoubleType),
  ))

  /** hourly_kpis output, reference: dags/music_streaming_services_dag.py:266-273.
    * `hour` is IntegerType here although the reference DDL declares VARCHAR —
    * documented fidelity deviation (SURVEY §1.2). */
  val hourlyKpis: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("hour", IntegerType),
    StructField("unique_listeners", LongType),
    StructField("top_artist", StringType),
    StructField("track_diversity_index", DoubleType),
  ))

  // --- Driver testdata tables (TESTDATA.md / FIXTURES.md §B) ---
  val testdataTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
