package graft.etl

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class KpisSpec extends SparkSpec {
  import spark.implicits._

  // (date, genre, track, duration, popularity, track_id, user, artist, hour)
  private def enriched(rows: Seq[(String, String, String, Integer, Integer,
      String, java.lang.Long, String, Integer)]): DataFrame =
    rows.toDF("d", "track_genre", "track_name", "duration_ms", "popularity",
        "track_id", "user_id", "artists", "hour")
      .withColumn("date", org.apache.spark.sql.functions.to_date($"d"))
      .drop("d")

  private val base = Seq(
    ("2024-06-25", "rock", "A", Integer.valueOf(100), Integer.valueOf(50),
      "t1", java.lang.Long.valueOf(1L), "X", Integer.valueOf(10)),
    ("2024-06-25", "rock", "B", Integer.valueOf(200), Integer.valueOf(70),
      "t2", java.lang.Long.valueOf(2L), "Y", Integer.valueOf(10)),
    ("2024-06-25", "rock", "C", Integer.valueOf(300), Integer.valueOf(70),
      "t3", java.lang.Long.valueOf(1L), "Y", Integer.valueOf(11)),
    ("2024-06-25", null, "D", Integer.valueOf(400), Integer.valueOf(99),
      "t4", java.lang.Long.valueOf(3L), "Z", Integer.valueOf(10)),
  )

  test("genre KPIs: counts/means over non-null genre keys only (A1-A3, F4)") {
    val out = GenreKpis.compute(enriched(base)).collect()
    assert(out.length == 1) // null genre dropped
    val r = out.head
    assert(r.getAs[Long]("listen_count") == 3)
    assert(r.getAs[Double]("avg_duration_ms") == 200.0)
    assert(math.abs(r.getAs[Double]("popularity_index") - 190.0 / 3) < 1e-12)
  }

  test("genre KPIs: popularity tie broken by track name then id (W1)") {
    val r = GenreKpis.compute(enriched(base)).head()
    // B and C tie at popularity 70 → 'B' wins alphabetically.
    assert(r.getAs[String]("most_popular_track") == "B")
    assert(r.getAs[Double]("most_popular_track_popularity") == 70.0)
  }

  test("genre KPIs: all-null popularity group doesn't crash (A4 corner)") {
    val rows = Seq(
      ("2024-06-25", "jazz", "J2", Integer.valueOf(10), null.asInstanceOf[Integer],
        "t9", java.lang.Long.valueOf(1L), "W", Integer.valueOf(1)),
      ("2024-06-25", "jazz", "J1", Integer.valueOf(20), null.asInstanceOf[Integer],
        "t8", java.lang.Long.valueOf(2L), "W", Integer.valueOf(2)))
    val r = GenreKpis.compute(enriched(rows)).head()
    assert(r.getAs[String]("most_popular_track") == "J1") // name tie-break
    assert(r.get(r.fieldIndex("most_popular_track_popularity")) == null)
    assert(r.get(r.fieldIndex("popularity_index")) == null) // mean of nothing
  }

  test("hourly KPIs: exact multi-distinct + diversity ratio (A5-A7, P3)") {
    val out = HourlyKpis.aggregate(enriched(base))
      .where($"hour" === 10).head()
    assert(out.getAs[Long]("unique_listeners") == 3) // users 1,2,3
    assert(out.getAs[Long]("total_plays") == 3)      // t1,t2,t4
    assert(out.getAs[Long]("unique_tracks") == 3)
    assert(out.getAs[Double]("track_diversity_index") == 1.0)
  }

  test("hourly KPIs: top artist ties pinned by name, input-order invariant (W2)") {
    val forward = HourlyKpis.compute(enriched(base))
    val shuffled = HourlyKpis.compute(enriched(base.reverse))
    val f = forward.where($"hour" === 10).head()
    // X and Y each have 1 play in hour 10 (null-genre row's artist Z too) —
    // ties resolve alphabetically regardless of input order.
    assert(f.getAs[String]("top_artist") ==
      shuffled.where($"hour" === 10).head().getAs[String]("top_artist"))
  }

  test("hourly KPIs keep plays whose dim attributes are null (left-join miss)") {
    val out = HourlyKpis.aggregate(enriched(base)).where($"hour" === 10).head()
    // row D has null genre but still counts toward hourly plays
    assert(out.getAs[Long]("total_plays") == 3)
  }
}
