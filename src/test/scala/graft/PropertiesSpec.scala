package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.{GenreKpis, HourlyKpis}
import org.apache.spark.sql.functions._

/** Property tests (SURVEY §5.2-4): invariants that must hold for ANY input.
  * Inputs come from ScalaCheck generators at fixed seeds (a Spark job per
  * case is expensive — five generated tables, each checked for all
  * invariants at once). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val genRows: Gen[List[(String, String, String, Int, Int, String,
      Long, String, Int)]] =
    Gen.listOfN(40, for {
      day <- Gen.oneOf("2024-06-25", "2024-06-26")
      genre <- Gen.oneOf("rock", "pop", "jazz")
      track <- Gen.oneOf("A", "B", "C", "D")
      dur <- Gen.chooseNum(10, 1000)
      pop <- Gen.chooseNum(0, 100)
      user <- Gen.chooseNum(1L, 6L)
      artist <- Gen.oneOf("X", "Y", "Z")
      hour <- Gen.chooseNum(0, 23)
    } yield (day, genre, track, dur, pop, s"t$track", user, artist, hour))

  private def toDf(rows: List[(String, String, String, Int, Int, String,
      Long, String, Int)]) =
    rows.toDF("d", "track_genre", "track_name", "duration_ms",
        "popularity", "track_id", "user_id", "artists", "hour")
      .withColumn("date", to_date($"d")).drop("d")

  test("KPI invariants hold for generated inputs (5 seeds)") {
    (1L to 5L).foreach { seedNo =>
      val rows = genRows.pureApply(Gen.Parameters.default, Seed(seedNo))
      val df = toDf(rows)

      // sum of per-genre listen_count == total non-null-keyed input rows
      val genre = GenreKpis.compute(df).cache()
      val total = genre.agg(sum($"listen_count")).head().getLong(0)
      assert(total == rows.length, s"seed $seedNo listen_count sum")

      // diversity ∈ (0, 1]; distinct counts bounded by plays
      HourlyKpis.aggregate(df).collect().foreach { r =>
        val div = r.getAs[Double]("track_diversity_index")
        assert(div > 0.0 && div <= 1.0, s"seed $seedNo diversity $div")
        assert(r.getAs[Long]("unique_tracks") <= r.getAs[Long]("total_plays"))
        assert(r.getAs[Long]("unique_listeners") <= r.getAs[Long]("total_plays"))
      }

      // top-1 invariance under input permutation (W1 determinism)
      val shuffled = toDf(new scala.util.Random(seedNo).shuffle(rows))
      val a = genre.select("date", "track_genre", "most_popular_track")
        .collect().map(_.toString).sorted.toSeq
      val b = GenreKpis.compute(shuffled)
        .select("date", "track_genre", "most_popular_track")
        .collect().map(_.toString).sorted.toSeq
      assert(a == b, s"seed $seedNo permutation invariance")
    }
  }
}
