package graft.etl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generated-data parity for the max-then-tiebreak argmax (GenreKpis):
  * for ANY input — popularity ties across tracks, null popularity, null
  * tracks, all-null groups, single-row groups — compute/mostPopularTrack
  * must return exactly the row the replaced ROW_NUMBER window formulation
  * selects. The fixture oracles (genre_kpis, w1, a4) cover one data
  * shape; this pins the semantics on adversarial corpora where ties and
  * nulls are DENSE (popularity drawn from 4 values, tracks from 6, 15%
  * null popularity, 10% null track). */
case class ArgmaxRow(id: Long, date: String, genre: String,
                     track: Option[String], dur: Option[Double],
                     pop: Option[Double])

class ArgmaxPropertiesSpec extends SparkSpec {
  import spark.implicits._
  private type R = ArgmaxRow
  private val R = ArgmaxRow

  private val genRow: Gen[(String, String, Option[String], Option[Double],
      Option[Double])] =
    for {
      date <- Gen.oneOf("2024-01-01", "2024-01-02")
      genre <- Gen.oneOf("g1", "g2", "g3")
      track <- Gen.frequency(9 -> Gen.oneOf("a", "b", "c", "d", "e", "f")
        .map(Option(_)), 1 -> Gen.const(None))
      dur <- Gen.oneOf(Some(1.0), Some(2.5), None)
      // 4 distinct popularity values → dense cross-track ties
      pop <- Gen.frequency(17 -> Gen.oneOf(1.0, 2.0, 3.0, 0.0)
        .map(Option(_)), 3 -> Gen.const(None))
    } yield (date, genre, track, dur, pop)

  private def frame(seedNo: Long, n: Int) = {
    val rows = Gen.listOfN(n, genRow)
      .pureApply(Gen.Parameters.default, Seed(seedNo))
      .zipWithIndex.map { case ((d, g, t, du, p), i) =>
        R(i.toLong, d, g, t, du, p)
      }
    // plus an all-null-popularity group and a single-row group
    val extra = Seq(
      R(1000L, "2024-01-03", "gx", Some("z"), Some(1.0), None),
      R(1001L, "2024-01-03", "gx", Some("y"), Some(1.0), None),
      R(1002L, "2024-01-03", "gx", None, None, None),
      R(1003L, "2024-01-04", "gy", Some("solo"), Some(2.0), Some(9.0)))
    (rows ++ extra).toDF("id", "date", "genre", "track", "dur", "pop")
  }

  private val cols = GenreKpis.Cols(date = "date", genre = "genre",
    track = "track", duration = "dur", popularity = "pop", rowId = "id")

  /** The replaced formulation, kept here as the property oracle. */
  private def windowArgmax(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("date"), col("genre"))
      .orderBy(col("pop").desc_nulls_last, col("track").asc_nulls_last,
        col("id").asc)
    Enrich.dropNullKeys(df, "genre", "date")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("date"), col("genre"),
        col("track").as("most_popular_track"),
        col("pop").cast("double").as("most_popular_track_popularity"))
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("date", "genre", "most_popular_track",
        "most_popular_track_popularity")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getAs[java.lang.Double](3))))
      .sortBy(t => (t._1, t._2)).toList

  test("max-then-tiebreak equals the window argmax on adversarial corpora") {
    for (seedNo <- 1L to 5L) {
      val df = frame(seedNo, 120)
      val expected = canon(windowArgmax(df))
      assert(canon(GenreKpis.mostPopularTrack(df, cols)) === expected,
        s"mostPopularTrack diverged at seed $seedNo")
      assert(canon(GenreKpis.compute(df, cols)) === expected,
        s"compute diverged at seed $seedNo")
      assert(canon(GenreKpis.computeViaJoin(df, cols)) === expected,
        s"computeViaJoin diverged at seed $seedNo")
    }
  }

  test("argmax survives a LongType popularity column at 2^53 boundaries") {
    // the native-type contract: 2^53 and 2^53 + 1 are equal as doubles but
    // distinct as longs — the max/match must keep them apart (the double
    // cast belongs only to the output column)
    val big = 1L << 53
    val df = Seq(
      (1L, "2024-01-01", "g", "loses", big),
      (2L, "2024-01-01", "g", "wins", big + 1L))
      .toDF("id", "date", "genre", "track", "pop")
      .withColumn("dur", lit(1.0))
    val r = GenreKpis.mostPopularTrack(df, cols).head()
    assert(r.getAs[String]("most_popular_track") == "wins",
      "double-precision loss in the argmax match")
  }
}
