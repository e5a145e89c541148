package graft.etl

import org.apache.spark.sql.Row
import graft.SparkSpec

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("coerceTimestamp nulls unparseable values (P4)") {
    val df = Seq("2024-06-25 19:30:00", "garbage", null)
      .toDF("listen_time")
    val out = Enrich.coerceTimestamp(df, "listen_time", "ts")
      .select("ts").collect().map(r => Option(r.get(0)))
    assert(out(0).isDefined)
    assert(out(1).isEmpty)
    assert(out(2).isEmpty)
  }

  test("withDateHour derives date and hour-of-day (P5)") {
    val df = Seq("2024-06-25 19:30:00").toDF("listen_time")
    val out = Enrich.withDateHour(
      Enrich.coerceTimestamp(df, "listen_time", "ts"), "ts")
    val Row(d, h) = out.select("date", "hour").head()
    assert(d.toString == "2024-06-25" && h == 19)
  }

  test("leftEnrich keeps unmatched rows with null dim columns (J1)") {
    val facts = Seq(("t1", 1L), ("missing", 2L)).toDF("track_id", "user_id")
    val dim = Seq(("t1", "rock")).toDF("track_id", "track_genre")
    val out = Enrich.leftEnrich(facts, dim, "track_id")
    assert(out.count() == 2)
    assert(out.filter($"track_genre".isNull).count() == 1)
  }

  test("dropNullKeys reproduces pandas groupby dropna (F4)") {
    val df = Seq(("rock", Some("2024-01-01")), (null, Some("2024-01-01")),
      ("pop", None)).toDF("track_genre", "date")
    assert(Enrich.dropNullKeys(df, "track_genre", "date").count() == 1)
  }
}
