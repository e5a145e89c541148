package graft

import java.nio.file.{Files, Path}

import graft.etl.Validate
import graft.model.Schemas

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.writeString(dir.resolve(name), lines.mkString("\n"))

  /** Fixture per FIXTURES.md §A: two stream batch files (each with its own
    * header — the reference's concat bug case, SURVEY §2.11-1), an
    * unparseable timestamp, an unmatched track_id, a popularity tie. */
  private def fixtures(): (Path, Path) = {
    val in = Files.createTempDirectory("graft_in")
    val streams = in.resolve("streams"); Files.createDirectory(streams)
    write(streams, "b1.csv",
      "user_id,track_id,listen_time",
      "1,t1,2024-06-25 10:05:00",
      "2,t2,2024-06-25 10:40:00",
      "1,t3,2024-06-25 11:10:00")
    write(streams, "b2.csv",
      "user_id,track_id,listen_time",
      "3,t1,2024-06-25 10:59:00",
      "3,tX,2024-06-25 12:00:00", // no such song → null genre → dropped in KPIs
      "2,t2,not-a-timestamp")     // coerced null → dropped in KPIs
    write(in, "users.csv",
      "user_id,user_name,user_age,user_country,created_at",
      "1,ann,30,DE,2024-01-01", "2,bob,40,US,2024-01-02",
      "3,cat,25,FR,2024-01-03")
    write(in, "songs.csv",
      Schemas.songs.fieldNames.mkString(","),
      "1,t1,ArtA,Al1,Song1,80,100,false,0,0,0,0,0,0,0,0,0,0,0,4,rock",
      "2,t2,ArtB,Al2,Song2,90,200,false,0,0,0,0,0,0,0,0,0,0,0,4,rock",
      "3,t3,ArtA,Al3,Song3,90,300,true,0,0,0,0,0,0,0,0,0,0,0,4,")
    val out = Files.createTempDirectory("graft_out")
    (in, out)
  }

  test("end-to-end: multi-file streams → KPI tables, reference semantics") {
    val (in, out) = fixtures()
    val res = Pipeline.run(spark, s"$in/streams", s"$in/users.csv",
      s"$in/songs.csv", out.toString)
    val Pipeline.Completed(genre, hourly) = res: @unchecked

    val g = genre.orderBy("track_genre").collect()
    // t3's genre is empty→null in CSV, then filled "Unkown" by F3.
    assert(g.map(_.getAs[String]("track_genre")).toSeq ==
      Seq("Unkown", "rock"))
    val rock = g(1)
    assert(rock.getAs[Long]("listen_count") == 3) // t1,t2,t1 (bad-ts dropped)
    // popularity tie 90 (t2 Song2, t3 Song3): Song2 wins alphabetically —
    // but t3 is in "Unkown", so rock's top is Song2 (90 beats t1's 80).
    assert(rock.getAs[String]("most_popular_track") == "Song2")

    val h = hourly.orderBy("hour").collect()
    assert(h.map(_.getAs[Int]("hour")).toSeq == Seq(10, 11, 12))
    val h10 = h(0)
    assert(h10.getAs[Long]("unique_listeners") == 3) // users 1,2,3 in hour 10
    assert(h10.getAs[String]("top_artist") == "ArtA") // 2 plays of t1
    // hour 12: the unmatched track tX still counts (null artist dropped from
    // top-artist ranking, so top_artist is null there)
    assert(h(2).getAs[Long]("unique_listeners") == 1)
    assert(h(2).get(h(2).fieldIndex("top_artist")) == null)

    // per-file headers never leak in as data rows (Spark multi-file CSV)
    assert(genre.filter($"track_genre" === "track_genre").isEmpty)
  }

  test("KPI parquet is date-partitioned and re-runs idempotently") {
    val (in, out) = fixtures()
    Pipeline.run(spark, s"$in/streams", s"$in/users.csv", s"$in/songs.csv",
      out.toString)
    val first = spark.read.parquet(s"$out/genre_kpis").count()
    assert(Files.exists(out.resolve("genre_kpis/date=2024-06-25")))
    Pipeline.run(spark, s"$in/streams", s"$in/users.csv", s"$in/songs.csv",
      out.toString) // re-run must NOT append duplicates (SURVEY §2.11-2)
    assert(spark.read.parquet(s"$out/genre_kpis").count() == first)
  }

  test("empty input dir stops the run (S1 branch)") {
    val empty = Files.createTempDirectory("graft_empty")
    val res = Pipeline.run(spark, empty.toString, "x", "y", "z")
    assert(res == Pipeline.NoStreams)
  }

  test("missing required columns stop the run (F1 branch)") {
    val (in, out) = fixtures()
    // users file lacking user_country
    write(in, "bad_users.csv", "user_id,user_name", "1,ann")
    val res = Pipeline.run(spark, s"$in/streams", s"$in/bad_users.csv",
      s"$in/songs.csv", out.toString)
    res match {
      case Pipeline.InvalidColumns(errs) =>
        assert(errs.exists(e => e.table == "users" &&
          e.missing.contains("user_country")))
      case other => fail(s"expected InvalidColumns, got $other")
    }
  }

  test("fillUnknown touches only string columns (F3 sane-ified)") {
    val df = Seq((Some(1), Option.empty[String]), (None, Some("x")))
      .toDF("num", "str")
    val out = Validate.fillUnknown(df).collect()
    assert(out.map(_.getAs[String]("str")).toSet == Set("Unkown", "x"))
    assert(out.exists(_.get(0) == null)) // numeric null untouched
  }
}
