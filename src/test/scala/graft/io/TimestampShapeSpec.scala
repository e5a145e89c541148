package graft.io

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.SparkSpec

/** The driver's `events.ts` fixture has regenerated into a DIFFERENT parquet
  * physical type twice (INT64 nanos → µs TIMESTAMP_NTZ), each time breaking
  * every event-time consumer. This spec writes one tiny fixture per physical
  * shape — (a) INT64 TIMESTAMP(NANOS, not-UTC-adjusted) via parquet-mr
  * (Spark cannot write NANOS), (b) µs NTZ, (c) µs UTC-adjusted — and pins
  * that [[Sources.table]] normalizes ALL of them to the same session-zoned
  * TimestampType wall-clock values, acceptable to `withWatermark`. The third
  * regeneration should be free. */
class TimestampShapeSpec extends SparkSpec {

  // microsecond-precision instants (UTC wall clock); deliberately includes
  // a sub-millisecond component so a lossy ms-grain path would be caught
  private val micros = Seq(
    1709296496789012L, // 2024-03-01 12:34:56.789012
    1699142400000001L, // 2023-11-05 00:00:00.000001
    1577836800000000L) // 2020-01-01 00:00:00

  private def dir(): String =
    Files.createTempDirectory("graft_tsshape").toString

  private def writeNanos(path: String): Unit = {
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(
        /* isAdjustedToUTC = */ false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType())
      .named("event_type")
      .named("events")
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$path/events.parquet"))
      .withConf(conf).build()
    try micros.foreach { us =>
      val g = new SimpleGroup(schema)
      g.add("ts", us * 1000L)
      g.add("event_type", "play")
      w.write(g)
    } finally w.close()
  }

  private def writeMicros(path: String, ntz: Boolean): Unit = {
    import spark.implicits._
    val cast = if (ntz) "timestamp_ntz" else "timestamp"
    micros.toDF("us")
      .select(expr(s"cast(timestamp_micros(us) as $cast)").as("ts"),
        lit("play").as("event_type"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/events.parquet")
  }

  test("all three ts physical shapes normalize to identical TimestampType") {
    val (nanosDir, ntzDir, ltzDir) = (dir(), dir(), dir())
    writeNanos(nanosDir)
    writeMicros(ntzDir, ntz = true)
    writeMicros(ltzDir, ntz = false)
    val frames = Seq("nanos" -> nanosDir, "ntz" -> ntzDir, "ltz" -> ltzDir)
      .map { case (label, d) =>
        label -> Sources.table(spark, d, "events").select("ts")
      }
    frames.foreach { case (label, df) =>
      assert(df.schema("ts").dataType == TimestampType,
        s"$label: expected session-zoned TimestampType")
      // event-time analysis must accept the normalized column — this is
      // exactly what EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE broke in round 5
      df.withWatermark("ts", "1 hour").queryExecution.analyzed
      val got = df.select(unix_micros(col("ts")).as("us"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == micros.sorted,
        s"$label: wall-clock microseconds drifted: $got")
    }
  }

  test("the STREAMING event-time path accepts all three shapes identically") {
    // the round-5 break was in the stream reader (withWatermark analysis);
    // run the real windowed streaming aggregation over each shape dir and
    // pin identical (date, hour, event_type, plays) output
    val results = Seq(dir(), dir(), dir()).zip(Seq("nanos", "ntz", "ltz"))
      .map { case (d, label) =>
        label match {
          case "nanos" => writeNanos(d)
          case "ntz"   => writeMicros(d, ntz = true)
          case "ltz"   => writeMicros(d, ntz = false)
        }
        label -> graft.streaming.StreamingKpis.runAvailableNow(spark, d)
          .collect().map(_.toSeq).toSeq
      }
    val expect = results.head._2
    assert(expect.nonEmpty)
    results.foreach { case (label, got) =>
      assert(got == expect, s"$label diverged: $got vs $expect")
    }
  }

  test("frames without a ts column pass through normalizeTs untouched") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "name")
    assert(Sources.normalizeTs(df).schema == df.schema)
  }

  test("a legitimate BIGINT ts column is NOT rebuilt as epoch-nanos") {
    // the fourth physical shape: INT64 with NO timestamp annotation (a
    // sequence number, epoch-millis, etc.). Catalyst reads both this and
    // TIMESTAMP(NANOS)-under-nanosAsLong as bare LongType, so only the
    // parquet footer can tell them apart — Sources.table must leave this
    // one untouched instead of corrupting it via the nanos rebuild
    import spark.implicits._
    val d = dir()
    val vals = Seq(1L, 42L, 1709296496789L) // incl. a plausible epoch-ms
    vals.toDF("ts").coalesce(1).write.mode("overwrite")
      .parquet(s"$d/events.parquet")
    assert(!Sources.tsIsNanosAnnotated(spark, s"$d/events.parquet"))
    val got = Sources.table(spark, d, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType,
      "unannotated INT64 ts must stay LongType")
    assert(got.select("ts").as[Long].collect().sorted.toSeq == vals.sorted)
  }
}
