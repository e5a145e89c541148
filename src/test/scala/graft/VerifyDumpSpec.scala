package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-5 lesson: a query that throws during the verify dump left no
  * parquet and the downstream compare silently OMITTED it — 204/204 "all
  * green" over 17 broken queries. This spec pins the fix: every queries key
  * yields either a parquet dump or a record in `_failures.json`; a broken
  * query can be red, never invisible. */
class VerifyDumpSpec extends SparkSpec {

  test("dumpAll persists throwing queries to _failures.json") {
    val out = Files.createTempDirectory("graft_verifydump").toString
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "ok_query" -> ((s, _) => s.range(3).toDF("id")),
      "boom_query" -> ((_, _) => throw new IllegalStateException("boom\n\"x\"")))
    val failures = Verify.dumpAll(spark, "/unused", out, qs)

    assert(Files.exists(Paths.get(s"$out/ok_query")), "good query must dump")
    assert(!Files.exists(Paths.get(s"$out/boom_query")))
    assert(failures.keySet == Set("boom_query"))

    val json = Files.readString(Paths.get(s"$out/_failures.json"))
    // parseable despite newline/quote in the message (control chars escaped)
    assert(json.contains("\"boom_query\""))
    assert(json.contains("IllegalStateException"))
    assert(!json.contains("\n"))
  }

  test("dumpAll writes an EMPTY _failures.json when everything passes") {
    val out = Files.createTempDirectory("graft_verifydump").toString
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "ok_query" -> ((s, _) => s.range(3).toDF("id")))
    assert(Verify.dumpAll(spark, "/unused", out, qs).isEmpty)
    assert(Files.readString(Paths.get(s"$out/_failures.json")) == "{}")
  }

  test("every SparkEntry.queries key is oracle-backed") {
    // the driver records only a weaker rows-only check for keys absent from
    // oracleSql — a forgotten oracle (static or post-run) must be loud here
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleBacked
    assert(noOracle.isEmpty,
      s"queries without any oracle: ${noOracle.toSeq.sorted.mkString(", ")}")
  }
}
