package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Malformed-input contract of the JSON extraction path (p_json_extract):
  * both the schemaless and the typed parse must degrade to NULL per row —
  * never fail the job, never skew a value — so one bad producer cannot
  * take down a 100 TB scan. */
class JsonSpec extends SparkSpec {
  import spark.implicits._

  test("malformed, empty, null, and wrong-type JSON all yield null fields") {
    val rows = Seq(
      (1L, """{"k": 7}"""),      // valid
      (2L, """{"k": }"""),       // malformed
      (3L, ""),                  // empty string
      (4L, null),                // null payload
      (5L, """{"j": 1}"""),      // missing field
      (6L, """{"k": "text"}""")  // wrong type for LONG
    ).toDF("id", "props")
    val out = rows
      .withColumn("parsed", from_json(col("props"), StructType.fromDDL("k LONG")))
      .select(col("id"),
        // same expressions as p_json_extract: try_cast so a wrong-typed
        // value nulls the row instead of failing the scan under ANSI
        get_json_object(col("props"), "$.k").try_cast("long").as("k_path"),
        col("parsed.k").as("k_typed"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out(1L) == ((Some(7L), Some(7L))))
    assert(out(2L) == ((None, None)))
    assert(out(3L) == ((None, None)))
    assert(out(4L) == ((None, None)))
    assert(out(5L) == ((None, None)))
    // schemaless path returns null (cast of "text" fails), typed path too
    assert(out(6L) == ((None, None)))
  }
}
