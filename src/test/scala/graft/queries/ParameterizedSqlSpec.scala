package graft.queries

import graft.SparkSpec

/** Parameterized SQL (Spark 4 named `:p` and positional `?` markers):
  * parameters bind as typed LITERALS in the analyzed plan, not as text
  * pasted into the query — the injection-safe surface an exposed
  * query endpoint needs, and plan-cache-friendly at scale (one plan
  * shape, many bindings). */
class ParameterizedSqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val init: Unit = Seq((1L, 4L, "x"), (2L, 10L, "y"),
    (3L, 25L, "' OR '1'='1")).toDF("id", "v", "s")
    .createOrReplaceTempView("graft_param_t")

  test("named markers bind typed values") {
    init
    val ids = spark.sql(
      "SELECT id FROM graft_param_t WHERE v > :lo AND v < :hi ORDER BY id",
      Map("lo" -> 5, "hi" -> 20)).as[Long].collect().toSeq
    assert(ids == Seq(2L))
  }

  test("positional markers bind in order") {
    init
    val ids = spark.sql(
      "SELECT id FROM graft_param_t WHERE v > ? AND s = ? ORDER BY id",
      Array(5, "y")).as[Long].collect().toSeq
    assert(ids == Seq(2L))
  }

  test("a malicious string parameter is a value, not SQL text") {
    init
    val n = spark.sql(
      "SELECT CAST(COUNT(*) AS BIGINT) FROM graft_param_t WHERE s = :x",
      Map("x" -> "' OR '1'='1")).as[Long].head()
    assert(n == 1L) // matches only the row whose VALUE is that string
  }
}
