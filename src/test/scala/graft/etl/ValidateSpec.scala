package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.Validate.DqRule

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("dqChecks counts NULL rule results as violations") {
    val df = Seq(Option(1L), Option(-2L), Option.empty[Long]).toDF("v")
    val out = Validate.dqChecks(df, Seq(DqRule("non_neg", col("v") >= 0)))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    // -2 violates, NULL cannot be evaluated → also a violation
    assert(out == Seq(("non_neg", 3L, 2L, false)))
  }

  test("dqChecks rule names are data: spaces, quotes, and dots are fine") {
    val df = Seq(1L, 2L).toDF("v")
    val names = Seq("value >= 0 (non-neg)", "it's quoted", "a.b.c")
    val out = Validate.dqChecks(df, names.map(n => DqRule(n, col("v") >= 0)))
      .select("rule", "pass").as[(String, Boolean)].collect().toSet
    assert(out == names.map(n => (n, true)).toSet)
  }

  test("dqChecks on a zero-row input passes every rule vacuously") {
    val df = Seq.empty[Long].toDF("v")
    val out = Validate.dqChecks(df, Seq(DqRule("non_neg", col("v") >= 0)))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    // a bare sum() would be NULL here; pass must be TRUE, not NULL (a
    // downstream filter(col("pass")) must keep the row, not drop it)
    assert(out == Seq(("non_neg", 0L, 0L, true)))
  }
}
