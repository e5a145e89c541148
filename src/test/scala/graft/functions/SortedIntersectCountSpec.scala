package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.functions._

class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  private def sic(a: Column, b: Column): Column =
    GraftShims.column(SortedIntersectCountExpr(
      GraftShims.expression(a), GraftShims.expression(b)))

  test("merge count equals size(array_intersect) on random sorted sets") {
    val r = new scala.util.Random(42)
    // overlapping value domain so intersections are non-trivial; include
    // empty arrays and full-overlap pairs
    val rows = (0 until 500).map { i =>
      val a = Array.fill(r.nextInt(40))(r.nextInt(60).toLong).distinct.sorted
      val b =
        if (i % 17 == 0) a.clone()
        else Array.fill(r.nextInt(40))(r.nextInt(60).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val diffs = df.select(
      sic($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diffs.isEmpty)
  }

  test("both codegen and interpreted paths agree") {
    val df = Seq((Array(1L, 3L, 5L, 9L), Array(2L, 3L, 9L, 11L)))
      .toDF("a", "b")
    // codegen'd projection
    assert(df.select(sic($"a", $"b")).head().getLong(0) == 2L)
    // interpreted eval (filter on the expression inside a non-codegen
    // context via eval through collect of a Column in a literal select
    // still goes through codegen; exercise nullSafeEval directly)
    val e = SortedIntersectCountExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1L, 3L, 5L, 9L),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2L, 3L, 9L, 11L),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 2L)
  }

  test("duplicate runs count once, like array_intersect") {
    val df = Seq((Array(1L, 1L, 2L, 2L, 3L), Array(1L, 2L, 2L, 4L)))
      .toDF("a", "b")
    val r = df.select(sic($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).cast("long").as("ref")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
  }

  test("empty and null arrays") {
    val df = Seq(
      (Some(Array.empty[Long]), Some(Array(1L, 2L))),
      (Some(Array(1L, 2L)), None))
      .toDF("a", "b")
    val rows = df.select(sic($"a", $"b")).collect()
    assert(rows(0).getLong(0) == 0L)
    assert(rows(1).isNullAt(0))
  }

  test("unsorted input throws loudly instead of mis-counting") {
    // the descending step must be VISITED by the merge to be caught:
    // start both sides on a common value so the walk reaches 1 after 5
    val df = Seq((Array(5L, 1L, 9L), Array(5L, 9L))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(sic($"a", $"b")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("not sorted ascending")))
  }

  test("setsim verify arrays: sorted md5-id arrays match built-in") {
    // the exact shape setSimilarityPairs feeds: 60-bit md5-derived longs
    val docs = (0 until 50).map { i =>
      val toks = (0 until 30).map(j => s"w${(i * 7 + j * 3) % 90}").distinct
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val tok = docs.select($"doc_id",
        explode(array_distinct(split($"text", " "))).as("tok"))
      .select($"doc_id",
        conv(substring(md5($"tok"), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy($"doc_id").agg(array_sort(collect_list($"h")).as("hs"))
    val pairs = tok.select($"doc_id".as("da"), $"hs".as("ta"))
      .crossJoin(tok.select($"doc_id".as("db"), $"hs".as("tb")))
      .filter($"da" < $"db")
    val diffs = pairs.select(sic($"ta", $"tb").as("fast"),
      size(array_intersect($"ta", $"tb")).cast("long").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diffs.isEmpty)
  }
}
