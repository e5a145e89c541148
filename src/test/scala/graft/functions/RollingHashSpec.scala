package graft.functions

import graft.SparkSpec
import graft.ext.TextAnalysis
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: hash every k-window directly (no rolling). */
  private def reference(s: String, k: Int, stride: Int): Seq[Long] = {
    val b = s.getBytes("UTF-8")
    (0 to b.length - k).filter(_ % stride == 0).map { i =>
      b.slice(i, i + k).foldLeft(0L)((h, c) => h * 257L + (c & 0xffL))
    }
  }

  private def viaExpr(texts: Seq[String], k: Int, stride: Int)
      : Seq[Seq[Long]] = {
    val c = GraftShims.column(
      RollingHashExpr(GraftShims.expression(col("t")), k, stride))
    texts.toDF("t").select(c.as("h")).collect()
      .map(_.getSeq[Long](0).toSeq).toSeq
  }

  test("rolling hash equals the direct per-window reference") {
    val texts = Seq("abcdefghijklmnop", "the quick brown fox", "aaaaaaaaaa",
      "ab", "", "snowfall over the mountain pass at dawn")
    for (k <- Seq(4, 8); stride <- Seq(1, 3)) {
      val got = viaExpr(texts, k, stride)
      val want = texts.map(reference(_, k, stride))
      assert(got == want, s"k=$k stride=$stride")
    }
  }

  test("interpreted and codegen paths agree (whole-stage off/on)") {
    val texts = (1 to 50).map(i => s"document number $i with some text body")
    val on = viaExpr(texts, 8, 4)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = viaExpr(texts, 8, 4)
      assert(on == off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("fingerprintRolling: identical normalized docs share fingerprints") {
    val docs = Seq((1L, "Same   TEXT body here okay"),
      (2L, "same text body here okay"),
      (3L, "different content entirely here"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprintRolling(docs)
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }
}
