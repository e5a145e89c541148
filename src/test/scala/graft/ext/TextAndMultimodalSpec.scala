package graft.ext

import graft.SparkSpec
import graft.streaming.StreamingKpis
import graft.io.Sources
import org.apache.spark.sql.functions._

class TextAndMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "the cat and the dog of the house is to be seen"),
    (2L, "de", "der hund und die katze ist nicht der beste"),
    (3L, "en", "  Weird   SPACING\tand caps  "),
  ).toDF("doc_id", "lang", "text")

  test("tokenStats: counts over normalized text") {
    val r = TextAnalysis.tokenStats(docs).filter($"doc_id" === 3L).head()
    assert(r.getAs[Long]("n_tokens") == 4) // weird spacing and caps
    assert(r.getAs[Double]("avg_token_len") > 0)
  }

  test("languageId picks the marker-heavy language") {
    val out = TextAnalysis.languageId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
  }

  test("qualityScore is bounded and stopword-sensitive") {
    val rows = TextAnalysis.qualityScore(docs).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0)
    }
    val byId = rows.map(r => r.getLong(0) ->
      r.getAs[Double]("stopword_ratio")).toMap
    assert(byId(1L) > byId(3L)) // English stopword-dense text scores higher
  }

  test("fingerprint: identical normalized docs share fingerprints") {
    val two = Seq((1L, "same same same same text body here"),
      (2L, "SAME   same same same text body here"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(two).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L)) // normalization folds case/whitespace
  }

  test("multimodal: metadata + stub decode plumbing") {
    val media = Multimodal.asMedia(docs, "doc_id", "text", "text")
    assert(media.columns.toSeq ==
      Seq("media_id", "modality", "content", "byte_len", "content_hash"))
    val decoded = Multimodal.decodeStub(media).collect()
    assert(decoded.length == 3)
    decoded.foreach { r =>
      assert(r.getSeq[Float](r.fieldIndex("feature")).length == 8)
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 640)
    }
    // determinism: same bytes → same features
    val again = Multimodal.decodeStub(media).collect()
    assert(decoded.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  test("streaming hourly counts equal the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingKpis.runAvailableNow(spark, dir)
      .select("date", "hour", "event_type", "plays")
      .as[(String, Int, String, Long)].collect().toSet
    val batch = Sources.table(spark, dir, "events")
      .groupBy(to_date($"ts").cast("string").as("date"),
        hour($"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("plays"))
      .as[(String, Int, String, Long)].collect().toSet
    assert(streamed == batch)
  }
}
