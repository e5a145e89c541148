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

  test("qualityScore survives empty and whitespace-only docs (ANSI)") {
    // length(norm) = 0 → nonalpha_ratio must be NULL (DuckDB's x/0), not
    // a DIVIDE_BY_ZERO stage failure poisoning the whole corpus
    val withEmpty = docs.unionByName(Seq(
      (4L, "en", ""), (5L, "en", "   \t  ")).toDF("doc_id", "lang", "text"))
    val rows = TextAnalysis.qualityScore(withEmpty).collect()
    assert(rows.length == 5)
    val empties = rows.filter(r => r.getLong(0) >= 4L)
    assert(empties.forall(_.isNullAt(empties.head.fieldIndex(
      "nonalpha_ratio"))))
    // and the quality gate must simply drop them, not crash (an empty
    // norm still splits to one "" token, so gate on token count)
    assert(TextAnalysis.filterByQuality(withEmpty, minScore = 0.0,
      minTokens = 2).filter($"doc_id" >= 4L).count() == 0)
  }

  test("sparseCosinePairs survives an all-identical corpus (ANSI)") {
    // every token has df = N → all weights round to 0 → without the w>0
    // prune both docs would reach the cosine with n2 = 0 and ANSI would
    // kill the stage on 0/0; the correct answer is simply no pairs
    val same = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.sparseCosinePairs(same, maxDf = 50).count() == 0)
  }

  test("fingerprint: identical normalized docs share fingerprints") {
    val two = Seq((1L, "same same same same text body here"),
      (2L, "SAME   same same same text body here"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(two).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L)) // normalization folds case/whitespace
  }

  test("repetition: dup-gram and top-gram ratios match hand computation") {
    val reps = Seq(
      (1L, "a b a b a b"),   // 3-grams: aba, bab, aba, bab -> dup 0.5, top 0.5
      (2L, "x y z w"),       // xyz, yzw -> dup 0, top 0.5
      (3L, "too short"),     // < 3 tokens: excluded
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(reps).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_grams"), r.getAs[Double]("dup_gram_ratio"),
          r.getAs[Double]("top_gram_ratio")))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((4L, 0.5, 0.5)))
    assert(out(2L) == ((2L, 0.0, 0.5)))
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

  test("real ImageIO decode: PNG round trip recovers the generation rule") {
    // encode → decode entirely through the public surface, off-Spark first:
    // the PNG writer and ImageIO reader must agree on every pixel
    for (seed <- Seq(0L, 1L, 7L, 49L, 255L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.syntheticPng(seed)))
      assert(img.getWidth == ((seed % 4) + 1) * 16)
      assert(img.getHeight == (seed % 6) + 4)
    }
    // and through the Spark boundary: widths/heights/features exactly the
    // arithmetic the oracle predicts
    val ids = (0L until 20L).toDF("doc_id")
    val decoded = Multimodal.decodeImages(
        Multimodal.syntheticImageMedia(ids, "doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L until 20L).foreach { id =>
      val r = decoded(id)
      assert(r.getAs[Int]("width") == ((id % 4) + 1) * 16)
      assert(r.getAs[Int]("height") == (id % 6) + 4)
      assert(r.getAs[Int]("n_frames") == 1)
      val f = r.getSeq[Float](r.fieldIndex("feature"))
      (0 until 8).foreach { i =>
        val expected = ((id * id + 1) * (i * i * i + 7) + id * 91 + i * 41) % 256
        assert(f(i) == expected.toFloat, s"id=$id band=$i got ${f(i)}")
      }
    }
  }

  test("real javax.sound decode: WAV round trip recovers the generation rule") {
    // off-Spark first: the hand-rolled RIFF container must be readable by
    // the JDK decoder with the exact synth parameters
    for (seed <- Seq(0L, 1L, 7L, 49L, 255L)) {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.syntheticWav(seed)))
      assert(in.getFormat.getSampleRate.toInt == 8000 * ((seed % 3) + 1))
      assert(in.getFormat.getChannels == 1)
      assert(in.getFrameLength == 8 * ((seed % 5) + 2) * 100)
    }
    // and through the Spark boundary: format + band means exactly the
    // arithmetic the oracle predicts
    val ids = (0L until 20L).toDF("doc_id")
    val decoded = Multimodal.decodeAudio(
        Multimodal.syntheticAudioMedia(ids, "doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L until 20L).foreach { id =>
      val r = decoded(id)
      assert(r.getAs[Int]("sample_rate") == 8000 * ((id % 3) + 1))
      assert(r.getAs[Int]("channels") == 1)
      assert(r.getAs[Int]("n_samples") == 8 * ((id % 5) + 2) * 100)
      val f = r.getSeq[Float](r.fieldIndex("feature"))
      (0 until 8).foreach { i =>
        val expected = ((id * id + 1) * (i * i * i + 7) + id * 91 + i * 41) % 256
        assert(f(i) == expected.toFloat, s"id=$id band=$i got ${f(i)}")
      }
    }
  }

  test("audio decode: corrupt and null payloads yield null-metadata rows") {
    val junk = Seq(
      (1L, "audio", "definitely not RIFF".getBytes("UTF-8")),
      (2L, "audio", null.asInstanceOf[Array[Byte]]),
      (3L, "audio", Multimodal.syntheticWav(3L)),
    ).toDF("media_id", "modality", "content")
    val out = Multimodal.decodeAudio(junk).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(out(1L).fieldIndex("sample_rate")))
    assert(out(2L).isNullAt(out(2L).fieldIndex("sample_rate")))
    assert(out(3L).getAs[Int]("sample_rate") == 8000) // seed 3 → 3%3=0
  }

  test("real decode: corrupt and null payloads yield null-metadata rows") {
    val junk = Seq(
      (1L, "image", "not a png at all".getBytes("UTF-8")),
      (2L, "image", null.asInstanceOf[Array[Byte]]),
      (3L, "image", Multimodal.syntheticPng(3L)),
    ).toDF("media_id", "modality", "content")
    val out = Multimodal.decodeImages(junk).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(out(1L).fieldIndex("width")))
    assert(out(2L).isNullAt(out(2L).fieldIndex("width")))
    assert(out(3L).getAs[Int]("width") == 64) // seed 3 → cellW 8
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
