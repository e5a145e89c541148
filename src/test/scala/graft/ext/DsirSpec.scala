package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("DSIR upweights docs that share the target's bigram distribution") {
    // the parquet fixture's languages share one token pool, so weight
    // spread is modest there (the query pins arithmetic only) — signal
    // is tested on a corpus where target-like and raw-only docs have
    // distinct bigram inventories plus shared filler
    val target = Seq("clean prose reads well", "prose reads well indeed")
    val targetLike = Seq("clean prose reads well today",
      "well indeed clean prose reads")
    val noise = Seq("zz qq xx vv kk", "qq zz vv xx jj", "vv kk zz qq xx")
    val rows =
      target.zipWithIndex.map { case (t, i) => (i.toLong, t, "tgt") } ++
      targetLike.zipWithIndex.map { case (t, i) =>
        (100L + i, t, "raw") } ++
      noise.zipWithIndex.map { case (t, i) => (200L + i, t, "raw") }
    val df = rows.toDF("doc_id", "text", "lang")
    val out = Dsir.importanceWeights(df, col("lang") === "tgt",
        buckets = 64, keepFraction = 0.5)
      .select($"doc_id", $"weight_m", $"selected")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    // every target-like doc outweighs every noise doc
    for (tl <- Seq(100L, 101L); nz <- Seq(200L, 201L, 202L))
      assert(byId(tl)._2 > byId(nz)._2,
        s"doc $tl (${byId(tl)._2}) not above noise $nz (${byId(nz)._2})")
    // noise docs are never selected at keepFraction covering tgt+like
    assert(Seq(200L, 201L, 202L).forall(!byId(_)._3))
  }

  test("weights are deterministic and cover every doc") {
    val docs = graft.io.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val run = () => Dsir.importanceWeights(docs, col("lang") === "en")
      .select($"doc_id", $"n_bigrams", $"weight_m", $"selected")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val a = run()
    assert(a.map(_._1) == docs.select($"doc_id").as[Long]
      .collect().sorted.toSeq)
    assert(a == run())
    // the selected set is exactly ceil(n/4) docs
    assert(a.count(_._4) == math.ceil(a.length / 4.0).toLong)
  }

  test("a pre-tokenized frame yields the same weights as raw text") {
    // the staged-token fast path (the `toks` column branch) must be a
    // pure no-op on results — pins the tokenize-once contract DSIR
    // shares with the text family
    val docs = Seq(
      (1L, "clean prose reads well", "en"),
      (2L, "  Weird   SPACING and CAPS  ", "en"),
      (3L, "zz qq xx vv kk", "de"),
      (4L, "prose reads well indeed", "de"),
      (5L, "x", "en"), // single-token: no bigrams, weight 0
    ).toDF("doc_id", "text", "lang")
    val pred = col("lang") === "en"
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_bigrams", "weight_m", "selected")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toList
    val raw = canon(Dsir.importanceWeights(docs, pred))
    val staged = TextAnalysis.tokenized(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
    assert(canon(Dsir.importanceWeights(staged, pred)) === raw)
    Dedup.releaseScratch()
  }
}
