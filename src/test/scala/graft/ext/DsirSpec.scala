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

  test("importanceWeights matches a sequential reference (3 seeds)") {
    // The distributed formulation re-derived from the definition: hashed
    // bigrams -> Laplace-smoothed target/raw multinomials -> micro-nat
    // integer log-ratio weights -> (weight desc, id asc) top-fraction
    // rank. A per-doc Scala fold over the collected corpus, no Spark
    // operators — pins the md5-slot hash, the qln HALF_UP quantization,
    // the smoothing constants, and the GlobalIndex selection cutoff.
    import scala.math.BigDecimal.RoundingMode
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val words = Vector("clean", "prose", "reads", "well", "indeed",
      "zz", "qq", "xx", "vv", "kk", "the", "a")
    val genDoc = Gen.frequency(
      1 -> Gen.const(""), 1 -> Gen.oneOf(words), // < 2 tokens: weight 0
      8 -> Gen.chooseNum(2, 25).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(words)).map(_.mkString(" "))))
    val (buckets, keep) = (16, 0.3)
    def qln(x: Long): Long =
      BigDecimal(math.log(x.toDouble) * 1e6)
        .setScale(0, RoundingMode.HALF_UP).toLong
    def slot(bigram: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(bigram.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(md5, 16) % buckets
    }
    for (seedNo <- 1L to 3L) {
      val texts = Gen.listOfN(40, genDoc)
        .pureApply(Gen.Parameters.default, Seed(seedNo))
      val rows = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, if (i % 3 == 0) "tgt" else "raw") }
      val df = rows.toDF("doc_id", "text", "lang")
      val got = Dsir.importanceWeights(df, col("lang") === "tgt",
          buckets = buckets, keepFraction = keep)
        .select($"doc_id", $"n_bigrams", $"weight_m", $"selected")
        .as[(Long, Long, Long, Boolean)].collect().toSet
      Dedup.releaseScratch()

      val docSlots = rows.map { case (id, t, lang) =>
        val toks = t.toLowerCase.replaceAll("\\s+", " ").trim
          .split(" ", -1).toVector
        val bigrams =
          if (toks.size < 2 || toks.exists(_.isEmpty)) Seq.empty[String]
          else toks.sliding(2).map(_.mkString(" ")).toSeq
        (id, lang == "tgt", bigrams.groupBy(slot)
          .map { case (s, g) => s -> g.size.toLong })
      }
      val tCnt = docSlots.filter(_._2).flatMap(_._3).groupBy(_._1)
        .map { case (s, g) => s -> g.map(_._2).sum }.withDefaultValue(0L)
      val rCnt = docSlots.flatMap(_._3).groupBy(_._1)
        .map { case (s, g) => s -> g.map(_._2).sum }
      val tTot = tCnt.values.sum
      val rTot = rCnt.values.sum
      val penalty = qln(tTot + buckets) - qln(rTot + buckets)
      val weighted = docSlots.map { case (id, _, slots) =>
        val nB = slots.values.sum
        val num = slots.map { case (s, c) =>
          c * (qln(tCnt(s) + 1) - qln(rCnt(s) + 1)) }.sum
        (id, nB, num - nB * penalty)
      }
      val cut = math.ceil(rows.size * keep).toLong
      val ranked = weighted.sortBy { case (id, _, w) => (-w, id) }
        .zipWithIndex
        .map { case ((id, nB, w), i) => (id, nB, w, i + 1 <= cut) }.toSet
      // non-vacuity: the reference must see real weights and empty docs
      assert(weighted.exists(_._3 != 0L) && weighted.exists(_._2 == 0L))
      assert(got == ranked, s"seed $seedNo: got-want=${got -- ranked} " +
        s"want-got=${ranked -- got}")
    }
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
