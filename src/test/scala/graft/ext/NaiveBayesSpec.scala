package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")

  test("NB recovers the class when vocabulary actually separates classes") {
    // the parquet fixture's text is label-independent word soup (langid
    // heuristics land at the prior there too) — signal is tested on a
    // corpus whose classes have distinct vocabularies plus shared filler
    val vocab = Map(
      "aa" -> Seq("alpha", "amber", "atlas"),
      "bb" -> Seq("birch", "basalt", "bison"),
      "cc" -> Seq("cedar", "cobalt", "crane"))
    val filler = Seq("the", "of", "data", "row")
    val rows = (0L until 60L).map { i =>
      val lang = Seq("aa", "bb", "cc")((i % 3).toInt)
      val r = new scala.util.Random(i)
      val words = Seq.fill(30)(
        if (r.nextDouble() < 0.5) vocab(lang)(r.nextInt(3))
        else filler(r.nextInt(filler.length)))
      (i, words.mkString(" "), lang)
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val out = NaiveBayesText.trainPredict(df)
      .select($"matches").as[Boolean].collect()
    val acc = out.count(identity).toDouble / out.length
    assert(acc >= 0.9, s"NB accuracy on separable corpus too low: $acc")
  }

  test("every held-out doc gets exactly one prediction, deterministic") {
    val a = NaiveBayesText.trainPredict(docs)
      .select($"doc_id", $"pred", $"score_m").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    val b = NaiveBayesText.trainPredict(docs)
      .select($"doc_id", $"pred", $"score_m").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    val held = docs.filter($"doc_id" % 5 === 0).count()
    assert(a.length == held)
  }
}
