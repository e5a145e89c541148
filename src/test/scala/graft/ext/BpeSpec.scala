package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE trainer vs an INDEPENDENT sequential reimplementation (the classic
  * in-memory algorithm, written here from the published description) — two
  * implementations agreeing on merges/tokens is much stronger evidence than
  * hand-pinned expectations. Plus determinism, round-trip, and a run over
  * the real documents fixture.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference sequential BPE: word-count map, loop of (count adjacent
    * pairs weighted, pick max with lexicographic tie-break, merge leftmost
    * non-overlapping). */
  private def refTrain(words: Map[String, Long], n: Int)
      : Seq[(String, String)] = {
    var state: Map[Vector[String], Long] = words.map { case (w, c) =>
      (w.map(_.toString).toVector :+ Bpe.Eow) -> c
    }
    val out = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < n && !done) {
      val counts = collection.mutable.Map[(String, String), Long]()
      for ((toks, c) <- state; i <- 0 until toks.size - 1)
        counts((toks(i), toks(i + 1))) =
          counts.getOrElse((toks(i), toks(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        state = state.map { case (toks, c) =>
          val merged = toks.foldLeft(Vector.empty[String]) { (acc, t) =>
            if (acc.nonEmpty && acc.last == best._1 && t == best._2)
              acc.init :+ (best._1 + best._2)
            else acc :+ t
          }
          merged -> c
        }.groupMapReduce(_._1)(_._2)(_ + _)
        k += 1
      }
    }
    out.result()
  }

  private def refTokenize(word: String, merges: Seq[(String, String)])
      : Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector :+ Bpe.Eow) { (toks, m) =>
      toks.foldLeft(Vector.empty[String]) { (acc, t) =>
        if (acc.nonEmpty && acc.last == m._1 && t == m._2)
          acc.init :+ (m._1 + m._2)
        else acc :+ t
      }
    }

  private val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++ Seq.fill(4)("aaa")

  test("distributed merges equal the sequential reference (Sennrich corpus)") {
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val wc = Bpe.wordCounts(docs)
    val got = Bpe.trainMerges(wc, 8).map(m => (m.a, m.b))
    val want = refTrain(
      corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap, 8)
    assert(got == want)
  }

  test("training is deterministic across repartitionings") {
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val a = Bpe.trainMerges(Bpe.wordCounts(docs), 6)
    val b = Bpe.trainMerges(Bpe.wordCounts(docs).repartition(7), 6)
    assert(a == b)
  }

  test("tokenize applies merges like the reference; round-trips the text") {
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val merges = Bpe.trainMerges(Bpe.wordCounts(docs), 8)
    val toks = Bpe.tokenize(docs, merges).select("bpe_tokens")
      .as[Seq[String]].head()
    val want = corpus.flatMap(w =>
      refTokenize(w, merges.map(m => (m.a, m.b))))
    assert(toks == want)
    // round-trip: stripping markers reconstructs the normalized words
    assert(toks.mkString.replace(Bpe.Eow, " ").trim == corpus.mkString(" "))
  }

  test("merge of a merged token (multi-char units) is handled") {
    // force "ab" then ("ab","ab"): leftmost non-overlap on "ababab"
    val docs = Seq(Seq.fill(10)("ababab").mkString(" ")).toDF("text")
    val merges = Bpe.trainMerges(Bpe.wordCounts(docs), 3)
    val want = refTrain(Map("ababab" -> 10L), 3)
    assert(merges.map(m => (m.a, m.b)) == want)
  }

  test("trains on the documents fixture; tokens cover every letter-word") {
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001",
      "documents")
    val merges = Bpe.trainMerges(Bpe.wordCounts(docs), 10)
    assert(merges.size == 10)
    assert(merges.forall(_.pairCount > 0))
    val tokenized = Bpe.tokenize(docs, merges)
      .select(col("doc_id"), size(col("bpe_tokens")).as("n"))
    assert(tokenized.filter(col("n") <= 0).count() == 0)
  }
}
