package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application — the vocabulary
  * step of an LLM pretraining pipeline (public algorithm: Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Scale design — the word-frequency compression is what makes BPE trainable
  * on 100 TB: ONE corpus-sized shuffle aggregates text to a (word, count)
  * table whose size follows Heaps' law (sub-linear in corpus size, vocabulary
  * not volume). Every merge round after that touches only the word table:
  * per-round cost is independent of corpus size. Each round is
  *   - one hash-aggregate over exploded adjacent pairs (weighted by word
  *     count, map-side combinable),
  *   - a 1-row argmax to the driver (the same iterative-scalar shape as
  *     connectedComponents' convergence check — one tuple per round, never
  *     the data),
  *   - one narrow codegen'd fold applying the merge to the token arrays.
  * Lineage is truncated per round with lazy localCheckpoint, as any
  * iterative DataFrame algorithm must.
  *
  * Application ([[tokenize]]) is a pure map stage: the learned merge list is
  * a literal array in the plan (broadcast-sized: numMerges entries), and each
  * document folds its words through the merges with nested `aggregate` HOFs —
  * no UDF, no shuffle, linear in input splits.
  */
object Bpe {

  /** End-of-word marker (the classic `</w>` sentinel, so merges can learn
    * word-final units like "est</w>" distinct from word-internal "est"). */
  val Eow = "</w>"

  /** One learned merge: concatenate adjacent tokens (a, b) → a+b.
    * `rank` is application order; `pairCount` the weighted frequency that
    * won the round (kept for inspection/specs). */
  final case class Merge(a: String, b: String, rank: Int, pairCount: Long)

  /** The Heaps-law corpus compression: normalized lowercase letter-words with
    * occurrence counts. The ONLY corpus-sized job in training. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    // scatter-guarded: normalize+split+explode run map-side before the
    // count aggregate and would otherwise inherit the source partitioning
    graft.io.Sources.scatter(docs.select(col(textCol)))
      .select(explode(split(TextAnalysis.normalize(col(textCol)), " "))
        .as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Characters of `word` plus the end-of-word marker, as array<string>.
    * substring-by-index, not split-on-empty-regex: regex splitting on ""
    * is engine-defined at string edges; substring is not. */
  def initTokens(word: Column): Column =
    concat(
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
      array(lit(Eow)))

  /** Adjacent (a, b) token pairs of a token array, via zip_with of shifted
    * slices (sequence(1, n-1) would COUNT DOWN for n=1 — Spark sequence
    * direction follows the sign of (stop-start)). */
  def adjacentPairs(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))

  /** Leftmost non-overlapping application of one merge to a token array as a
    * single codegen'd fold: append each token, but when the accumulator's
    * last element is `a` and the incoming token is `b`, replace the last
    * element with a+b. Non-overlap falls out of the fold: once a+b is
    * written it no longer equals `a`, so "aaa" under (a,a) becomes
    * [aa, a], exactly the greedy left-to-right BPE scan. */
  private def applyMergeSql(toks: String, a: String, b: String): String =
    s"""aggregate($toks, cast(array() as array<string>),
       |  (acc, t) -> if(size(acc) > 0 and element_at(acc, -1) = $a
       |                 and t = $b,
       |    concat(slice(acc, 1, size(acc) - 1),
       |           array(concat(element_at(acc, -1), t))),
       |    concat(acc, array(t))))""".stripMargin

  /** Train `numMerges` merges over a (word, cnt) table. Ties on pair count
    * break lexicographically on (a, b) so training is deterministic across
    * cluster sizes and engines. Stops early when no adjacent pair remains
    * (every word fused to a single token). */
  def trainMerges(wordCounts: DataFrame, numMerges: Int): Seq[Merge] = {
    val spark = wordCounts.sparkSession
    var state = wordCounts
      .select(col("cnt"), initTokens(col("word")).as("toks"))
      .localCheckpoint(false)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = state
        .select(col("cnt"), explode(adjacentPairs(col("toks"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top(0)
        val (a, b) = (r.getString(0), r.getString(1))
        merges += Merge(a, b, rank, r.getLong(2))
        def sqlLit(v: String) = "'" + v.replace("\\", "\\\\")
          .replace("'", "\\'") + "'"
        val (la, lb) = (sqlLit(a), sqlLit(b))
        state = state
          .select(col("cnt"), expr(applyMergeSql("toks", la, lb)).as("toks"))
          .localCheckpoint(false)
        rank += 1
      }
    }
    merges.result()
  }

  /** SQL fragment folding a token array through the full merge list (array
    * of (a, b) structs named `ms`): nested aggregate HOFs, still one narrow
    * codegen'd projection — the merges are plan literals, not a join. */
  private def applyAllSql(toks: String, ms: String): String =
    s"""aggregate($ms, $toks, (ts, m) ->
       |  aggregate(ts, cast(array() as array<string>),
       |    (acc, t) -> if(size(acc) > 0 and element_at(acc, -1) = m.a
       |                   and t = m.b,
       |      concat(slice(acc, 1, size(acc) - 1),
       |             array(concat(element_at(acc, -1), t))),
       |      concat(acc, array(t)))))""".stripMargin

  /** Tokenize `textCol` with a trained merge list: per document, normalized
    * letter-words are char-split and folded through the merges in rank
    * order; the result column is the flattened subword sequence. Pure map
    * stage — merges ride in the plan as a literal array. */
  def tokenize(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text", outCol: String = "bpe_tokens"): DataFrame = {
    val ms = merges.sortBy(_.rank)
      .map(m => struct(lit(m.a).as("a"), lit(m.b).as("b")))
    val msCol = if (ms.isEmpty) expr("cast(array() as array<struct<a:string,b:string>>)")
                else array(ms: _*)
    docs
      .withColumn("_words",
        filter(split(TextAnalysis.normalize(col(textCol)), " "),
          w => w.rlike("^[a-z]+$")))
      .withColumn("_ms", msCol)
      .withColumn(outCol,
        flatten(expr(
          s"transform(_words, word -> ${applyAllSql("(" +
            "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1))," +
            s" array('$Eow')))", "_ms")})")))
      .drop("_words", "_ms")
  }
}
