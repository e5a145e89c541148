package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources.scatter

/** The composed pretraining-curation pipeline: quality gate → language
  * filter → exact dedup → deterministic split assignment, FUSED into the
  * shape a 100 TB run wants rather than chained operator calls.
  *
  * Composing the individual operators ([[TextAnalysis.filterByQuality]],
  * [[TextAnalysis.languageId]], [[Dedup.exactGroups]], [[Splits.assign]])
  * would scan and re-normalize the corpus once PER STAGE and join the
  * stages on doc_id. Every signal here is a pure function of the same
  * normalized text, so one projection derives them all in a single scan:
  * normalize once; token count, stopword hits, language scores, and the
  * content hash come out of the same codegen'd map; the gates are narrow
  * filters that push into the scan boundary. The ONLY exchange in the
  * whole pipeline is the exact-dedup hash partition — done as a window
  * min over content_hash (one shuffle) instead of aggregate-then-join
  * (two). Split assignment is again a narrow projection.
  *
  * Same cut semantics as the standalone operators: quality and token
  * gates match text_quality_filter, the language argmax matches
  * text_langid, keep-min-doc_id matches dedup_exact_groups, buckets match
  * f_split_assign — each individually oracle-checked; the composition is
  * oracle-checked end-to-end as pipeline_pretrain.
  */
object Pretrain {

  /** Curate `docs` → (doc_id, n_tokens, split) for the surviving corpus. */
  def curate(docs: DataFrame, minScore: Double = 0.5, minTokens: Long = 10,
             wantLang: String = "en", idCol: String = "doc_id"): DataFrame = {
    val normed = scatter(docs.select(col(idCol),
        TextAnalysis.normalize(col("text")).as("norm")))
      .withColumn("pn", TextAnalysis.padded(col("norm")))
      .withColumn("n_tokens",
        size(TextAnalysis.tokens(col("norm"))).cast("long"))
      .withColumn("stop_hits",
        TextAnalysis.langScoreCols(col("pn")).find(_._1 == "en").get._2)
    val scored = TextAnalysis.langScoreCols(col("pn")).foldLeft(normed) {
      case (d, (l, c)) => d.withColumn(s"score_$l", c)
    }
    val gated = scored
      .filter(col("n_tokens") >= minTokens &&
        (least(col("n_tokens") / lit(100.0), lit(1.0)) * lit(0.5) +
          least(col("stop_hits") / col("n_tokens") * lit(5.0), lit(1.0)) *
            lit(0.5)) >= minScore)
      .filter(expr(TextAnalysis.langCaseSql) === wantLang)
      .select(col(idCol), col("n_tokens"), md5(col("norm")).as("content_hash"))
    // Exact dedup, keep-min: window min needs no sort and no second join —
    // the shuffle carries (hash, id, n_tokens), never document bodies.
    val keepId = min(col(idCol)).over(Window.partitionBy(col("content_hash")))
    gated
      .withColumn("keep_id", keepId)
      .filter(col(idCol) === col("keep_id"))
      .select(col(idCol), col("n_tokens"),
        when(Splits.hashBucket(col(idCol)) < 80, lit("train"))
          .when(Splits.hashBucket(col(idCol)) < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
  }
}
