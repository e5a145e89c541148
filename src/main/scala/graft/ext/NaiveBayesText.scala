package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier, trained and applied entirely
  * as DataFrame aggregations — the counts-based classifier a training-data
  * pipeline actually runs at corpus scale (language ID, source routing,
  * quality tiers): training is one token-count aggregation over the
  * training fold (fully map-side-combinable), the model is a (word × class)
  * count table plus a per-class constant row, and scoring is one join of
  * test token counts against the model — no iterative fitting, no driver
  * state.
  *
  * Determinism: every log-probability is `ln` of an INTEGER (Laplace
  * `cnt+1`, class totals, doc counts) quantized to micro-nats
  * (`round(ln·1e6)` as BIGINT — the entropy/surprisal recipe), so scores
  * are exact integer sums: associative, order-free, and engine-identical;
  * argmax ties break lexicographically. score(d, c) =
  * qln(docs_c) − qln(docs_total) + Σ_w tok_cnt·qln(cnt_wc + 1)
  * − n_tok_d·qln(total_c + V), i.e. Laplace-smoothed multinomial NB with
  * unseen words contributing qln(1) = 0 — which is why the seen-word join
  * can stay an inner join plus a left-join backfill.
  */
object NaiveBayesText {

  private def qln(c: Column): Column =
    round(log(c.cast("double")) * lit(1e6)).cast("long")

  /** Hold out fold `holdFold` of `folds` (by id mod), train on the rest,
    * predict the held-out docs. Output: (id, pred, label, matches,
    * score_m) — score in exact micro-nats.
    *
    * Fixture honesty: on the synthetic `documents` table the language
    * labels share one vocabulary (labels are assigned round-robin over
    * the same token pool), so held-out accuracy — the `matches` column —
    * is near-chance BY CONSTRUCTION there. That query pins the scoring
    * arithmetic against the DuckDB oracle, not classifier skill; the
    * signal demonstration lives in NaiveBayesSpec's separable corpus,
    * where the same code reaches high accuracy. */
  def trainPredict(docs: DataFrame, folds: Int = 5, holdFold: Int = 0,
                   idCol: String = "doc_id", textCol: String = "text",
                   labelCol: String = "lang"): DataFrame = {
    // NULL-text docs tokenize to a NULL array (explode drops them but
    // count(*) would still see them, and size(NULL) = -1 would poison
    // n_tok), so they are excluded from priors, vocabulary, and scoring
    // alike — the one place the doc-grain and token-grain views could
    // otherwise disagree.
    val d = docs.select(col(idCol), col(labelCol),
      TextAnalysis.tokens(TextAnalysis.normalize(col(textCol))).as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) > 0)
    val train = d.filter(pmod(col(idCol), lit(folds)) =!= holdFold)
    val test = d.filter(pmod(col(idCol), lit(folds)) === holdFold)

    val wc = train.select(col(labelCol).as("l"), explode(col("toks")).as("word"))
      .groupBy(col("l"), col("word")).agg(count(lit(1)).as("cnt"))
    // corpus constants as broadcast 1-row aggregates — never driver counts
    val v = wc.agg(count_distinct(col("word")).as("v"))
    val nDocs = train.agg(count(lit(1)).as("docs_total"))
    val langConst = train.groupBy(col(labelCol).as("l"))
      .agg(count(lit(1)).as("docs_l"))
      .join(wc.groupBy(col("l")).agg(sum(col("cnt")).as("total")), "l")
      .crossJoin(broadcast(v)).crossJoin(broadcast(nDocs))
      .select(col("l"), (qln(col("docs_l")) - qln(col("docs_total")))
        .as("prior_m"), qln(col("total") + col("v")).as("denom_m"))

    val testTok = test.select(col(idCol), explode(col("toks")).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tok_cnt"))
    val seen = testTok
      .join(wc.select(col("l"), col("word"), qln(col("cnt") + 1).as("qln1")),
        "word")
      .groupBy(col(idCol), col("l"))
      .agg(sum(col("tok_cnt") * col("qln1")).as("seen_m"))

    val scores = test
      .select(col(idCol), col(labelCol), size(col("toks")).cast("long")
        .as("n_tok"))
      .crossJoin(broadcast(langConst))
      .join(seen, Seq(idCol, "l"), "left")
      .select(col(idCol), col(labelCol), col("l"),
        (col("prior_m") + coalesce(col("seen_m"), lit(0L)) -
          col("n_tok") * col("denom_m")).as("score_m"))

    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_m").desc, col("l").asc)
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(idCol), col("l").as("pred"), col(labelCol).as("label"),
        (col("l") === col(labelCol)).as("matches"), col("score_m"))
  }
}
