package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed n-gram features are under a TARGET corpus distribution
  * than under the raw corpus distribution, then keep the top slice by
  * that importance weight. The production recipe for "give me the
  * slice of the crawl that looks like my curated set" at corpus scale.
  *
  * Features are hashed BIGRAMS folded into a fixed `buckets`-slot
  * table (the paper's hashed n-gram generative model): no vocabulary,
  * no fitting — the bigram stream aggregates ONCE to (doc, slot)
  * grain (staged via the scratch lifecycle for its two consumers),
  * and both the target and raw multinomials are tiny rollups of that
  * table, broadcast to the scoring join. log w(d) =
  * Σ_b cnt_db·(ln p_b − ln q_b) under Laplace-smoothed multinomials
  * p (target) and q (raw).
  *
  * Determinism: every log is `ln` of an INTEGER (smoothed slot counts,
  * totals) quantized to micro-nats (`round(ln·1e6)` as BIGINT — the
  * NaiveBayesText recipe), so weights are exact integer sums:
  * associative, order-free, engine-identical. Selection is a rank over
  * (weight, doc_id) — the paper's Gumbel resampling replaced by the
  * seedless deterministic equivalent.
  *
  * Scale: ONE scan of the corpus (the staged (doc, slot) table serves
  * model and scoring alike), one broadcast of `buckets` model rows,
  * zero driver state. The final rank runs at doc grain through
  * [[graft.ops.GlobalIndex]] (range exchange + per-partition offsets)
  * — NOT an empty-partition ROW_NUMBER window, which would funnel the
  * whole doc grain through one reducer.
  */
object Dsir {

  private def qln(c: Column): Column =
    round(log(c.cast("double")) * lit(1e6)).cast("long")

  /** Per-document importance weights and top-`keepFraction` selection.
    *
    * @param docs      corpus with `idCol` and `textCol`
    * @param targetPred defines the target (curated) subset, e.g.
    *                   `col("lang") === "en"`
    * @return (id, n_bigrams, weight_m, selected) for EVERY input doc —
    *         docs with fewer than 2 tokens carry weight 0 (no features)
    */
  def importanceWeights(docs: DataFrame, targetPred: Column,
                        buckets: Int = 64, keepFraction: Double = 0.25,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val b = lit(buckets.toLong)
    // a pre-tokenized frame (TextAnalysis.tokenized/sharedTokens shape,
    // detected by its `toks` column) skips the normalize→split here — the
    // same tokenize-once contract the whole text family honors, so a
    // runner can stage tokens one time and DSIR reads the staged table.
    // The detection is by NAME, so the shape must be validated: a caller
    // frame with an unrelated `toks` column (wrong element type) would
    // otherwise silently change importance weights instead of failing.
    // Only the array-of-strings type is checkable — a differently
    // NORMALIZED array<string> is on the caller, as the scaladoc'd
    // tokenize-once contract states.
    val toksExpr = docs.schema.find(_.name == "toks") match {
      case Some(f) =>
        require(f.dataType ==
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, containsNull = true) ||
          f.dataType ==
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, containsNull = false),
          s"pre-tokenized `toks` must be array<string> " +
            s"(TextAnalysis.tokens shape), got ${f.dataType.simpleString}")
        col("toks")
      case None => TextAnalysis.tokens(TextAnalysis.normalize(col(textCol)))
    }
    // scatter-guarded: on the RAW-text branch a single-file corpus would
    // otherwise tokenize + bigram-explode on ONE core (measured: 3.5-4 s
    // vs 0.8 s at sf0.1 — the same class of hazard io.Sources.scatter
    // exists for); on the staged branch the upstream join/agg makes the
    // plan "wide" and scatter is a no-op
    val toks = graft.io.Sources.scatter(docs
      .select(col(idCol), targetPred.as("is_target"), toksExpr.as("toks")))
      .filter(col("toks").isNotNull && size(col("toks")) >= 2)
      .select(col(idCol), col("is_target"),
        explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
          .as("bigram"))
      .withColumn("slot",
        pmod(conv(substring(md5(col("bigram")), 1, 8), 16, 10).cast("long"),
          b))

    // per-doc slot counts — the scoring-side features. The bigram
    // stream is scanned ONCE: both multinomials roll up from this
    // (doc, slot) table (far smaller than the stream it aggregates),
    // not from re-reading the explode. is_target rides the key — it is
    // functionally dependent on the doc id, so the grain is unchanged.
    val docSlot = Dedup.persistScratch(
      toks.groupBy(col(idCol), col("is_target"), col("slot"))
        .agg(count(lit(1)).as("cnt")))

    // the two multinomials: `buckets` rows each, rolled up from docSlot
    val model = docSlot.groupBy(col("slot"))
      .agg(sum(when(col("is_target"), col("cnt")).otherwise(0L))
        .as("t_cnt"),
        sum(col("cnt")).as("r_cnt"))
    // corpus constants ride as a broadcast 1-row aggregate, never a
    // driver-side collect
    val totals = model.agg(sum(col("t_cnt")).as("t_tot"),
      sum(col("r_cnt")).as("r_tot"))

    val scored = docSlot
      .join(broadcast(model), Seq("slot"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * (qln(col("t_cnt") + 1) - qln(col("r_cnt") + 1)))
          .as("num_m"))
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("n_bigrams"),
        (col("num_m") - col("n_bigrams") * (qln(col("t_tot") + b)
          - qln(col("r_tot") + b))).as("weight_m"))

    // every doc in, zero-feature docs at weight 0; deterministic
    // top-fraction selection on (weight desc, id asc) — the rank is a
    // GlobalIndex (distributed total sort), the cutoff a broadcast
    // 1-row count
    val all = docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("weight_m"), lit(0L)).as("weight_m"))
    val nDocs = all.agg(count(lit(1)).as("n_docs"))
    graft.ops.GlobalIndex
      .withRowId(all, Seq(col("weight_m").desc, col(idCol).asc), "rn")
      .crossJoin(broadcast(nDocs))
      .withColumn("selected",
        col("rn") <= ceil(col("n_docs") * lit(keepFraction)))
      .drop("rn", "n_docs")
  }
}
