package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: documents are concatenated in a fixed order
  * and chunked into fixed-token-budget training sequences, with documents
  * straddling sequence boundaries — the standard causal-LM pretraining
  * layout (attention masks handle the joins downstream). This operator
  * computes the LAYOUT: each document's token interval in its shard's
  * stream is [cum − n_tokens, cum), so its first/last sequence ids are
  * floor((cum − n_tokens)/budget) and floor((cum − 1)/budget).
  *
  * 100 TB design: a GLOBAL document order would serialize the cumsum into
  * one window partition. Sharding by doc_id % shards makes packing
  * embarrassingly parallel — one cumsum window per shard (a shard-keyed
  * exchange), deterministic across engines and cluster sizes, and shards
  * can be written/consumed independently. A production run sizes `shards`
  * ≈ the write parallelism; sequence ids are per-shard, (shard, seq) is
  * the global key.
  */
object Packing {

  /** Layout plan: (id, shard, n_tokens, seq_first, seq_last, n_seqs) per
    * document. Token counts use the shared TextAnalysis token definition
    * so the oracle and every text query agree on what a token is. Null
    * ids are excluded (no stable shard/order identity — same contract as
    * Splits). */
  def packPlan(docs: DataFrame, budget: Int, shards: Int,
               idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, s"budget must be positive, got $budget")
    require(shards >= 1, s"shards must be positive, got $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // scatter-guarded: tokenization runs map-side BEFORE the shard
    // exchange and would otherwise inherit the source file's partitioning
    graft.io.Sources.scatter(docs.filter(col(idCol).isNotNull))
      .select(col(idCol),
        pmod(col(idCol), lit(shards.toLong)).as("shard"),
        size(TextAnalysis.tokens(TextAnalysis.normalize(col("text"))))
          .cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(budget.toLong))
          .as("seq_first"),
        floor((col("cum") - 1) / lit(budget.toLong)).as("seq_last"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
  }
}
