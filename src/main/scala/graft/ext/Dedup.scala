package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Deduplication operators for training-data pipelines, each designed around
  * its shuffle profile at 100 TB:
  *
  *  - exact: one hash-aggregate on a 128-bit content hash (shuffle carries
  *    (hash, id) pairs, never document bodies);
  *  - MinHash-LSH: shingle → per-band min-hash signature (map-side partial
  *    min) → candidate pairs via equi-join on (band, signature) — the join
  *    keys are tiny and uniformly distributed by construction;
  *  - SimHash: 32-bit signature from token-hash bit votes; near-dup pairs by
  *    pigeonhole banding on signature bytes + Hamming distance;
  *  - n-gram Jaccard: exact verification on LSH candidates only (never all
  *    pairs);
  *  - embedding cosine: within-partition (label/IVF-cell) pairs only.
  *
  * Hash family: lexicographic min over hex `md5(band || ':' || shingle)` —
  * a salt-per-band min-wise family that any SQL engine reproduces exactly.
  */
object Dedup {

  /** Exact duplicate groups: content hash → copies + canonical keeper
    * (min id). `copies > 1` filters to actual dups; emitting all groups keeps
    * the result deterministic and oracle-friendly. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("copies"), min(col(idCol)).as("keep_id"))

  /** Exact dedup: keep one row per distinct text (the min-id row). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Per-band MinHash signatures over char shingles.
    * One row per (doc, band); `bands` independent hash functions via salt. */
  def minhashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        k: Int = 8, stride: Int = 4, bands: Int = 4)
      : DataFrame =
    TextAnalysis.charShingles(docs, idCol, k, stride)
      .select(col(idCol),
        explode(expr(s"sequence(0, ${bands - 1})")).as("band"),
        col("shingle"))
      .groupBy(col(idCol), col("band"))
      .agg(min(md5(concat(col("band"), lit(":"), col("shingle"))))
        .as("sig"))

  /** LSH candidate pairs: docs agreeing on any band's signature. */
  def minhashCandidates(docs: DataFrame, idCol: String = "doc_id",
                        k: Int = 8, stride: Int = 4, bands: Int = 4)
      : DataFrame = {
    val sig = minhashSignatures(docs, idCol, k, stride, bands)
    val a = sig.select(col("band"), col("sig"), col(idCol).as("doc_a"))
    val b = sig.select(col("band"), col("sig"), col(idCol).as("doc_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Word n-gram (shingle-of-tokens) sets, one row per (doc, gram). */
  def wordNgrams(docs: DataFrame, idCol: String = "doc_id", n: Int = 3)
      : DataFrame =
    docs.select(col(idCol),
        TextAnalysis.tokens(TextAnalysis.normalize(col("text"))).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol),
        explode(expr(s"transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(toks, i, $n)))")).as("gram"))
      .distinct()

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (|A∩B| / |A∪B| — integer cardinalities, exact division). */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame,
                   idCol: String = "doc_id", n: Int = 3): DataFrame = {
    val grams = wordNgrams(docs, idCol, n)
    val sizes = grams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val inter = pairs
      .join(grams.select(col(idCol).as("doc_a"), col("gram")), Seq("doc_a"))
      .join(grams.select(col(idCol).as("doc_b"), col("gram")),
        Seq("doc_b", "gram"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("n_grams").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("n_grams").as("nb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter"))).as("jaccard"))
  }

  /** 32-bit SimHash per document: each token votes ±1 on every bit of its
    * 32-bit hash (first 8 hex chars of md5); sign of the per-bit sum sets the
    * signature bit. One groupBy with 32 conditional sums — a single shuffle
    * of (doc, 32 longs). */
  def simhash(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val toks = docs
      .select(col(idCol),
        explode(TextAnalysis.tokens(TextAnalysis.normalize(col("text"))))
          .as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h"))
    val votes = (0 until 32).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$j"))
    val packed = (0 until 32).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a: Column, b: Column) => a + b)
    toks.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), packed.as("simhash"))
  }

  /** Near-duplicate pairs by SimHash: pigeonhole-band on each of the 4
    * signature bytes (Hamming ≤ 3 ⇒ at least one byte equal), then exact
    * Hamming filter. */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
                   maxHamming: Int = 3): DataFrame = {
    val sig = simhash(docs, idCol)
    val banded = sig.select(col(idCol), col("simhash"),
        explode(expr("sequence(0, 3)")).as("byte_i"))
      .withColumn("byte_v", expr("shiftright(simhash, byte_i * 8) & 255"))
    val a = banded.select(col("byte_i"), col("byte_v"),
      col(idCol).as("doc_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("byte_i"), col("byte_v"),
      col(idCol).as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("byte_i", "byte_v"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-duplicates: cosine ≥ threshold among pairs sharing a
    * partition key (IVF cell / provided label) — never all-pairs. Threshold
    * compares the ROUNDED cosine so engines agree at the boundary. */
  def embeddingNearDup(emb: DataFrame, partitionCol: String = "label",
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       threshold: Double = 0.45): DataFrame = {
    val a = emb.select(col(partitionCol), col(idCol).as("doc_a"),
      col(vecCol).as("va"))
    val b = emb.select(col(partitionCol), col(idCol).as("doc_b"),
      col(vecCol).as("vb"))
    a.join(b, Seq(partitionCol))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("cosine",
        VectorFunctions.cosineRounded(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col(partitionCol), col("doc_a"), col("doc_b"), col("cosine"))
  }
}
