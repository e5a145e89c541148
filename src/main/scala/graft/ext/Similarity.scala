package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.io.Sources.scatter

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k, computed in two phases: rank within
  * (query, scan-partition) — an exchange hashed over partitions × queries,
  * well distributed — keep k, then rank only the `numPartitions × k`
  * survivors per query. A direct global window would instead sort the entire
  * scored corpus through one reducer per query (Q reducers for Q queries —
  * unusable skew at 100 TB); queries are broadcast so the scoring pass
  * itself never shuffles the corpus.
  *
  * Scale path: IVF-style partition pruning — vectors carry a coarse cluster
  * id (here the `label` column stands in for a trained quantizer's cell
  * assignment); each query searches only its own cell, cutting the scanned
  * fraction to 1/cells. Same two-phase top-k inside the cell.
  *
  * All ranking happens on cosine ROUNDED to 4 dp with vec_id tie-break, so
  * results are total-ordered and engine-independent.
  */
object Similarity {

  /** Local-then-global top-k: rank within (query, scan partition), keep k,
    * re-rank globally per query. Results identical to a single global
    * window, but the global step only sees survivors. Null scores (null
    * or zero-norm embeddings) are excluded BEFORE ranking — desc ordering
    * alone would still admit them when a query has < k scoreable
    * candidates, diverging from [[topKViaAggregator]], which filters
    * them. */
  private def twoPhaseTopK(scored: DataFrame, k: Int,
                           scoreCol: String = "cosine"): DataFrame = {
    val local = Window
      .partitionBy(col("query_id"), spark_partition_id())
      .orderBy(col(scoreCol).desc, col("vec_id").asc)
    val global = Window.partitionBy(col("query_id"))
      .orderBy(col(scoreCol).desc, col("vec_id").asc)
    scored
      .filter(col(scoreCol).isNotNull)
      .withColumn("lrn", row_number().over(local)).filter(col("lrn") <= k)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col(scoreCol))
  }

  /** Aggregator-based top-k: one shuffle, map-side partial top-k — each
    * scan partition contributes at most k candidates per query to the
    * exchange (see TopKAggregator). Same result set as the window
    * formulation (asserted in SimilaritySpec). */
  def topKViaAggregator(scored: DataFrame, k: Int): DataFrame = {
    import graft.functions.TopKAggregator
    import scored.sparkSession.implicits._
    // Requires bigint query_id/vec_id and a double cosine. Null scores
    // (null embeddings) are excluded from ranking — the primitive-Double
    // encoder would NPE on them otherwise.
    scored.select(col("query_id"), col("vec_id"), col("cosine"))
      .filter(col("cosine").isNotNull)
      .as[(Long, Long, Double)]
      .map { case (q, v, c) => (q, TopKAggregator.Scored(v, c)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopKAggregator.topK(k).toColumn.name("top"))
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case (s, i) => (qid, i + 1, s.id, s.score) }
      }
      .toDF("query_id", "rank", "vec_id", "cosine")
  }

  /** Brute-force exact top-k neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                     idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val scored = scatter(corpus.select(col(idCol), col(vecCol).as("cv")))
      .crossJoin(q)
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosineRounded(col("qv"), col("cv")))
      .withColumnRenamed(idCol, "vec_id") // twoPhaseTopK's fixed output name
    twoPhaseTopK(scored, k)
  }

  /** IVF-bucketed ANN: search only the query's own coarse cell. Ranking
    * goes through the bounded TopKAggregator (single shuffle, map-side
    * partial top-k) — the other ranking shape, also oracle-verified. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int = 5,
              cellCol: String = "label", idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(cellCol), col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val scored = scatter(corpus.select(col(cellCol), col(idCol),
        col(vecCol).as("cv")))
      .join(q, Seq(cellCol))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosineRounded(col("qv"), col("cv")))
      .withColumnRenamed(idCol, "vec_id")
    topKViaAggregator(scored, k)
  }

  /** Deterministic ±1 hyperplane weights: plane p, dimension d weight is
    * the parity of md5("p:d")'s first byte — any engine (or plain Scala,
    * used here) derives the identical plane. Materialized as literals so
    * both the Spark plan and an external oracle evaluate the same
    * constants. */
  def planeWeights(planes: Int, dims: Int): Seq[Array[Int]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until planes).map { p =>
      Array.tabulate(dims) { d =>
        val h = digest.digest(s"$p:$d".getBytes("UTF-8"))
        ((h(0) & 0xff) % 2) * 2 - 1
      }
    }
  }

  /** SQ8 scalar quantization: each vector is L2-normalized and its
    * components rounded to int8 range [-127, 127]. At 100 TB of
    * embeddings this is THE storage/IO lever — the quantized corpus is 4×
    * smaller than float32 (and 8× smaller than the promoted doubles),
    * which is the difference between an in-memory scan and a spilling
    * one; distances become exact BIGINT integer arithmetic, so scores are
    * bitwise-stable under any partitioning or retry (no float reduction-
    * order drift) and SIMD-friendly on the executor. Quantization itself
    * is a narrow codegen'd map, computed once at write time in a real
    * deployment.
    *
    * Determinism contract: the fold order of the norm (left-to-right over
    * the array), the round-half-up `floor(x/l2*127 + 0.5)`, and the
    * float→double promotion are each IEEE-exact and identically ordered
    * in Spark and the DuckDB oracle, so the quantized codes — and hence
    * every downstream integer score — match bitwise across engines. */
  def sq8Quantize(emb: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  keep: Seq[String] = Nil): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val l2 = sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))
    emb.select(
      (col(idCol) +: keep.map(col)) :+
      when(l2 === 0.0d, expr(s"transform(cast($vecCol as array<double>), x -> 0L)"))
        .otherwise(transform(v, x =>
          floor(x / l2 * lit(127.0d) + lit(0.5d)).cast("long")))
        .as("qv"): _*)
  }

  /** SQ8 brute-force top-k: rank candidates by the integer dot product of
    * int8 codes (≈ 127² × cosine). Same two-phase ranking as
    * [[bruteForceTopK]], but the score is exact BIGINT — no rounding
    * contract needed for cross-engine stability. Recall vs the float
    * exact scan is pinned in Sq8Spec. */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int = 5,
              idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val q = broadcast(sq8Quantize(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("qv").as("qq")))
    val c = scatter(sq8Quantize(corpus, idCol, vecCol)
      .select(col(idCol).as("vec_id"), col("qv").as("cq")))
    val scored = c.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("dot_q",
        aggregate(zip_with(col("qq"), col("cq"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
    twoPhaseTopK(scored, k, scoreCol = "dot_q")
  }

  /** SQ8 × IVF composition — the production ANN operating point: prune
    * the scan to the query's coarse cell AND score int8 codes with exact
    * BIGINT dots. Cell pruning cuts scanned rows to 1/cells, SQ8 cuts
    * bytes-per-row 4× — the two levers multiply, and the ranking stays
    * bitwise-deterministic (integer scores, id tie-break). */
  def sq8IvfTopK(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                 cellCol: String = "label", idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(sq8Quantize(queries, idCol, vecCol, keep = Seq(cellCol))
      .select(col(cellCol), col(idCol).as("query_id"), col("qv").as("qq")))
    val c = scatter(sq8Quantize(corpus, idCol, vecCol, keep = Seq(cellCol))
      .select(col(cellCol), col(idCol).as("vec_id"), col("qv").as("cq")))
    val scored = c.join(q, Seq(cellCol))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("dot_q",
        aggregate(zip_with(col("qq"), col("cq"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
    twoPhaseTopK(scored, k, scoreCol = "dot_q")
  }

  /** [[sq8IvfTopK]] over a cell-PARTITIONED corpus layout — the flat-
    * growth production form (SCALE.md §round-9 growth: flat 2k→100k
    * vectors, vs a linear O(N) scan term for the unpartitioned corpus).
    *
    * [[sq8IvfTopK]]'s broadcast-probe join never shuffles the corpus but
    * still READS all N rows each search. The fix is layout, not plan:
    * store the celled corpus hive-partitioned on the cell column
    * (`Sinks.parquet(celled, path, partitionBy = Seq(cellCol))`, the
    * write-once step of the index build) and restrict the scan to the
    * query batch's cells — a STATIC partition filter the parquet source
    * turns into file pruning, so the search reads ~|query cells| / cells
    * of the corpus. The restriction is lossless: the candidate join is an
    * equi-join on the cell, so rows outside the query cells contribute
    * nothing (result-equality with [[sq8IvfTopK]] pinned in
    * Sq8IvfPrunedSpec, along with the PartitionFilters/files-read
    * assertion).
    *
    * The query-cell collect is a bounded driver round — ≤ one scalar per
    * query vector, the same honest O(|queries|) traffic the probe
    * broadcast already carries — and is the price of making the prune
    * visible to the compiler as a literal IN over the partition column.
    * Works unchanged on an unpartitioned corpus (the filter then runs as
    * a rowgroup-level predicate — correct, just without the IO win). */
  def sq8IvfTopKPruned(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                       cellCol: String = "label", idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val qCells = queries.select(col(cellCol)).distinct()
      .collect().map(_.get(0)).toSeq
    sq8IvfTopK(queries,
      corpus.filter(col(cellCol).isInCollection(qCells)),
      k, cellCol, idCol, vecCol)
  }

  /** Random-hyperplane (sign) LSH signatures: `planes` deterministic
    * hyperplanes ([[planeWeights]]); bit p of the signature is the sign of
    * ⟨v, plane_p⟩. Vectors sharing a signature land in one bucket →
    * candidate set for ANN at corpus scale. Pass `dims` explicitly (every
    * production embedding column has a known dimensionality); the first-row
    * probe is a FALLBACK only — it runs a driver-side job during plan
    * construction, which no oracle-checked query path does. */
  def signLsh(emb: DataFrame, planes: Int = 16, idCol: String = "vec_id",
              vecCol: String = "embedding", dims: Int = -1): DataFrame = {
    // one long holds the signature; `1L << p` would silently alias past 63
    require(planes >= 1 && planes <= 64, s"planes must be 1..64, got $planes")
    val d = if (dims > 0) dims else {
      val probe = emb
        .select(size(col(vecCol)).as("_d")).filter(col("_d") > 0)
        .head(1)
      require(probe.nonEmpty, s"signLsh: cannot infer dims — no row with " +
        s"a non-empty '$vecCol' array; pass dims explicitly")
      probe(0).getInt(0)
    }
    // codegen'd dot (bitwise twin of the HOF formulation — see
    // VectorFunctions.dot): `planes` interpreted lambda walks per row was
    // the top CPU term of the sign-LSH consumers (multimodal_neardup task
    // CPU 4.6 s warm at sf0.1 before the swap)
    val sigBits = planeWeights(planes, d).zipWithIndex.map { case (w, p) =>
      val dot = graft.functions.VectorFunctions.dot(col(vecCol), lit(w))
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    emb.select(col(idCol), sigBits.as("lsh_sig"))
  }

  /** Banded sign-LSH: `tables` independent hash tables of `planesPerTable`
    * hyperplanes each. One table of b bits finds a near-dup pair (angle θ)
    * with probability (1-θ/π)^b; ANY-of-`tables` boosts recall to
    * 1-(1-p)^tables while each bucket stays selective — the same (b,r)
    * trade MinHash banding makes. Output (id, table, sig). */
  def signLshBanded(emb: DataFrame, tables: Int = 4, planesPerTable: Int = 8,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    dims: Int = -1): DataFrame = {
    require(planesPerTable >= 1 && planesPerTable <= 63,
      s"planesPerTable must be 1..63, got $planesPerTable") // mask uses 1L<<b
    require(tables * planesPerTable <= 64,
      s"tables*planesPerTable must fit one long signature, " +
        s"got ${tables * planesPerTable}")
    val all = signLsh(emb, tables * planesPerTable, idCol, vecCol, dims)
    val mask = (1L << planesPerTable) - 1
    all.select(col(idCol), col("lsh_sig"),
        explode(expr(s"sequence(0, ${tables - 1})")).as("table"))
      .withColumn("sig",
        expr(s"shiftright(lsh_sig, table * $planesPerTable) & $mask"))
      .select(col(idCol), col("table"), col("sig"))
  }

  /** Incremental embedding admission candidates: a NEW batch of vectors
    * checked against an EXISTING corpus by joining the delta's banded
    * sign-LSH bucket keys against the base's — strictly delta×base,
    * never delta×delta or base×base. The embedding-modality twin of
    * [[Dedup.incrementalCandidates]]: at 100 TB the base side is the
    * (id, table, sig) signature STORE persisted once per corpus snapshot
    * (bucketed by (table, sig) it contributes no shuffle to the join),
    * so admitting a day's embeddings costs O(delta) hashing plus one
    * bucket-keyed join, independent of corpus size. Output
    * (new_id, dup_of) feeds the exact rounded-cosine verify. */
  def incrementalCandidates(base: DataFrame, delta: DataFrame,
                            tables: Int = 4, planesPerTable: Int = 8,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            dims: Int = -1): DataFrame = {
    val bs = signLshBanded(base, tables, planesPerTable, idCol, vecCol, dims)
      .select(col("table"), col("sig"), col(idCol).as("dup_of"))
    val ds = signLshBanded(delta, tables, planesPerTable, idCol, vecCol, dims)
      .select(col("table"), col("sig"), col(idCol).as("new_id"))
    ds.join(bs, Seq("table", "sig"))
      .select(col("new_id"), col("dup_of"))
      .distinct()
  }

  /** Materialize the corpus's banded sign-LSH signatures as a persisted
    * EMBEDDING SIGNATURE STORE — the artifact [[incrementalCandidates]]'s
    * scaladoc promises at 100 TB, now with the same lifecycle the text
    * side grew in r15-16: a managed parquet table of (table, sig, idCol)
    * bucketed AND sorted by (table, sig), so daily admission band-joins
    * read it with NO base-side shuffle and never re-hash the corpus. */
  def writeSignatureStore(emb: DataFrame, table: String, tables: Int = 4,
                          planesPerTable: Int = 8, idCol: String = "vec_id",
                          vecCol: String = "embedding", dims: Int = -1,
                          buckets: Int = 64): Unit =
    graft.io.Sinks.bucketedTable(
      signLshBanded(emb, tables, planesPerTable, idCol, vecCol, dims)
        .select(col("table"), col("sig"), col(idCol)),
      table, Seq("table", "sig"), buckets)

  /** Store-reading overload of [[incrementalCandidates]]: the base side
    * is an already-built (table, sig, idCol) signature frame —
    * `spark.table` over a [[writeSignatureStore]] snapshot (bucketed
    * scan, zero base-side hashing or shuffle). Admission cost is
    * O(delta) hashing plus one bucket-keyed join, independent of corpus
    * size. */
  def incrementalCandidatesFromStore(sigStore: DataFrame, delta: DataFrame,
                                     tables: Int = 4,
                                     planesPerTable: Int = 8,
                                     idCol: String = "vec_id",
                                     vecCol: String = "embedding",
                                     dims: Int = -1): DataFrame = {
    val bs = sigStore.select(col("table"), col("sig"),
      col(idCol).as("dup_of"))
    val ds = signLshBanded(delta, tables, planesPerTable, idCol, vecCol,
        dims)
      .select(col("table"), col("sig"), col(idCol).as("new_id"))
    ds.join(bs, Seq("table", "sig"))
      .select(col("new_id"), col("dup_of"))
      .distinct()
  }

  /** Fold an admitted delta's signatures into the persisted embedding
    * store — tomorrow's delta must band-join against today's arrivals.
    * Bucket count read from the catalog so appends cannot drift from
    * the store's layout (the [[graft.ext.Dedup.appendToSignatureStore]]
    * discipline). */
  def appendToSignatureStore(delta: DataFrame, table: String,
                             tables: Int = 4, planesPerTable: Int = 8,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             dims: Int = -1): Unit = {
    val spark = delta.sparkSession
    val buckets = org.apache.spark.sql.GraftShims
      .tableBuckets(spark, table)
      .getOrElse(throw new IllegalArgumentException(
        s"appendToSignatureStore: `$table` is not a bucketed store"))
    signLshBanded(delta, tables, planesPerTable, idCol, vecCol, dims)
      .select(col("table"), col("sig"), col(idCol))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(buckets, "table", "sig").sortBy("table", "sig")
      .format("parquet").saveAsTable(table)
  }

  /** HARD-DELETE vectors from the embedding signature store — the
    * compliance/retention exit path, twin of
    * [[graft.ext.Dedup.retireFromSignatureStore]] (same checked
    * staged-swap commit, same reinstate side re-hashing live sibling
    * VECTORS whose bucket rows earlier maintenance may have dropped,
    * same anti-join so a reinstate can never resurrect a retired id).
    *
    * No compaction counterpart is offered for THIS store, by design:
    * the text store's compaction is lossless because its admission
    * consumers contract every store-side endpoint to its cluster label
    * before anything reads the edge — but embedding admission verifies
    * candidates by COSINE AGAINST THE WITNESS VECTOR (`dup_of` names
    * whose embedding gets compared), and near-dup cluster members are
    * not interchangeable under that verify: a new vector can clear the
    * threshold against a dropped sibling yet miss against the kept
    * representative. Until an embedding pipeline contracts to labels
    * pre-verify, a compacted store would silently change admissions —
    * so the store stays one row per (table, sig, vector) and growth is
    * bounded by retiring + snapshot rebuilds instead. */
  def retireFromSignatureStore(spark: org.apache.spark.sql.SparkSession,
                               table: String, retired: DataFrame,
                               idCol: String = "vec_id",
                               reinstate: Option[DataFrame] = None,
                               tables: Int = 4, planesPerTable: Int = 8,
                               vecCol: String = "embedding",
                               dims: Int = -1): Unit = {
    val buckets = org.apache.spark.sql.GraftShims
      .tableBuckets(spark, table)
      .getOrElse(throw new IllegalArgumentException(
        s"retireFromSignatureStore: `$table` is not a bucketed store"))
    val retiredIds = retired.select(col(idCol))
    val kept = spark.table(table)
      .join(broadcast(retiredIds), Seq(idCol), "left_anti")
      .select(col("table"), col("sig"), col(idCol))
    val purged = reinstate match {
      case None => kept
      case Some(emb) =>
        kept.unionByName(
            signLshBanded(emb, tables, planesPerTable, idCol, vecCol, dims)
              .select(col("table"), col("sig"), col(idCol))
              .join(broadcast(retiredIds), Seq(idCol), "left_anti")
              .select(col("table"), col("sig"), col(idCol)))
          .distinct()
    }
    graft.io.Sinks.replaceBucketedTable(
      purged, table, Seq("table", "sig"), buckets)
  }

  /** Embedding near-duplicates via banded sign-LSH: candidate pairs share
    * at least one table's bucket, then the exact (rounded) cosine filter
    * keeps true near-dups. The hash-bucketed alternative to the IVF-cell
    * pairing in Dedup.embeddingNearDup — no trained structure needed, and
    * bucket sizes are probabilistically bounded regardless of data skew.
    *
    * Pair generation runs at DISTINCT-VECTOR grain — the content-addressed
    * trick at embedding granularity. Near-dup corpora carry heavy
    * exact-duplicate vector mass (the multimodal fixture: 5,000 ids over
    * 50 distinct pixel-feature vectors), and both the LSH signature and
    * the pair cosine are pure functions of the VECTOR — so identical
    * vectors are grouped first (one hash-agg; the group id is the minimum
    * member id), banding + cosine filtering pair only group
    * representatives, and surviving group pairs expand back to id pairs.
    * The candidate stage thus scales with |distinct vectors|², never
    * corpus²: the id-grain formulation generated ~4M candidate pairs on
    * the multimodal corpus at sf0.1 (every copy × every copy, landing in
    * a handful of skewed buckets whose explode ran effectively
    * single-core); the rep-grain stage generates ≤ 50²/2. The expansion
    * is at RESULT grain — its output IS the answer set, which no
    * formulation can shrink. Result-identical to the id-grain pairing:
    * identical vectors share every table's signature, so a group-pair
    * collides iff its members collided, within-group pairs (cosine
    * computed, not assumed — zero vectors yield null cosine and drop, as
    * before) are exactly the identical-id pairs, and least/greatest
    * restores the id_a < id_b orientation. The cosine filter also runs
    * BEFORE the final exchange (filter-then-distinct ≡
    * distinct-then-filter for a pair-pure function), so candidate pairs
    * never cross a shuffle. Pinned by SimilaritySpec and the
    * multimodal/sim oracle entries. */
  def nearDupLsh(emb: DataFrame, threshold: Double = 0.9, tables: Int = 4,
                 planesPerTable: Int = 8, idCol: String = "vec_id",
                 vecCol: String = "embedding", dims: Int = -1): DataFrame = {
    // scratch-persisted (the setsim precedent): the grouped table feeds
    // FIVE consumers (signature build, bucket vec join, both expansion
    // sides, within-group pairs) — without it each consumer re-scans the
    // corpus and re-runs the group hash-agg. Released by the runner after
    // the query's action (Dedup.releaseScratch).
    val groups = Dedup.persistScratch(emb.select(col(idCol), col(vecCol))
      .groupBy(col(vecCol))
      .agg(sort_array(collect_set(col(idCol))).as("gids"))
      .withColumn("gid", col("gids").getItem(0)))
    val reps = groups.select(col("gid"), col(vecCol))
    val sigs = signLshBanded(reps, tables, planesPerTable, "gid", vecCol,
        dims)
      .join(reps, Seq("gid"))
    // also scratch-persisted: the direct/chunked branch split below reads
    // the bucket table twice
    val buckets = Dedup.persistScratch(sigs
      .groupBy(col("table"), col("sig"))
      .agg(sort_array(collect_set(
        struct(col("gid").as("id"), col(vecCol).as("v")))).as("elems"))
      .filter(size(col("elems")) > 1))
    // Explicit repartition (fixed N, so AQE leaves it alone): bucket rows
    // are a few KB of bytes but carry Σ|bucket|² of downstream explode +
    // cosine work — AQE's size-based coalescing would fold the pair stage
    // onto one reducer. The exchange moves only compact bucket lists.
    val n = buckets.sparkSession.sessionState.conf.numShufflePartitions
    def pairCosine(exploded: DataFrame): DataFrame = exploded
      .withColumn("cosine", cosineRounded(col("a.v"), col("b.v")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("gid_a"), col("b.id").as("gid_b"),
        col("cosine"))
    // A HOT bucket (a signature most of the corpus collapses into — e.g.
    // low-dim all-positive vectors agree with most hyperplanes) would run
    // its entire |bucket|² pair scan on one core no matter how buckets
    // are spread — and the two-explode shape is worse than slow there:
    // whole-stage codegen BUFFERS one input row's whole expansion in the
    // stage's append list, O(m·|elems|) bytes for a bucket row (the r10
    // block-row variant of this path OOMed an 8 g heap at m≈3200 in the
    // round-11 adversarial-skew growth run — ~41k buffered block rows of
    // ~70 KB from ONE bucket row). Hot buckets therefore run a blocked
    // GRID self-join: explode to element rows ONCE (no array retained —
    // per-input expansion is one light row), tag each element with its
    // position chunk, replicate it to the ~m/blk upper-triangle grid
    // cells it participates in, and join on (table, sig, ca, cb) — every
    // cell an independent hash key, so the m² cosine work spreads across
    // the cluster, per-task memory is O(blk), and pairs STREAM out of
    // the join. Small buckets keep the direct two-explode path (bounded
    // by hotBucket·|elems| per buffered row; no extra exchange — for
    // healthy banding the grid would add a shuffle for nothing).
    // shared with the signature-bucket path: tuning the hot threshold or
    // chunk width must move both implementations together
    val hotBucket = Dedup.hotBucketSize
    val blk = Dedup.gridBlk
    val direct = buckets.filter(size(col("elems")) < hotBucket)
      .repartition(n, col("table"), col("sig"))
      .select(col("elems"), posexplode(col("elems")).as(Seq("i", "a")))
      .select(col("a"), explode(
        slice(col("elems"), col("i") + lit(2), size(col("elems")))).as("b"))
    val hotEl = buckets.filter(size(col("elems")) >= hotBucket)
      .select(col("table"), col("sig"),
        ((size(col("elems")) - 1) / blk).cast("int").as("mc"),
        posexplode(col("elems")).as(Seq("i", "e")))
      .withColumn("c", (col("i") / blk).cast("int"))
    val gridKeys = Seq(col("table"), col("sig"), col("ca"), col("cb"))
    val hotA = hotEl.select(col("table"), col("sig"), col("c").as("ca"),
        explode(sequence(col("c"), col("mc"))).as("cb"),
        col("i").as("ia"), col("e").as("a"))
      .repartition(n, gridKeys: _*)
    val hotB = hotEl.select(col("table"), col("sig"),
        explode(sequence(lit(0), col("c"))).as("ca"),
        col("c").as("cb"), col("i").as("ib"), col("e").as("b"))
      .repartition(n, gridKeys: _*)
    val chunked = hotA.join(hotB, Seq("table", "sig", "ca", "cb"))
      .filter(col("ia") < col("ib")) // strict upper triangle (diag cells)
      .select(col("a"), col("b"))
    val repPairs = pairCosine(direct).unionByName(pairCosine(chunked))
      .distinct()
    val cross = repPairs
      .join(groups.select(col("gid").as("gid_a"), col("gids").as("ids_a")),
        "gid_a")
      .join(groups.select(col("gid").as("gid_b"), col("gids").as("ids_b")),
        "gid_b")
      .select(explode(col("ids_a")).as("x"), col("ids_b"), col("cosine"))
      .select(col("x"), explode(col("ids_b")).as("y"), col("cosine"))
      .select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"), col("cosine"))
    val within = groups.filter(size(col("gids")) > 1)
      .withColumn("cosine", cosineRounded(col(vecCol), col(vecCol)))
      .filter(col("cosine") >= threshold)
      .select(col("gids"), col("cosine"),
        posexplode(col("gids")).as(Seq("i", "id_a")))
      .select(col("id_a"), explode(
        slice(col("gids"), col("i") + lit(2), size(col("gids"))))
        .as("id_b"), col("cosine"))
      .select(col("id_a"), col("id_b"), col("cosine"))
    // no distinct over the union: repPairs is already distinct at group
    // grain, each group pair expands each id pair once, and cross ∩
    // within = ∅ (different vs same group)
    cross.unionByName(within)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with a trained k-means
    * quantizer, compare embeddings ONLY within their cell, and drop every
    * vector that has a τ-cosine neighbor with a smaller id in the same
    * cell — so exactly one exemplar (the minimum id) survives out of each
    * within-cell duplicate chain, deterministically (the paper keeps a
    * random exemplar; min-id is the seedless equivalent).
    *
    * Scale: the pair stage is a self-join ON CELL — Σ|cell|² work, never
    * corpus², and at 100 TB you raise `cells` to hold |cell| constant
    * (the paper runs 50k clusters); a hot cell is an AQE skew-join split,
    * and the final keep/drop is one left-anti-shaped join at id grain.
    * Output: (vec_id, cell, kept) for every input vector. */
  def semanticDedup(index: Ivf.Index, tau: Double,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val a = index.assignments
      .select(col("cell"), col(idCol).as("a_id"), col(vecCol).as("av"))
    val b = index.assignments
      .select(col("cell"), col(idCol).as("b_id"), col(vecCol).as("bv"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .filter(cosineRounded(col("av"), col("bv")) >= tau)
      .select(col("b_id").as(idCol)).distinct()
      .withColumn("dropped", lit(true))
    index.assignments.select(col(idCol), col("cell"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        col("dropped").isNull.as("kept"))
  }
}
