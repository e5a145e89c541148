package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def randVec(seed: Int, dim: Int = 16): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextGaussian().toFloat)
  }

  private val corpus = (0L until 50L).map(i =>
    (i, (i % 3).toInt, randVec(i.toInt))).toDF("vec_id", "label", "embedding")

  test("bruteForceTopK: an identical vector ranks first with cosine 1.0") {
    val dup = Seq((999L, 0, randVec(7))).toDF("vec_id", "label", "embedding")
    val all = corpus.union(dup)
    val top = Similarity.bruteForceTopK(all.filter($"vec_id" === 7L), all)
      .filter($"rank" === 1).head()
    assert(top.getAs[Long]("vec_id") == 999L)
    assert(top.getAs[Double]("cosine") == 1.0)
  }

  test("two-phase top-k equals a naive global ranking") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions
    val queries = corpus.filter($"vec_id" < 3)
    val got = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)]
      .collect().toSet
    val naive = corpus.select($"vec_id", $"embedding".as("cv"))
      .crossJoin(queries.select($"vec_id".as("query_id"), $"embedding".as("qv")))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cosine", VectorFunctions.cosineRounded($"qv", $"cv"))
      .withColumn("rank", row_number().over(Window.partitionBy($"query_id")
        .orderBy($"cosine".desc, $"vec_id".asc)))
      .filter($"rank" <= 5)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(got == naive)
  }

  test("unscoreable (zero-norm) corpus vectors never pad a short top-k") {
    // 3-vector corpus, one zero-norm → each query has only 2 scoreable
    // candidates; with k = 5 the window path must return 2 ranked rows
    // (as the aggregator path does), not a rank-3 row with NULL cosine
    val tiny = Seq(
      (1L, 0, Array(1f, 0f)), (2L, 0, Array(0.9f, 0.1f)),
      (3L, 0, Array(0f, 0f)),
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.bruteForceTopK(tiny.filter($"vec_id" === 1L), tiny,
      k = 5)
    assert(out.filter($"cosine".isNull).count() == 0)
    assert(out.count() == 1) // vec 2 only: vec 3 is unscoreable
  }

  test("aggregator top-k equals the window formulation") {
    import graft.functions.VectorFunctions
    val queries = corpus.filter($"vec_id" < 3)
    val scored = corpus.select($"vec_id", $"embedding".as("cv"))
      .crossJoin(broadcast(queries.select($"vec_id".as("query_id"),
        $"embedding".as("qv"))))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cosine", VectorFunctions.cosineRounded($"qv", $"cv"))
    val viaAgg = Similarity.topKViaAggregator(scored, 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val viaWindow = Similarity.bruteForceTopK(queries, corpus, 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("ivfTopK searches only the query's cell") {
    val res = Similarity.ivfTopK(corpus.filter($"vec_id" === 0L), corpus)
      .join(corpus.select($"vec_id", $"label".as("nlabel")), Seq("vec_id"))
    assert(res.filter($"nlabel" =!= 0).isEmpty)
  }

  test("banded sign-LSH near-dup finds identical and near-identical vectors") {
    val base = randVec(7)
    val near = base.clone(); near(0) = near(0) + 0.01f // tiny perturbation
    val dup = Seq((990L, 0, base), (991L, 0, near)).toDF(
      "vec_id", "label", "embedding")
    val pairs = Similarity.nearDupLsh(corpus.union(dup), threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((7L, 990L)))  // identical: every table collides
    assert(pairs.contains((990L, 991L)) || pairs.contains((7L, 991L)))
    // no pair below the cosine threshold survives
    val cos = Similarity.nearDupLsh(corpus.union(dup), threshold = 0.9)
      .select("cosine").as[Double].collect()
    cos.foreach(c => assert(c >= 0.9))
  }

  test("incrementalClusters composes with the embedding LSH family") {
    // Dedup.incrementalClusters is representation-agnostic: any
    // (baseClusters, new_id→dup_of candidates) pair folds in, so the
    // embedding admission path reuses it verbatim. Base: an
    // identical-vector pair {1,2} plus distinct vectors; delta: vec 50
    // duplicates the pair's vector (must admit into cluster 1) and
    // vec 51 is the NEGATED base vector — opposite sign on every
    // hyperplane, so it collides with nothing and stays out.
    val vA = randVec(101)
    val base = Seq((1L, vA), (2L, vA), (3L, randVec(202)),
      (4L, randVec(303))).toDF("vec_id", "embedding")
    val delta = Seq((50L, vA), (51L, vA.map(x => -x)))
      .toDF("vec_id", "embedding")
    val basePairs = Similarity.nearDupLsh(base, threshold = 0.9)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      .localCheckpoint(false)
    val baseClusters = Dedup.connectedComponents(basePairs)
    val cand = Similarity.incrementalCandidates(base, delta)
      .localCheckpoint(false)
    val got = Dedup.incrementalClusters(baseClusters, cand)
      .as[(Long, Long)].collect()
    val ground = Dedup.connectedComponents(basePairs.unionByName(
        cand.select(col("new_id").as("doc_a"), col("dup_of").as("doc_b"))))
      .as[(Long, Long)].collect().toMap
    Dedup.releaseScratch()
    assert(got.length == got.toSet.size)
    assert(got.toMap == ground)
    assert(got.toMap.get(50L).contains(1L), s"got ${got.toMap}")
    assert(!got.toMap.contains(51L))
  }

  test("embedding signature store: store-path admission equals recompute; " +
       "append admits tomorrow's twin; retire never reappears") {
    val tbl = "emb_sig_store_spec"
    val vA = randVec(101)
    val base = Seq((1L, vA), (2L, vA), (3L, randVec(202)))
      .toDF("vec_id", "embedding")
    Similarity.writeSignatureStore(base, tbl, buckets = 4)
    val delta = Seq((50L, vA)).toDF("vec_id", "embedding")
    def candFromStore(d: org.apache.spark.sql.DataFrame) =
      Similarity.incrementalCandidatesFromStore(spark.table(tbl), d)
        .as[(Long, Long)].collect().toSet
    val fromStore = candFromStore(delta)
    val recompute = Similarity.incrementalCandidates(base, delta)
      .as[(Long, Long)].collect().toSet
    assert(fromStore == recompute &&
      fromStore.contains((50L, 1L)) && fromStore.contains((50L, 2L)),
      s"store $fromStore recompute $recompute")

    // day 2: a twin of the admitted vector must see day 1's arrival
    Similarity.appendToSignatureStore(delta, tbl)
    val cand2 = candFromStore(Seq((60L, vA)).toDF("vec_id", "embedding"))
    assert(cand2.contains((60L, 50L)), s"append not visible: $cand2")

    // retire 1 (reinstating live sibling 2 exercises the anti-join +
    // distinct mechanics — its rows are already present and must not
    // duplicate); the retired id never reappears as dup_of
    val rows2 = spark.table(tbl).filter(col("vec_id") === 2L).count()
    Similarity.retireFromSignatureStore(spark, tbl,
      Seq(1L).toDF("vec_id"),
      reinstate = Some(base.filter(col("vec_id") === 2L)))
    assert(spark.table(tbl).filter(col("vec_id") === 1L).count() == 0)
    assert(spark.table(tbl).filter(col("vec_id") === 2L).count() == rows2,
      "reinstating an already-present sibling must not duplicate rows")
    val cand3 = candFromStore(Seq((70L, vA)).toDF("vec_id", "embedding"))
    assert(!cand3.exists(_._2 == 1L), s"retired id resurfaced: $cand3")
    assert(cand3.contains((70L, 2L)) && cand3.contains((70L, 50L)), cand3)
    // bucketed layout survived the retire rewrite
    assert(org.apache.spark.sql.GraftShims.tableBuckets(spark, tbl)
      .contains(4))
    spark.sql(s"DROP TABLE `$tbl`")
  }

  test("nearDupLsh hot-bucket chunked path equals brute force (one giant bucket)") {
    // 600 distinct vectors = base + per-id tiny perturbations, all with
    // pairwise cosine ≈ 1: every vector lands in the SAME signature bucket
    // of every table (identical hyperplane signs), which is exactly the
    // degenerate shape the >= hotBucket(512) block-chunked pair path
    // exists for. Expected output under a generous threshold: ALL C(600,2)
    // pairs — pinning that the chunk boundaries lose no pair and duplicate
    // none. A second corpus built from 3 distinct vectors × 200 copies
    // each pins the group-expansion arithmetic (within + cross counts).
    val base = randVec(7)
    val many = (0L until 600L).map { i =>
      val v = base.clone(); v(0) = v(0) + i.toFloat * 1e-5f
      (i, 0, v)
    }.toDF("vec_id", "label", "embedding")
    val n = Similarity.nearDupLsh(many, threshold = 0.5).count()
    assert(n == 600L * 599L / 2, s"expected all pairs, got $n")

    val copies = (0L until 600L).map(i =>
      (i, 0, randVec((i % 3L).toInt))).toDF("vec_id", "label", "embedding")
    val pairs = Similarity.nearDupLsh(copies, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // identical-vector groups of 200: within-group pairs only (the 3
    // random 16-dim directions are far apart), each pair exactly once
    assert(pairs.length == 3 * (200 * 199 / 2))
    assert(pairs.distinct.length == pairs.length)
    pairs.foreach { case (a, b) =>
      assert(a < b && (a % 3) == (b % 3), s"bad pair ($a,$b)") }
  }

  test("signLsh is deterministic and bucket-compatible for identical vectors") {
    val dup = Seq((999L, 0, randVec(7))).toDF("vec_id", "label", "embedding")
    val sigs = Similarity.signLsh(corpus.union(dup))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = Similarity.signLsh(corpus.union(dup))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs == again)          // deterministic across runs
    assert(sigs(7L) == sigs(999L)) // identical vectors share every plane sign
  }

  test("sq8Quantize: codes are int8-ranged; zero vector maps to all zeros") {
    val withZero = corpus.union(
      Seq((998L, 0, Array.fill(16)(0.0f))).toDF("vec_id", "label", "embedding"))
    val codes = Similarity.sq8Quantize(withZero)
      .select($"vec_id", $"qv").as[(Long, Seq[Long])].collect().toMap
    codes.values.foreach(qv =>
      qv.foreach(q => assert(q >= -127L && q <= 127L, s"code out of range: $q")))
    assert(codes(998L).forall(_ == 0L))
    // a unit-norm direction survives quantization at full scale
    assert(codes.values.exists(_.exists(q => math.abs(q) > 64L)))
  }

  test("sq8TopK: identical vector ranks first; recall@5 vs exact >= 0.8") {
    val dup = Seq((999L, 0, randVec(7))).toDF("vec_id", "label", "embedding")
    val all = corpus.union(dup)
    val top = Similarity.sq8TopK(all.filter($"vec_id" === 7L), all)
      .filter($"rank" === 1).head()
    assert(top.getAs[Long]("vec_id") == 999L)

    val queries = corpus.filter($"vec_id" < 10)
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)]
        .collect().groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(queries, corpus, k = 5))
    val sq8 = topSets(Similarity.sq8TopK(queries, corpus, k = 5))
    val recall = exact.map { case (q, ids) =>
      (sq8(q) & ids).size.toDouble / ids.size }.sum / exact.size
    assert(recall >= 0.8, s"SQ8 recall@5 too low: $recall")
  }

  test("incremental candidates (embedding): delta vs base only") {
    // 999 duplicates base vector 7; 998 duplicates fellow-delta 999 —
    // the delta×delta pair must NOT surface (DedupSpec's property,
    // mirrored on the embedding modality)
    val base = corpus // ids 0..49
    val delta = Seq(
      (999L, 0, randVec(7)),
      (998L, 0, randVec(7)),
      (997L, 0, randVec(123456)),
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.incrementalCandidates(base, delta, dims = 16)
      .select("new_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(out.contains((999L, 7L)))   // identical vector → every bucket
    assert(out.contains((998L, 7L)))
    assert(!out.exists(p => p._1 > 900L && p._2 > 900L)) // no delta×delta
    assert(!out.exists(_._1 <= 49L))                     // no base on the left
  }
}
