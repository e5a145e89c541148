package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and AGAIN"), // near-dup
    (4L, "completely different content talking about spark query engines"),
  ).toDF("doc_id", "text")

  test("exactGroups finds duplicate texts, keeps min id") {
    val g = Dedup.exactGroups(docs).filter($"copies" > 1).collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("copies") == 2)
    assert(g.head.getAs[Long]("keep_id") == 1L)
  }

  test("exactDedup keeps one row per text") {
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("minhash LSH pairs exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashCandidates(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))      // identical docs always collide
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated excluded
  }

  test("collapsed candidates equal the direct path, each pair emitted once") {
    // skew30-shaped corpus: a hot class of pairwise-DISTINCT texts whose
    // shared body dominates every minhash min (identical signatures — the
    // case exactGroups cannot collapse), an exact-dup class, and distinct
    // background docs. The collapsed path must reproduce the direct
    // candidate set EXACTLY, without a corpus-scale distinct: no pair may
    // appear twice in its raw output.
    val hotBody = (0 until 40).map(i => s"hotword${i % 7}").mkString(" ")
    val hot = (100L until 120L).map(i => (i, s"$hotBody tail $i"))
    val exact = (200L until 210L).map(i =>
      (i, "an exactly repeated document body for the exact class test"))
    val bg = (300L until 330L).map(i =>
      (i, s"background document number $i with distinct content " +
        s"about topic${i % 13} and subject${i % 11} material"))
    val corpus = (hot ++ exact ++ bg).toDF("doc_id", "text")
    val direct = Dedup.minhashCandidates(corpus)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    Dedup.releaseScratch()
    val collapsedRows = Dedup.minhashCandidatesCollapsed(corpus)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    Dedup.releaseScratch()
    assert(collapsedRows.length == collapsedRows.toSet.size,
      "collapsed path emitted a pair more than once")
    assert(collapsedRows.toSet == direct,
      s"collapsed-direct=${collapsedRows.toSet -- direct} " +
        s"direct-collapsed=${direct -- collapsedRows.toSet}")
    collapsedRows.foreach { case (a, b) => assert(a < b) }
    // both dup families present: the hot class (within-class expansion)
    // and the exact class; the 20-member hot class alone is 190 pairs
    assert(direct.contains((100L, 101L)) && direct.contains((200L, 201L)))
    assert(direct.count { case (a, b) => a >= 100L && b < 200L } >= 190)
  }

  test("collapsed simhash pairs equal the direct path, hamming included") {
    // Same skew30-shaped corpus as the MinHash twin: the hot class's
    // shared body dominates every bit vote (identical 32-bit simhashes),
    // plus an exact class and distinct background docs. Equivalence must
    // hold on the (pair, hamming) TRIPLE — the collapsed path computes
    // hamming once per class pair and must propagate it unchanged — and
    // the raw collapsed output must be duplicate-free (no distinct runs
    // below representative grain).
    val hotBody = (0 until 40).map(i => s"hotword${i % 7}").mkString(" ")
    val hot = (100L until 120L).map(i => (i, s"$hotBody tail $i"))
    val exact = (200L until 210L).map(i =>
      (i, "an exactly repeated document body for the exact class test"))
    val bg = (300L until 330L).map(i =>
      (i, s"background document number $i with distinct content " +
        s"about topic${i % 13} and subject${i % 11} material"))
    val corpus = (hot ++ exact ++ bg).toDF("doc_id", "text")
    val direct = Dedup.simhashPairs(corpus)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    Dedup.releaseScratch()
    val collapsedRows = Dedup.simhashPairsCollapsed(corpus)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    Dedup.releaseScratch()
    assert(collapsedRows.length == collapsedRows.toSet.size,
      "collapsed path emitted a pair more than once")
    assert(collapsedRows.toSet == direct,
      s"collapsed-direct=${collapsedRows.toSet -- direct} " +
        s"direct-collapsed=${direct -- collapsedRows.toSet}")
    collapsedRows.foreach { case (a, b, _) => assert(a < b) }
    // both dup families present, with hamming 0 inside each class
    assert(direct.contains((100L, 101L, 0)) && direct.contains((200L, 201L, 0)))
    assert(direct.count { case (a, b, _) => a >= 100L && b < 200L } >= 190)
  }

  test("auto selectors produce the direct result through BOTH branches") {
    // the collapseAt knob forces each branch on the same corpus: 1 always
    // collapses, Long.MaxValue never does. Output must equal the direct
    // path's either way — the selector may only ever change the plan.
    val hotBody = (0 until 40).map(i => s"hotword${i % 7}").mkString(" ")
    val hot = (100L until 120L).map(i => (i, s"$hotBody tail $i"))
    val bg = (300L until 320L).map(i =>
      (i, s"background document number $i with distinct content " +
        s"about topic${i % 13} and subject${i % 11} material"))
    val corpus = (hot ++ bg).toDF("doc_id", "text")
    val mhDirect = Dedup.minhashCandidates(corpus)
      .as[(Long, Long)].collect().toSet
    Dedup.releaseScratch()
    for (at <- Seq(1L, Long.MaxValue)) {
      val got = Dedup.minhashCandidatesAuto(corpus, collapseAt = at)
        .as[(Long, Long)].collect().toSet
      Dedup.releaseScratch()
      assert(got == mhDirect, s"minhash auto(collapseAt=$at) diverged")
    }
    val shDirect = Dedup.simhashPairs(corpus, maxHamming = 12)
      .as[(Long, Long, Int)].collect().toSet
    Dedup.releaseScratch()
    for (at <- Seq(1L, Long.MaxValue)) {
      val got = Dedup.simhashPairsAuto(corpus, maxHamming = 12,
          collapseAt = at)
        .as[(Long, Long, Int)].collect().toSet
      Dedup.releaseScratch()
      assert(got == shDirect, s"simhash auto(collapseAt=$at) diverged")
    }
    // the default threshold reflects the measured crossover midpoint
    assert(Dedup.collapseClassThreshold == 4096L)
  }

  test("lifted components equal CC over the direct candidate pairs") {
    // Every lifting case in one corpus: a hot near-identical class (one
    // signature class, 20 members — within-class cliques contract to a
    // node), an exact-dup class, a near-dup BRIDGE doc (1,2 identical;
    // 3 differs by one token, verified below to land in its OWN
    // signature class sharing exactly one band with 1's — connected to
    // {1,2} only through a cross-class rep pair, so the lift must hand
    // it the OTHER class's min id), and background docs with disjoint
    // vocabularies that pair with nothing (absent from the labeling).
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val bridge = Seq((1L, base), (2L, base),
      (3L, "the quick brown fox jumps over the zebra dog again and again"))
    val hotBody = (0 until 40).map(i => s"hotword${i % 7}").mkString(" ")
    val hot = (100L until 120L).map(i => (i, s"$hotBody tail $i"))
    val exact = (200L until 210L).map(i =>
      (i, "an exactly repeated document body for the exact class test"))
    val bg = (300L until 330L).map(i =>
      (i, (0 until 12).map(j => s"tok${i}x$j").mkString(" ")))
    val corpus = (bridge ++ hot ++ exact ++ bg).toDF("doc_id", "text")
    val direct = Dedup.connectedComponents(Dedup.minhashCandidates(corpus))
      .as[(Long, Long)].collect().toSet
    Dedup.releaseScratch()
    val liftedRows = Dedup.minhashComponentsCollapsed(corpus)
      .as[(Long, Long)].collect()
    Dedup.releaseScratch()
    assert(liftedRows.length == liftedRows.toSet.size,
      "lifted labeling emitted a doc more than once")
    assert(liftedRows.toSet == direct,
      s"lifted-direct=${liftedRows.toSet -- direct} " +
        s"direct-lifted=${direct -- liftedRows.toSet}")
    // the bridge actually exercised cross-class lifting: docs 1 and 3
    // carry DIFFERENT signature vectors (else they'd share a class) yet
    // one component label — and that label is 1, the min across classes
    val sigOf = Dedup.minhashSignatures(corpus)
      .filter($"doc_id".isin(1L, 3L))
      .groupBy($"doc_id")
      .agg(array_join(sort_array(collect_list(
        concat_ws(":", $"band", $"sig"))), "|").as("k"))
      .as[(Long, String)].collect().toMap
    Dedup.releaseScratch()
    assert(sigOf(1L) != sigOf(3L),
      "fixture drift: docs 1 and 3 collapsed into one signature class, " +
        "cross-class lifting not exercised")
    val m = direct.toMap
    assert(m.get(3L).contains(1L) && m.get(2L).contains(1L))
    // isolated multi-member classes keep their class-min label; isolated
    // background docs are unlabeled
    assert(m.get(200L).contains(200L))
    assert(!m.keySet.exists(_ >= 300L))
  }

  test("components auto produces the direct labeling through BOTH branches") {
    val hotBody = (0 until 40).map(i => s"hotword${i % 7}").mkString(" ")
    val hot = (100L until 112L).map(i => (i, s"$hotBody tail $i"))
    val bg = (300L until 320L).map(i =>
      (i, (0 until 12).map(j => s"tok${i}x$j").mkString(" ")))
    val corpus = (docs.as[(Long, String)].collect().toSeq ++ hot ++ bg)
      .toDF("doc_id", "text")
    val direct = Dedup.connectedComponents(Dedup.minhashCandidates(corpus))
      .as[(Long, Long)].collect().toSet
    Dedup.releaseScratch()
    for (at <- Seq(1L, Long.MaxValue)) {
      val got = Dedup.minhashComponentsAuto(corpus, collapseAt = at)
        .as[(Long, Long)].collect().toSet
      Dedup.releaseScratch()
      assert(got == direct, s"components auto(collapseAt=$at) diverged")
    }
    // a corpus with no candidate pairs at all labels nothing on either path
    val lonely = bg.toDF("doc_id", "text")
    for (at <- Seq(1L, Long.MaxValue)) {
      assert(Dedup.minhashComponentsAuto(lonely, collapseAt = at).isEmpty)
      Dedup.releaseScratch()
    }
  }

  test("incremental candidates: delta vs base only, no within-side pairs") {
    val base = docs // ids 1,2 duplicate text; 4 unrelated
    val delta = Seq(
      (5L, "the quick brown fox jumps over the lazy dog again and again"),
      (6L, "the quick brown fox jumps over the lazy dog again and again"),
      (7L, "unmatched new text that resembles nothing in the corpus here"),
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalCandidates(base, delta)
      .select("new_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(out.contains((5L, 1L)) && out.contains((5L, 2L)))
    assert(out.contains((6L, 1L)))
    assert(!out.exists(_._1 == 7L))                    // unmatched delta absent
    assert(!out.exists(p => p._1 == 5L && p._2 == 6L)) // no delta×delta
    assert(!out.exists(p => p._1 == 1L || p._1 == 2L)) // no base on the left
  }

  test("simhash lifted components equal CC over the direct pair set") {
    // same corpus shape as the MinHash lifting test; wide maxHamming
    // keeps cross-class rep edges in play so the lift is exercised
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val bridge = Seq((1L, base), (2L, base),
      (3L, "the quick brown fox jumps over the zebra dog again and again"))
    val hotBody = (0 until 40).map(i => s"hotword${i % 7}").mkString(" ")
    val hot = (100L until 120L).map(i => (i, s"$hotBody tail $i"))
    val bg = (300L until 320L).map(i =>
      (i, (0 until 12).map(j => s"tok${i}x$j").mkString(" ")))
    val corpus = (bridge ++ hot ++ bg).toDF("doc_id", "text")
    val direct = Dedup.connectedComponents(
        Dedup.simhashPairs(corpus, maxHamming = 12)
          .select("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toSet
    Dedup.releaseScratch()
    val lifted = Dedup.simhashComponentsCollapsed(corpus, maxHamming = 12)
      .as[(Long, Long)].collect()
    Dedup.releaseScratch()
    assert(lifted.length == lifted.toSet.size,
      "simhash lifted labeling emitted a doc more than once")
    assert(lifted.toSet == direct,
      s"lifted-direct=${lifted.toSet -- direct} " +
        s"direct-lifted=${direct -- lifted.toSet}")
    // cross-class connectivity present (docs 1 and 3 share a cluster)
    val m = direct.toMap
    assert(m.get(3L).contains(m(1L)))
  }

  test("incremental cluster update: merges, pulls, pass-through, min labels") {
    // synthetic edges exercise every re-expansion case deterministically:
    //  - new doc 100 bridges clusters {1,2} and {5,6} → MERGE, label 1
    //  - new doc 101 pairs with unclustered base doc 7 → both labeled 7
    //  - cluster {20,21} untouched → passes through unchanged
    //  - unclustered base doc 8 untouched → still absent
    val baseClusters = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L),
      (20L, 20L), (21L, 20L)).toDF("doc_id", "cluster_id")
    val cand = Seq((100L, 2L), (100L, 6L), (101L, 7L))
      .toDF("new_id", "dup_of")
    val got = Dedup.incrementalClusters(baseClusters, cand)
      .as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "a doc was labeled twice")
    val want = Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 100L -> 1L,
      7L -> 7L, 101L -> 7L, 20L -> 20L, 21L -> 20L)
    assert(got.toMap == want, s"got ${got.toMap} want $want")
    // ground truth: batch CC over base edges ∪ contracted-scope edges
    val ground = Dedup.connectedComponents(
        (Seq((1L, 2L), (5L, 6L), (20L, 21L)) ++
          Seq((100L, 2L), (100L, 6L), (101L, 7L)))
          .toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(got.toMap == ground)
    // an empty delta leaves the labeling bit-identical
    val noop = Dedup.incrementalClusters(baseClusters,
        Seq.empty[(Long, Long)].toDF("new_id", "dup_of"))
      .as[(Long, Long)].collect().toMap
    assert(noop == baseClusters.as[(Long, Long)].collect().toMap)
  }

  test("incremental cluster update matches batch CC through real signatures") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "completely different content talking about spark query engines"),
      (7L, (0 until 12).map(j => s"lone7x$j").mkString(" ")),
    ).toDF("doc_id", "text")
    val delta = Seq(
      (50L, "the quick brown fox jumps over the lazy dog again and again"),
      (51L, (0 until 12).map(j => s"lone51x$j").mkString(" ")),
    ).toDF("doc_id", "text")
    val basePairs = Dedup.minhashCandidates(base)
    val baseClusters = Dedup.connectedComponents(basePairs)
    val cand = Dedup.incrementalCandidates(base, delta)
    val got = Dedup.incrementalClusters(baseClusters, cand)
      .as[(Long, Long)].collect().toMap
    Dedup.releaseScratch()
    // ground truth: CC over the base pair set plus the delta×base edges —
    // the incremental contract's scope (no delta×delta)
    val ground = Dedup.connectedComponents(basePairs.unionByName(
        cand.select(col("new_id").as("doc_a"), col("dup_of").as("doc_b"))))
      .as[(Long, Long)].collect().toMap
    Dedup.releaseScratch()
    assert(got == ground, s"got $got ground $ground")
    assert(got.get(50L).contains(1L))   // admitted dup joins cluster 1
    assert(!got.contains(51L))          // unmatched delta doc stays out
  }

  test("signature store: store-path admission equals the recompute path") {
    // the daily-admission contract: candidates and labels drawn from a
    // persisted bucketed (band, sig) store must be IDENTICAL to the
    // recompute path that re-hashes the base — the store is a cache of
    // the signature table, never a different semantics
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "completely different content talking about spark query engines"),
      (7L, (0 until 12).map(j => s"lone7x$j").mkString(" ")),
    ).toDF("doc_id", "text")
    val delta = Seq(
      (50L, "the quick brown fox jumps over the lazy dog again and again"),
      (51L, (0 until 12).map(j => s"lone51x$j").mkString(" ")),
    ).toDF("doc_id", "text")
    Dedup.writeSignatureStore(base, "sig_store_spec", buckets = 4)
    val store = spark.table("sig_store_spec")
    val fromStore = Dedup.incrementalCandidatesFromStore(store, delta)
      .as[(Long, Long)].collect().toSet
    val recompute = Dedup.incrementalCandidates(base, delta)
      .as[(Long, Long)].collect().toSet
    assert(fromStore == recompute && fromStore.contains((50L, 1L)))
    val baseClusters = Dedup.connectedComponents(
      Dedup.minhashCandidates(base))
    Dedup.releaseScratch()
    val viaStore = Dedup.incrementalClustersFromStore(
        baseClusters, store, delta)
      .as[(Long, Long)].collect().toMap
    val viaRecompute = Dedup.incrementalClusters(baseClusters,
        Dedup.incrementalCandidates(base, delta))
      .as[(Long, Long)].collect().toMap
    Dedup.releaseScratch()
    assert(viaStore == viaRecompute, s"store $viaStore recompute $viaRecompute")
    assert(viaStore.get(50L).contains(1L))
    spark.sql("DROP TABLE sig_store_spec")
  }

  test("store lifecycle: append admits tomorrow's match; compaction is " +
       "lossless for the maintained tables and shrinks the store") {
    val tbl = "sig_life_spec"
    val dupText = "the quick brown fox jumps over the lazy dog again and again"
    // base: a 3-member duplicate class (1,2,3) + a loner
    val base = Seq((1L, dupText), (2L, dupText), (3L, dupText),
      (7L, (0 until 12).map(j => s"lone7x$j").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.writeSignatureStore(base, tbl, buckets = 4)
    val baseClusters = Dedup.connectedComponents(
        Dedup.minhashCandidates(base)).localCheckpoint(false)
    baseClusters.count()
    Dedup.releaseScratch()

    // day 1: admit a dup of the class, fold it into store + clusters
    val delta1 = Seq((50L, dupText)).toDF("doc_id", "text")
    val clusters1 = Dedup.incrementalClusters(baseClusters,
        Dedup.incrementalCandidatesFromStore(spark.table(tbl), delta1))
      .localCheckpoint(false)
    clusters1.count()
    Dedup.releaseScratch()
    Dedup.appendToSignatureStore(delta1, tbl)
    assert(spark.table(tbl).filter(col("doc_id") === 50L).count() > 0,
      "appended delta signatures must be readable from the store")

    // day 2: a doc matching ONLY day 1's arrival content-wise still
    // requires the append — identical text means it matches the whole
    // class, so instead prove the appended rows participate: the
    // candidate set against the post-append store must include 50
    val delta2 = Seq((60L, dupText),
      (61L, (0 until 12).map(j => s"lone61x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val cand2Full = Dedup.incrementalCandidatesFromStore(
        spark.table(tbl), delta2)
      .as[(Long, Long)].collect().toSet
    assert(cand2Full.contains((60L, 50L)),
      s"day-2 candidates must see day-1's admitted doc: $cand2Full")
    val updFull = Dedup.incrementalClusters(clusters1,
        Dedup.incrementalCandidatesFromStore(spark.table(tbl), delta2))
      .as[(Long, Long)].collect().toMap
    val kbBase = Dedup.keepBest(
      Seq((1L, 0.5), (2L, 0.9), (3L, 0.1), (7L, 0.4), (50L, 0.6))
        .toDF("doc_id", "quality_score"), clusters1)
      .localCheckpoint(false)
    kbBase.count()
    val d2Scored = Seq((60L, 0.95), (61L, 0.2))
      .toDF("doc_id", "quality_score")
    val kbFull = Dedup.incrementalKeepBest(clusters1, kbBase,
        Dedup.incrementalCandidatesFromStore(spark.table(tbl), delta2),
        d2Scored)
      .as[(Long, Long, Long, Double)].collect().toSet
    Dedup.releaseScratch()

    // compact against the CURRENT cluster table: admission must be
    // byte-identical on the maintained tables, and the 4-member class
    // (1,2,3,50 — identical signatures) collapses to one row per bucket
    val before = spark.table(tbl).count()
    Dedup.compactSignatureStore(spark, tbl, clusters1)
    val after = spark.table(tbl).count()
    assert(after < before, s"compaction must shrink: $before -> $after")
    val updCompact = Dedup.incrementalClusters(clusters1,
        Dedup.incrementalCandidatesFromStore(spark.table(tbl), delta2))
      .as[(Long, Long)].collect().toMap
    val kbCompact = Dedup.incrementalKeepBest(clusters1, kbBase,
        Dedup.incrementalCandidatesFromStore(spark.table(tbl), delta2),
        d2Scored)
      .as[(Long, Long, Long, Double)].collect().toSet
    Dedup.releaseScratch()
    assert(updCompact == updFull,
      s"admit-after-compact $updCompact != admit-on-full-store $updFull")
    assert(kbCompact == kbFull,
      s"keep-best after compact $kbCompact != full-store $kbFull")
    // the bucketed layout survived the swap (admission plan unchanged)
    assert(org.apache.spark.sql.GraftShims.tableBuckets(spark, tbl)
      .contains(4))
    spark.sql(s"DROP TABLE `$tbl`")
  }

  test("keepBest: score argmax with id tie-break, singletons included") {
    val scored = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.2))
      .toDF("doc_id", "quality_score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.keepBest(scored, clusters).collect()
      .map(r => r.getAs[Long]("entity_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Long]("n_members"),
          r.getAs[Double]("best_score")))).toMap
    // 2 and 3 tie at 0.9 — the min id among the maxima wins
    assert(got == Map(1L -> ((2L, 3L, 0.9)), 4L -> ((4L, 1L, 0.2))))
  }

  test("keepBest: null scores lose; all-null entity keeps min id") {
    // mixed entity {1: null, 2: 0.1} — the non-null doc must win even
    // though a null ns struct field would sort first without the flag;
    // all-null entity {5, 6} — deterministic min-id winner, null score
    val scored = Seq[(Long, java.lang.Double)](
        (1L, null), (2L, 0.1), (5L, null), (6L, null))
      .toDF("doc_id", "quality_score")
    val clusters = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.keepBest(scored, clusters).collect()
      .map(r => r.getAs[Long]("entity_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Long]("n_members"),
          Option(r.getAs[java.lang.Double]("best_score"))))).toMap
    assert(got == Map(1L -> ((2L, 2L, Some(0.1))),
      5L -> ((5L, 2L, None))),
      s"keep_id must track max(score)'s nulls-ignored semantics: $got")

    // the incremental fold agrees when null-scored entities merge: a
    // delta doc (null score) bridges the all-null pair into the mixed
    // one — keep_id stays 2, n_members sums, best_score stays 0.1
    val cand = Seq((100L, 1L), (100L, 5L)).toDF("new_id", "dup_of")
    val deltaScored = Seq[(Long, java.lang.Double)]((100L, null))
      .toDF("doc_id", "quality_score")
    val inc = Dedup.incrementalKeepBest(clusters,
        Dedup.keepBest(scored, clusters), cand, deltaScored)
      .collect().map(r => r.getAs[Long]("entity_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Long]("n_members"),
          Option(r.getAs[java.lang.Double]("best_score"))))).toMap
    assert(inc == Map(1L -> ((2L, 5L, Some(0.1)))), s"merged fold: $inc")
  }

  test("incremental keep-best equals batch keep-best over base∪delta") {
    // synthetic part: every maintenance case at once — a delta doc
    // MERGING two base clusters whose bests TIE across the merge (the
    // composed tie-break must still pick the min id), a delta doc
    // pulling an unclustered base doc in and outscoring it, an
    // untouched cluster passing through, and an unmatched delta doc
    // landing as its own singleton
    val baseClusters = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L),
      (20L, 20L), (21L, 20L)).toDF("doc_id", "cluster_id")
    val scoreOf = Map(1L -> 0.5, 2L -> 0.9, 5L -> 0.1, 6L -> 0.9,
      7L -> 0.4, 8L -> 0.3, 20L -> 0.6, 21L -> 0.7)
    val scoredBase = scoreOf.toSeq.toDF("doc_id", "quality_score")
    val cand = Seq((100L, 2L), (100L, 6L), (101L, 7L))
      .toDF("new_id", "dup_of")
    val deltaScored = Seq((100L, 0.3), (101L, 0.95), (102L, 0.4))
      .toDF("doc_id", "quality_score")
    val baseKeepBest = Dedup.keepBest(scoredBase, baseClusters)
    val got = Dedup.incrementalKeepBest(baseClusters, baseKeepBest,
        cand, deltaScored)
      .collect().map(r => r.getAs[Long]("entity_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Long]("n_members"),
          r.getAs[Double]("best_score")))).toMap
    val ground = Dedup.keepBest(
        scoredBase.unionByName(deltaScored),
        Dedup.incrementalClusters(baseClusters, cand))
      .collect().map(r => r.getAs[Long]("entity_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Long]("n_members"),
          r.getAs[Double]("best_score")))).toMap
    assert(got == ground, s"got $got ground $ground")
    // the merged {1,2}+{5,6}+100 entity ties 2 vs 6 at 0.9 → keeps 2
    assert(got.get(1L).contains((2L, 5L, 0.9)))
    // 101 outscores the base doc it pulled in
    assert(got.get(7L).contains((101L, 2L, 0.95)))
    // untouched cluster and unmatched delta singleton pass through
    assert(got.get(20L).contains((21L, 2L, 0.7)))
    assert(got.get(102L).contains((102L, 1L, 0.4)))

    // real-signature part: the same equality through minhash candidates
    // and quality scores computed from text
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "completely different content talking about spark query engines"),
      (7L, (0 until 12).map(j => s"lone7x$j").mkString(" ")),
    ).toDF("doc_id", "text")
    val delta = Seq(
      (50L, "the quick brown fox jumps over the lazy dog again and again"),
      (51L, (0 until 12).map(j => s"lone51x$j").mkString(" ")),
    ).toDF("doc_id", "text")
    def q(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.qualityScore(df).select(col("doc_id"),
        col("quality_score"))
    val bc = Dedup.connectedComponents(Dedup.minhashCandidates(base))
    val rcand = Dedup.incrementalCandidates(base, delta)
    val rGot = Dedup.incrementalKeepBest(bc, Dedup.keepBest(q(base), bc),
        rcand, q(delta))
      .as[(Long, Long, Long, Double)].collect().toSet
    val rGround = Dedup.keepBest(q(base.unionByName(delta)),
        Dedup.incrementalClusters(bc, rcand))
      .as[(Long, Long, Long, Double)].collect().toSet
    Dedup.releaseScratch()
    assert(rGot == rGround, s"got $rGot ground $rGround")
    assert(rGot.exists(r => r._1 == 1L && r._2 == 1L && r._3 == 3L))
  }

  test("ngram jaccard: identical docs = 1.0, near-dups high, ordered pairs") {
    val j = Dedup.ngramJaccard(docs, Dedup.minhashCandidates(docs))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
    val m = j.map { case (a, b, v) => (a, b) -> v }.toMap
    assert(m.get((1L, 2L)).contains(1.0))
    m.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("containment catches subset duplication that Jaccard dilutes") {
    // doc 11 is quoted whole inside the much larger doc 10: containment
    // from the small side is 1.0 while Jaccard shrinks with the container
    val sub = "the quick brown fox jumps over the lazy dog"
    val container = sub + " and then a very long continuation follows " +
      "with many additional unrelated words stretching the document out " +
      "far beyond the quoted passage to dilute resemblance badly"
    val d = Seq((10L, container), (11L, sub)).toDF("doc_id", "text")
    val pairs = Seq((10L, 11L)).toDF("doc_a", "doc_b")
    val row = Dedup.containmentPairs(d, pairs).head()
    val jac = Dedup.ngramJaccard(d, pairs).head().getAs[Double]("jaccard")
    assert(row.getAs[Double]("containment_b") == 1.0) // fully contained
    assert(jac < 0.5)                                 // resemblance dilutes
  }

  test("simhash: identical docs share signatures; hamming(near-dup) small") {
    val sig = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    val ham13 = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    val ham14 = java.lang.Long.bitCount(sig(1L) ^ sig(4L))
    assert(ham13 < ham14) // near-dup closer than unrelated
    val pairs = Dedup.simhashPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("scratch caches release: two dedup queries leave no persisted RDDs") {
    Dedup.releaseScratch() // start clean of any earlier tests' scratch
    val before = sc.getPersistentRDDs.keySet
    // back-to-back queries through both persist sites, each fully actioned
    // then released — the long-lived-session lifecycle Verify/Bench use
    Dedup.ngramJaccard(docs, Dedup.minhashCandidates(docs)).count()
    Dedup.releaseScratch()
    Dedup.simhashPairs(docs).count()
    Dedup.releaseScratch()
    Dedup.setSimilarityPairs(docs).count()
    Dedup.releaseScratch()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"persisted RDDs leaked: $leaked")
  }

  test("embedding near-dup finds identical vectors within a bucket") {
    val emb = Seq(
      (1L, 0, Array(1.0f, 0.0f, 0.0f)),
      (2L, 0, Array(1.0f, 0.0f, 0.0f)),   // identical
      (3L, 0, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
      (4L, 1, Array(1.0f, 0.0f, 0.0f)),   // other bucket — never compared
    ).toDF("vec_id", "label", "embedding")
    val pairs = Dedup.embeddingNearDup(emb, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("retireFromClusters: member drop, label re-point, singleton drop, " +
       "untouched pass-through") {
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),   // label 1 retired -> relabel to 2
      (10L, 10L), (11L, 10L),         // untouched
      (20L, 20L), (21L, 20L))         // 21 retired -> singleton, dropped
      .toDF("doc_id", "cluster_id")
    val retired = Seq(1L, 21L).toDF("doc_id")
    val got = Dedup.retireFromClusters(clusters, retired)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 2L, 3L -> 2L, 10L -> 10L, 11L -> 10L),
      s"got $got")
  }

  test("retireKeepBest equals batch keep-best over the live corpus " +
       "(non-bridge retirement)") {
    // entity 1 = clique {1,2,3}; entity 10 = {10,11}; singletons 7, 8.
    // Retire the entity-1 LABEL AND best scorer (1), a non-label member
    // of 10 (11 -> singleton survivor), and singleton 7. Untouched: 8.
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val scored = Seq((1L, 0.9), (2L, 0.3), (3L, 0.7), (10L, 0.5),
      (11L, 0.8), (7L, 0.4), (8L, 0.6)).toDF("doc_id", "quality_score")
    val kb = Dedup.keepBest(scored, clusters).localCheckpoint(false)
    kb.count()
    val retired = Seq(1L, 11L, 7L).toDF("doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = rows(Dedup.retireKeepBest(kb, clusters, retired, scored))
    // oracle: batch keep-best over the surviving corpus + repaired table
    val liveScored = scored.join(retired, Seq("doc_id"), "left_anti")
    val expect = rows(Dedup.keepBest(liveScored,
      Dedup.retireFromClusters(clusters, retired)))
    assert(got == expect, s"got $got expect $expect")
    // the demotion is real: entity 1's keep falls to the second-best 3
    assert(got.contains((2L, 3L, 2L, 0.7)), got)
    // 10 lost its best member; the lone survivor keeps its own score
    assert(got.contains((10L, 10L, 1L, 0.5)), got)
    // retired singleton 7 vanished, untouched 8 passed through
    assert(!got.exists(_._1 == 7L) && got.contains((8L, 8L, 1L, 0.6)), got)
  }

  test("clusterSplitAudit: bridge retirement splits surface with their " +
       "relabeling; cliques and untouched clusters stay silent") {
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),   // chain 1-2-3; retiring 2 splits it
      (10L, 10L), (11L, 10L), (12L, 10L), // clique; retiring 11 is safe
      (20L, 20L), (21L, 20L))         // untouched
      .toDF("doc_id", "cluster_id")
    val pairs = Seq(
      (1L, 2L), (2L, 3L),              // the bridge evidence
      (10L, 11L), (11L, 12L), (10L, 12L), // the clique evidence
      (20L, 21L)).toDF("doc_a", "doc_b")
    val retired = Seq(2L, 11L).toDF("doc_id")
    val got = Dedup.clusterSplitAudit(clusters, retired, pairs)
      .as[(Long, Long, Long)].collect().toSet
    // only cluster 1 splits: survivors 1 and 3 have no surviving edge
    assert(got == Set((1L, 1L, 1L), (1L, 3L, 3L)), got)

    // stale evidence listing the retired doc's own edges must not
    // reconnect the survivors (both endpoints must survive)
    val got2 = Dedup.clusterSplitAudit(clusters, retired,
        pairs.unionAll(Seq((2L, 2L)).toDF("doc_a", "doc_b")))
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 == got, got2)

    // with a direct surviving 1-3 edge, nothing splits at all
    val healed = Dedup.clusterSplitAudit(clusters, retired,
        pairs.unionAll(Seq((1L, 3L)).toDF("doc_a", "doc_b")))
      .count()
    assert(healed == 0L)
  }

  test("store retire: a retired doc never reappears as dup_of; reinstate " +
       "restores entity coverage after compaction") {
    val tbl = "sig_retire_spec"
    val dupText =
      "the quick brown fox jumps over the lazy dog again and again"
    val base = Seq((1L, dupText), (2L, dupText), (3L, dupText),
      (7L, (0 until 12).map(j => s"lone7y$j").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.writeSignatureStore(base, tbl, buckets = 4)
    val baseClusters = Dedup.connectedComponents(
        Dedup.minhashCandidates(base)).localCheckpoint(false)
    baseClusters.count()
    Dedup.releaseScratch()

    // pre-compaction retire of member 2: the class still has 1 and 3
    Dedup.retireFromSignatureStore(spark, tbl, Seq(2L).toDF("doc_id"))
    assert(spark.table(tbl).filter(col("doc_id") === 2L).count() == 0)
    val delta = Seq((90L, dupText)).toDF("doc_id", "text")
    val cand = Dedup.incrementalCandidatesFromStore(spark.table(tbl), delta)
      .as[(Long, Long)].collect().toSet
    assert(!cand.exists(_._2 == 2L),
      s"retired doc resurfaced as dup_of: $cand")
    assert(cand.exists(c => c._2 == 1L || c._2 == 3L),
      s"live class members must still admit the dup: $cand")

    // compact (keeps ONE member per (band, sig, entity) — the min, 1),
    // then retire that representative WITH its live sibling reinstated
    val liveClusters = Dedup.retireFromClusters(baseClusters,
      Seq(2L).toDF("doc_id"))
    Dedup.compactSignatureStore(spark, tbl, liveClusters)
    Dedup.retireFromSignatureStore(spark, tbl, Seq(1L).toDF("doc_id"),
      reinstate = Some(base.filter(col("doc_id") === 3L)))
    Dedup.releaseScratch()
    assert(spark.table(tbl).filter(col("doc_id") === 1L).count() == 0)
    val cand2 = Dedup.incrementalCandidatesFromStore(spark.table(tbl), delta)
      .as[(Long, Long)].collect().toSet
    Dedup.releaseScratch()
    assert(cand2 == Set((90L, 3L)),
      s"reinstated sibling must carry the entity's coverage: $cand2")
    // bucketed layout survived both retire rewrites
    assert(org.apache.spark.sql.GraftShims.tableBuckets(spark, tbl)
      .contains(4))
    spark.sql(s"DROP TABLE `$tbl`")
  }

  test("storeStats: redundancy tracks appends and returns to 1 after " +
       "compaction; filesPerBucket counts appends") {
    val tbl = "sig_stats_spec"
    val dupText =
      "the quick brown fox jumps over the lazy dog again and again"
    val base = Seq((1L, dupText), (2L, dupText),
      (7L, (0 until 12).map(j => s"lone7z$j").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.writeSignatureStore(base, tbl, buckets = 4)
    val clusters = Dedup.connectedComponents(
        Dedup.minhashCandidates(base)).localCheckpoint(false)
    clusters.count()
    Dedup.releaseScratch()
    val s0 = Dedup.storeStats(spark, tbl, Some(clusters))
    // {1,2} share every signature: 6 rows, entity floor 4, redundancy 1.5
    assert(s0.rows == 6L && s0.entityFloor == 4L, s0)
    assert(math.abs(s0.redundancy - 1.5) < 1e-9, s0)
    assert(s0.buckets == 4 && s0.files > 0L, s0)

    Dedup.appendToSignatureStore(Seq((50L, dupText)).toDF("doc_id", "text"),
      tbl)
    // the admitted dup joins cluster 1 — probe with the MAINTAINED
    // table, as a daily pipeline would: its rows are pure redundancy
    val clusters2 = Dedup.incrementalClusters(clusters,
      Seq((50L, 1L)).toDF("new_id", "dup_of")).localCheckpoint(false)
    clusters2.count()
    Dedup.releaseScratch()
    val s1 = Dedup.storeStats(spark, tbl, Some(clusters2))
    assert(s1.rows == 8L && s1.entityFloor == 4L, s1)
    assert(s1.redundancy > s0.redundancy, s"$s0 -> $s1")
    assert(s1.filesPerBucket > s0.filesPerBucket,
      s"each append lands a file set per bucket: $s0 -> $s1")

    Dedup.compactSignatureStore(spark, tbl, clusters2)
    val s2 = Dedup.storeStats(spark, tbl, Some(clusters2))
    assert(s2.redundancy == 1.0 && s2.rows == s2.entityFloor,
      s"compaction must reach the floor: $s2")
    spark.sql(s"DROP TABLE `$tbl`")
  }

  test("connectedComponentsWithRounds: labeling matches, rounds visible; " +
       "non-integral and null ids fail loudly") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val (labeled, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    val got = labeled.as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    assert(rounds >= 1 && rounds <= Dedup.defaultCcRounds, s"rounds=$rounds")
    // self-loop-only input converges in zero rounds
    val selfOnly = Seq((5L, 5L)).toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponentsWithRounds(selfOnly)._2 == 0)
    // string ids: plan-time rejection, not a silent null-merge
    val strPairs = Seq(("a", "b")).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(strPairs)
    }
    assert(e.getMessage.contains("must be integral"), e.getMessage)
    // genuinely null ids: loud runtime rejection
    val nullPairs = Seq[(java.lang.Long, java.lang.Long)]((1L, null))
      .toDF("doc_a", "doc_b")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(nullPairs)
    }
    assert(e2.getMessage.contains("NULL id"), e2.getMessage)
  }
}
