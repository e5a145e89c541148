package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential coverage for the hot-bucket GRID self-join paths added in
  * round 11 (candidatesFromSignatures and nearDupLsh): a bucket at or
  * past `hotBucketSize` must produce EXACTLY the pair set the small-
  * bucket two-explode path defines — the full strict upper triangle of
  * the sorted member list — including the boundary sizes around the
  * threshold and buckets spanning several grid blocks, mixed with small
  * buckets in the same run (both branches of the union live). The
  * existing oracle fixtures never build a bucket past ~tens of members,
  * so without this the hot branch would be dead code under `sbt test`.
  */
class HotBucketGridSpec extends SparkSpec {
  import spark.implicits._

  private def expectedPairs(ids: Seq[Long]): Set[(Long, Long)] = {
    val s = ids.sorted
    (for (i <- s.indices; j <- i + 1 until s.size) yield (s(i), s(j))).toSet
  }

  test("candidatesFromSignatures: hot grid pairs equal the full upper " +
      "triangle, mixed with small buckets") {
    // hot bucket: hotBucketSize + 37 members spanning 3 grid blocks;
    // boundary bucket: exactly hotBucketSize - 1 (largest small bucket);
    // plus two tiny buckets and a shared-id overlap across buckets
    val hot = (0L until (Dedup.hotBucketSize + 37L)).map(i =>
      (i, 0, "H"))
    val boundary = (10000L until (10000L + Dedup.hotBucketSize - 1L))
      .map(i => (i, 0, "B"))
    val tiny = Seq((20000L, 1, "T"), (20001L, 1, "T"),
      (20000L, 1, "U"), (20002L, 1, "U")) // overlap: 20000 in two buckets
    val sig = (hot ++ boundary ++ tiny).toDF("doc_id", "band", "sig")
    val got = Dedup.candidatesFromSignatures(sig, "doc_id")
      .as[(Long, Long)].collect().toSet
    try {
      val want = expectedPairs(hot.map(_._1)) ++
        expectedPairs(boundary.map(_._1)) ++
        expectedPairs(Seq(20000L, 20001L)) ++
        expectedPairs(Seq(20000L, 20002L))
      assert(got.size == want.size, s"${got.size} vs ${want.size}")
      assert(got == want)
    } finally Dedup.releaseScratch()
  }

  test("candidatesFromSignatures: bucket exactly at hotBucketSize takes " +
      "the grid path and stays exact") {
    val ids = (0L until Dedup.hotBucketSize.toLong).map(i => (i * 7L, 0, "X"))
    val got = Dedup.candidatesFromSignatures(
      ids.toDF("doc_id", "band", "sig"), "doc_id")
      .as[(Long, Long)].collect().toSet
    try assert(got == expectedPairs(ids.map(_._1)))
    finally Dedup.releaseScratch()
  }

  test("minhashCandidatesCollapsed: a hot identical-signature class " +
      "rides the grid path and equals the direct candidate set") {
    // the r13 collapse-before-banding operator's WITHIN-CLASS expansion
    // goes through candidatesFromSignatures(dedup = false) keyed on the
    // signature class; a class past hotBucketSize must take the grid
    // branch there. skew30 verified this at 24k members full-scale; this
    // pins it under `sbt test` at 560 members (> hotBucketSize = 512),
    // mixed with an exact-dup class and background docs so the cross-
    // class expansion and both union branches are live too.
    // long shared body (~120 tokens → ~178 shingles) so the per-doc tail
    // rarely wins a minhash min: the dominant identical-signature class
    // keeps well over hotBucketSize members (deterministic — fixed hashes)
    val hotBody = (0 until 120).map(i => s"gridword${i % 23}").mkString(" ")
    val hot = (0L until (Dedup.hotBucketSize + 150L)).map(i =>
      (i, s"$hotBody tail $i"))
    val exact = (50000L until 50004L).map(i => (i, "same exact body here"))
    val bg = (60000L until 60010L).map(i =>
      (i, s"background item $i about matter${i % 7} and other content"))
    val corpus = (hot ++ exact ++ bg).toDF("doc_id", "text")
    try {
      val direct = Dedup.minhashCandidates(corpus)
        .as[(Long, Long)].collect().toSet
      Dedup.releaseScratch()
      val collapsed = Dedup.minhashCandidatesCollapsed(corpus)
        .as[(Long, Long)].collect()
      assert(collapsed.length == collapsed.toSet.size,
        "collapsed emitted a duplicate pair")
      assert(collapsed.toSet == direct,
        s"sizes ${collapsed.length} vs ${direct.size}")
      // the grid path really is live (not vacuous): the LARGEST identical-
      // signature class must exceed hotBucketSize. Checked directly on the
      // signature table — a handful of tails can win a minhash min and
      // split off, so the pair count alone can't prove it.
      val maxClass = Dedup.minhashSignatures(corpus, "doc_id")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("band"), col("sig"))))
          .as("sigs"))
        .groupBy(col("sigs")).count()
        .agg(max(col("count"))).head().getLong(0)
      assert(maxClass >= Dedup.hotBucketSize,
        s"largest signature class $maxClass under the grid threshold")
    } finally Dedup.releaseScratch()
  }

  test("simhashPairsCollapsed: a hot identical-simhash class rides the " +
      "grid path and equals the direct (pair, hamming) set") {
    // the simhash collapse key is the 32-bit signature itself; a class
    // past hotBucketSize must take the grid branch inside the within-
    // class expansion. Deterministic identical-signature construction:
    // 40 body tokens over 7 distinct words give every bit a vote margin
    // |Σ±cnt| = |6a+5b| >= 4, which the 2-token per-doc tail (±2) can
    // never flip — so ALL hot members share one simhash and the class
    // holds hotBucketSize + 150 members (asserted below, not assumed).
    // maxHamming = 32 keeps every band collision in the output so the
    // cross-class branch (variant classes whose boosted extra word flips
    // only low-margin bits, leaving >= 1 byte band shared) is live too.
    val hotBody = (0 until 40).map(i => s"simgrid${i % 7}").mkString(" ")
    val hot = (0L until (Dedup.hotBucketSize + 150L)).map(i =>
      (i, s"$hotBody tail $i"))
    val variants = (0 until 5).flatMap { k =>
      val extra = Seq.fill(8)(s"variantword$k").mkString(" ")
      Seq((70000L + 2 * k, s"$hotBody $extra"),
        (70001L + 2 * k, s"$hotBody $extra"))
    }
    val bg = (80000L until 80010L).map(i =>
      (i, s"background item $i about matter${i % 7} and other content"))
    val corpus = (hot ++ variants ++ bg).toDF("doc_id", "text")
    try {
      val direct = Dedup.simhashPairs(corpus, maxHamming = 32)
        .as[(Long, Long, Int)].collect().toSet
      Dedup.releaseScratch()
      val collapsed = Dedup.simhashPairsCollapsed(corpus, maxHamming = 32)
        .as[(Long, Long, Int)].collect()
      assert(collapsed.length == collapsed.toSet.size,
        "collapsed emitted a duplicate pair")
      assert(collapsed.toSet == direct,
        s"sizes ${collapsed.length} vs ${direct.size}")
      // grid branch really live: largest identical-simhash class past the
      // threshold, checked on the signature table directly
      val maxClass = Dedup.simhash(corpus)
        .groupBy(col("simhash")).count()
        .agg(max(col("count"))).head().getLong(0)
      assert(maxClass >= Dedup.hotBucketSize,
        s"largest simhash class $maxClass under the grid threshold")
      // cross-class branch really live: some pair spans two classes
      // (hamming > 0 can only come from the representative expansion)
      assert(direct.exists(_._3 > 0), "no cross-class pair in the fixture")
    } finally Dedup.releaseScratch()
  }

  test("simhashPairsCollapsed: two hot classes' cross rectangle spans " +
      "multiple blocks on both axes and equals the direct set") {
    // the skew30 failure shape at unit scale: a near-identical cluster
    // SPLIT into two internally-identical signature classes (bodyB =
    // bodyA + a boosted extra word that flips only low-margin bits), each
    // past 2·gridBlk members — so the cross-class rectangle expansion
    // runs multi-cell on BOTH axes (the path that serialized into one
    // task pre-fix). maxHamming = 32 keeps the cross pairs in the output
    // regardless of which bits flipped. The boost is 12 copies (bodyA
    // bit margins are |6a+5b| ∈ {4,6,8,16,...}, so ±12 keeps every bodyB
    // margin ≥ 4 — above the ±2 per-doc tail — and neither class splits
    // further; ±8 can leave a margin of 2), and the word is chosen so
    // the flipped bits leave one byte band shared (md5 is fixed, so the
    // flip pattern is a constant of the fixture: "zetaword" flips 7 bits
    // across three bytes).
    val bodyA = (0 until 40).map(i => s"simgrid${i % 7}").mkString(" ")
    val bodyB = bodyA + " " + Seq.fill(12)("zetaword").mkString(" ")
    val ca = (0L until 600L).map(i => (i, s"$bodyA tail $i"))
    val cb = (10000L until 10600L).map(i => (i, s"$bodyB tail $i"))
    val corpus = (ca ++ cb).toDF("doc_id", "text")
    try {
      val direct = Dedup.simhashPairs(corpus, maxHamming = 32)
        .as[(Long, Long, Int)].collect().toSet
      Dedup.releaseScratch()
      val collapsed = Dedup.simhashPairsCollapsed(corpus, maxHamming = 32)
        .as[(Long, Long, Int)].collect()
      assert(collapsed.length == collapsed.toSet.size,
        "collapsed emitted a duplicate pair")
      assert(collapsed.toSet == direct,
        s"sizes ${collapsed.length} vs ${direct.size}")
      // the split really happened: exactly two signature classes, both
      // past the 2-block width, and the full 600 x 600 cross rectangle
      // present at a fixed hamming > 0
      val classSizes = Dedup.simhash(corpus)
        .groupBy(col("simhash")).count()
        .as[(Long, Long)].collect().toMap
      assert(classSizes.size == 2 && classSizes.values.forall(_ == 600L),
        s"expected two 600-member classes: $classSizes")
      val crossPairs = collapsed.filter(_._3 > 0)
      assert(crossPairs.length == 600 * 600,
        s"cross rectangle incomplete: ${crossPairs.length}")
      assert(crossPairs.map(_._3).distinct.length == 1)
    } finally Dedup.releaseScratch()
  }

  test("nearDupLsh: a hot near-identical class yields every pair once " +
      "with cosine ~= 1") {
    val dims = 8
    val m = 600 // > hotBucket: the grid branch carries the class
    val base = Array.tabulate(dims)(d => 0.5f + 0.01f * d)
    val emb = (0L until m.toLong).map { i =>
      // per-id epsilon in one dimension: pairwise distinct, cosine ~= 1,
      // same sign-LSH signature in every table
      val v = base.clone()
      v((i % dims).toInt) += (i % 97) * 1e-6f
      (i, v)
    }.toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupLsh(emb, threshold = 0.9, dims = dims)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSet
    try {
      assert(got == expectedPairs(0L until m.toLong),
        s"got ${got.size} pairs")
      // and every cosine is high (near-identical class)
      val minCos = pairs.agg(min("cosine")).head().getDouble(0)
      assert(minCos >= 0.999999, s"min cosine $minCos")
    } finally Dedup.releaseScratch()
  }
}
