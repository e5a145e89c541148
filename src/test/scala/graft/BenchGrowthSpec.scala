package graft

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SCALE.md corpus-growth tables are only as sound as BenchGrowth's
  * replication bijections — pin their contracts:
  *
  *  - documents: letter rotation preserves within-copy token structure
  *    (so each copy carries the same near-dup families) while cross-copy
  *    letter content is disjoint;
  *  - embeddings: sign flips preserve norms and within-copy cosines, and
  *    the per-(copy, dim) hash gives every dimension an independent flip
  *    (the round-9 `d % 63` recipe silently tied dim 63 to dim 0 at
  *    dims=64);
  *  - events: id offsets grow distinct cardinalities exactly linearly;
  *  - staging: the parquet cache is keyed by the SOURCE corpus dir, so a
  *    changed SPARK_GRAFT_SF_DIR cannot silently reuse stale data.
  */
class BenchGrowthSpec extends SparkSpec {
  import spark.implicits._

  test("staged-corpus cache path is keyed by the source sfDir") {
    val a = BenchGrowth.tmpRootFor("/root/testdata/sf0.1")
    val b = BenchGrowth.tmpRootFor("/root/testdata/sf0.01")
    assert(a != b)
    assert(a == BenchGrowth.tmpRootFor("/root/testdata/sf0.1")) // stable
  }

  test("replicateDocs: token structure per copy, disjoint letter content") {
    val base = Seq(
      (1L, "Hello world 42", "en"),
      (2L, "the quick brown fox 42", "en"),
      (3L, "Hello world 42", "en") // within-copy duplicate pair (1,3)
    ).toDF("doc_id", "text", "lang")
    val rep = BenchGrowth.replicateDocs(base, 4).cache()
    try {
      assert(rep.count() == 12)
      // ids unique across copies
      assert(rep.select("doc_id").distinct().count() == 12)
      // token counts preserved per copy (spaces/digits unmapped)
      val toks = rep.select(size(split($"text", " ")).as("n"))
        .groupBy("n").count().as[(Int, Long)].collect().toMap
      assert(toks == Map(3 -> 8, 5 -> 4))
      // the duplicate pair survives in EVERY copy: 4 texts with 2 ids each
      val dupTexts = rep.groupBy("text").count().filter($"count" === 2)
      assert(dupTexts.count() == 4)
      // cross-copy letter content disjoint: every distinct text maps to
      // exactly one copy (2 distinct texts per copy x 4 copies)
      assert(rep.select("text").distinct().count() == 8)
      // digits shared across copies (the documented adversarial floor)
      val withDigit = rep.filter($"text".contains("42"))
      assert(withDigit.count() == 12)
    } finally rep.unpersist()
  }

  test("replicateEmb: norms and within-copy cosines preserved; " +
      "independent per-dimension flips") {
    val dims = 64
    val v1 = Array.tabulate(dims)(d => (d + 1).toFloat / dims)
    val v2 = Array.tabulate(dims)(d => math.cos(d * 2.1).toFloat)
    val base = Seq((1L, v1), (2L, v2)).toDF("vec_id", "embedding")
    val copies = 8
    val rep = BenchGrowth.replicateEmb(base, copies, dims).cache()
    try {
      assert(rep.count() == copies * 2)
      // norm preserved for every replica (|x * s| == |x| for s in ±1)
      val norms = rep.select($"vec_id",
          aggregate($"embedding".cast("array<double>"), lit(0.0d),
            (acc, x) => acc + x * x).as("n2"))
        .as[(Long, Double)].collect().toMap
      val n1 = norms(1L)
      val n2 = norms(2L)
      (0 until copies).foreach { c =>
        assert(math.abs(norms(1L + c * 1000000L) - n1) < 1e-9)
        assert(math.abs(norms(2L + c * 1000000L) - n2) < 1e-9)
      }
      // within-copy dot product (hence cosine) preserved: the SAME sign
      // vector applies to both members of a copy, and s*s = 1 per dim
      val pairs = rep.select(($"vec_id" % 1000000L).as("m"),
          ($"vec_id" / 1000000L).cast("long").as("c"), $"embedding")
      val a = pairs.filter($"m" === 1L)
        .select($"c", $"embedding".as("ea"))
      val b = pairs.filter($"m" === 2L)
        .select($"c", $"embedding".as("eb"))
      val dots = a.join(b, "c").select($"c",
          aggregate(zip_with($"ea".cast("array<double>"),
            $"eb".cast("array<double>"), (x, y) => x * y), lit(0.0d),
            (acc, x) => acc + x).as("dot"))
        .as[(Long, Double)].collect().toMap
      val d0 = dots(0L)
      (1 until copies).foreach(c => assert(math.abs(dots(c.toLong) - d0) < 1e-9))
      // independent flips: recover each copy's sign vector from replica 1
      // (v1 has no zero components) and check (a) copies differ from each
      // other, (b) dim 63 is NOT tied to dim 0 across all copies (the old
      // d % 63 recipe made flip(c)(63) == flip(c)(0) for every c)
      val signVecs = rep.filter(($"vec_id" % 1000000L) === 1L)
        .select((($"vec_id" / 1000000L).cast("long")).as("c"),
          zip_with($"embedding", typedLit(v1.toSeq),
            (x, o) => when(x * o >= 0f, 1).otherwise(-1)).as("s"))
        .as[(Long, Seq[Int])].collect().toMap
      assert(signVecs(0L).forall(_ == 1)) // copy 0 is the identity
      assert(signVecs.values.toSeq.distinct.size == copies,
        "sign vectors must differ across copies")
      assert((1 until copies).exists(c =>
          signVecs(c.toLong)(63) != signVecs(c.toLong)(0)),
        "dim 63 must not be tied to dim 0 across every copy")
    } finally rep.unpersist()
  }

  test("replicateEvents: distinct cardinalities grow exactly linearly") {
    val base = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-06-01 10:00:00"), 10L, "play",
        1.0, "x"),
      (2L, java.sql.Timestamp.valueOf("2024-06-01 11:00:00"), 20L, "skip",
        2.0, "y")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rep = BenchGrowth.replicateEvents(base, 5)
    assert(rep.count() == 10)
    assert(rep.select("event_id").distinct().count() == 10)
    assert(rep.select("user_id").distinct().count() == 10)
    // non-id columns untouched
    assert(rep.select("event_type").distinct().count() == 2)
  }

  test("replicateDocsSkewed: one global near-identical hot class, " +
      "exact-dedup-proof, 10% of every copy") {
    val base = (0L until 20L).map(i => (i, s"doc body $i unique", "en"))
      .toDF("doc_id", "text", "lang")
    val rep = BenchGrowth.replicateDocsSkewed(base, 4).cache()
    try {
      assert(rep.count() == 80)
      val hot = rep.filter($"text".startsWith(BenchGrowth.hotBody))
      // exactly 10% per copy: ids 7 and 17 in each of the 4 copies
      assert(hot.count() == 8)
      assert(hot.groupBy(($"doc_id" / 10000000L).cast("long")).count()
        .select("count").as[Long].collect().toSeq == Seq.fill(4)(2L))
      // the class spans copies (the body is NOT rotated) but every
      // member is pairwise distinct (the doc-unique tail): exactGroups
      // cannot collapse it
      assert(hot.select("text").distinct().count() == 8)
      // non-hot rows keep the rotation recipe untouched
      assert(rep.filter(!$"text".startsWith("hotword"))
        .count() == 72)
    } finally rep.unpersist()
  }

  test("admissionDelta: half exact dups, half disjoint-vocab fresh docs, " +
      "ids outside the base range") {
    val base = (0L until 200L).map(i => (i, s"doc body $i unique", "en"))
      .toDF("doc_id", "text", "lang")
    val delta = BenchGrowth.admissionDelta(base).cache()
    try {
      // 200 docs → 4 dups (ids ≡ 0 mod 50) + 4 fresh (≡ 1 mod 50)
      assert(delta.count() == 8)
      val dupTexts = delta.filter($"doc_id" >= 900000000L &&
          $"doc_id" < 950000000L)
        .select("text").as[String].collect().toSet
      // the dup half reproduces base texts EXACTLY (true admission dups)
      val baseTexts = base.select("text").as[String].collect().toSet
      assert(dupTexts.size == 4 && dupTexts.subsetOf(baseTexts))
      // the fresh half shares no token with any base doc (per-doc
      // disjoint vocabulary — it must admit cleanly, labeled by nothing)
      val freshTexts = delta.filter($"doc_id" >= 950000000L)
        .select("text").as[String].collect()
      assert(freshTexts.length == 4)
      val baseTokens = baseTexts.flatMap(_.split(" "))
      freshTexts.foreach { t =>
        assert(t.split(" ").toSet.intersect(baseTokens).isEmpty)
      }
      // delta ids never collide with base ids, and the recipe is
      // deterministic (two builds are row-identical)
      assert(delta.join(base, "doc_id").count() == 0)
      assert(BenchGrowth.admissionDelta(base).except(delta).isEmpty)
    } finally delta.unpersist()
  }

  test("replicateDocsSkewed hotTenths widens the class in 10% steps " +
      "and leaves the default corpus bit-identical") {
    val base = (0L until 20L).map(i => (i, s"doc body $i unique", "en"))
      .toDF("doc_id", "text", "lang")
    // hotTenths = 3: residues 7..9 → 30% of every copy (ids 7,8,9,17,18,19)
    val rep30 = BenchGrowth.replicateDocsSkewed(base, 4, hotTenths = 3)
      .cache()
    try {
      val hot = rep30.filter($"text".startsWith(BenchGrowth.hotBody))
      assert(hot.count() == 24)
      assert(hot.groupBy(($"doc_id" / 10000000L).cast("long")).count()
        .select("count").as[Long].collect().toSeq == Seq.fill(4)(6L))
      // still pairwise distinct — exactGroups cannot collapse the class
      assert(hot.select("text").distinct().count() == 24)
      // the 10% corpus is a strict subset: every default-hot doc is hot
      // at 30% too, and the default recipe is unchanged (hotTenths = 1
      // must reproduce the committed r11 corpus exactly)
      val d1 = BenchGrowth.replicateDocsSkewed(base, 4)
      val d1Explicit = BenchGrowth.replicateDocsSkewed(base, 4, hotTenths = 1)
      assert(d1.except(d1Explicit).isEmpty && d1Explicit.except(d1).isEmpty)
      assert(d1.filter($"text".startsWith(BenchGrowth.hotBody))
        .count() == 8)
    } finally rep30.unpersist()
  }

  test("replicateEmbSkewed hotTenths=3 keeps the hot vectors pairwise " +
      "distinct across the widened class") {
    val dims = 8
    val base = (0L until 20L).map { i =>
      (i, Array.tabulate(dims)(d => ((i + d + 1) % 7).toFloat - 3f))
    }.toDF("vec_id", "embedding")
    val rep = BenchGrowth.replicateEmbSkewed(base, 3, dims, hotTenths = 3)
      .cache()
    try {
      val hot = rep.filter(pmod($"vec_id", lit(10)) >= 7)
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      assert(hot.length == 18) // ids 7,8,9,17,18,19 in each of 3 copies
      // pairwise distinct: the per-id epsilon must separate EVERY member
      // of the widened class (nearDupLsh's distinct-vector grain keeps
      // each as its own representative)
      assert(hot.map(_._2.toSeq).distinct.length == 18)
      // default unchanged
      assert(BenchGrowth.replicateEmbSkewed(base, 3, dims)
        .filter(pmod($"vec_id", lit(10)) >= 7)
        .as[(Long, Array[Float])].collect()
        .count(v => v._2.forall(x => x > 0f && x < 0.11f)) == 6)
    } finally rep.unpersist()
  }

  test("replicateEmbSkewed: hot vectors pairwise distinct with " +
      "cosine ~= 1 and shared LSH signature") {
    val dims = 8
    val base = (0L until 20L).map { i =>
      (i, Array.tabulate(dims)(d => ((i + d + 1) % 7).toFloat - 3f))
    }.toDF("vec_id", "embedding")
    val rep = BenchGrowth.replicateEmbSkewed(base, 3, dims).cache()
    try {
      assert(rep.count() == 60)
      val hot = rep.filter(pmod($"vec_id", lit(10)) === 7)
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      assert(hot.length == 6) // ids 7, 17 in each of 3 copies
      // pairwise distinct (per-id epsilon) — the distinct-vector grain
      // of nearDupLsh keeps every member as its own representative
      assert(hot.map(_._2.toSeq).distinct.length == 6)
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
        dot / (na * nb)
      }
      for (i <- hot.indices; j <- i + 1 until hot.length)
        assert(cos(hot(i)._2, hot(j)._2) > 0.999999,
          s"hot pair ${hot(i)._1},${hot(j)._1}")
      // all six land in ONE sign-LSH bucket per table
      val sigs = graft.ext.Similarity.signLshBanded(
        rep.filter(pmod($"vec_id", lit(10)) === 7),
        tables = 4, planesPerTable = 8, dims = dims)
        .groupBy("table").agg(countDistinct($"sig").as("n"))
        .select("n").as[Long].collect()
      assert(sigs.forall(_ == 1L), sigs.toSeq.toString)
    } finally rep.unpersist()
  }
}
