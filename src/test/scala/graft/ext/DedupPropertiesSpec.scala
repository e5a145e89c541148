package graft.ext

import org.apache.spark.sql.functions.{col, count, lit, max, when}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Generated-corpus invariants for the dedup stack: properties that must
  * hold for ANY input, checked over ScalaCheck corpora at fixed seeds. */
class DedupPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("spark", "query", "join", "filter", "window",
    "stream", "table", "scan", "merge", "sort", "row", "data", "fast",
    "slow", "small", "key", "order", "group", "customer", "part")

  private val genDoc: Gen[String] =
    Gen.chooseNum(12, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))

  private def corpus(seedNo: Long): Seq[(Long, String)] = {
    val texts = Gen.listOfN(30, genDoc)
      .pureApply(Gen.Parameters.default, Seed(seedNo))
    val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // inject exact duplicates of docs 0 and 1
    base ++ Seq((100L, base(0)._2), (101L, base(1)._2))
  }

  test("set-similarity prefix filter is lossless across thresholds") {
    // The fixture parity test (GraphSkylineSpec) runs only t=95, where
    // prefixes are 1-2 tokens; lower thresholds grow L = n - ceil(t·n) + 1
    // and exercise the SSJoin size-ratio and PPJoin positional prunes on
    // genuinely overlapping prefixes. Brute force is the definition.
    import org.apache.spark.sql.functions._
    for (seedNo <- 1L to 2L; t100 <- Seq(50, 80, 95)) {
      val docs = corpus(seedNo).toDF("doc_id", "text")
      val fast = Dedup.setSimilarityPairs(docs, t100)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      Dedup.releaseScratch()
      val sets = docs.select(col("doc_id"),
        array_distinct(filter(split(col("text"), " "), x => length(x) > 0))
          .as("toks"))
      val brute = sets.select(col("doc_id").as("doc_a"), col("toks").as("ta"))
        .crossJoin(sets.select(col("doc_id").as("doc_b"),
          col("toks").as("tb")))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ta"), col("tb"))).cast("long")
            .as("inter"),
          size(array_union(col("ta"), col("tb"))).cast("long").as("uni"))
        .filter(col("inter") * 100 >= col("uni") * t100)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(fast == brute,
        s"seed $seedNo t=$t100: fast-brute=${fast -- brute} " +
          s"brute-fast=${brute -- fast}")
    }
  }

  test("dedup invariants hold on generated corpora (3 seeds)") {
    (1L to 3L).foreach { seedNo =>
      val docs = corpus(seedNo).toDF("doc_id", "text")

      // exact duplicates ALWAYS collide in every LSH band — both families
      val cand = Dedup.minhashCandidates(docs)
        .as[(Long, Long)].collect().toSet
      assert(cand.contains((0L, 100L)), s"seed $seedNo: dup 0/100 missed")
      assert(cand.contains((1L, 101L)), s"seed $seedNo: dup 1/101 missed")
      // collapse-before-banding reproduces the direct candidate set
      // exactly, with no pair emitted twice (its raw output carries no
      // corpus-scale distinct)
      val candCollapsed = Dedup.minhashCandidatesCollapsed(docs)
        .as[(Long, Long)].collect()
      Dedup.releaseScratch()
      assert(candCollapsed.length == candCollapsed.toSet.size,
        s"seed $seedNo: collapsed path emitted a duplicate pair")
      assert(candCollapsed.toSet == cand,
        s"seed $seedNo: collapsed=${candCollapsed.toSet -- cand} " +
          s"direct=${cand -- candCollapsed.toSet}")

      val candRolling = Dedup.minhashCandidatesRolling(docs)
        .as[(Long, Long)].collect().toSet
      assert(candRolling.contains((0L, 100L)) &&
        candRolling.contains((1L, 101L)),
        s"seed $seedNo: rolling family missed an exact dup")
      // determinism of the rolling family
      assert(candRolling == Dedup.minhashCandidatesRolling(docs)
        .as[(Long, Long)].collect().toSet)

      // jaccard: identical docs = 1.0; all values in (0, 1]
      val jac = Dedup.ngramJaccard(docs, cand.toSeq.toDF("doc_a", "doc_b"))
        .as[(Long, Long, Double)].collect()
      val jmap = jac.map { case (a, b, v) => (a, b) -> v }.toMap
      assert(jmap((0L, 100L)) == 1.0)
      jac.foreach { case (_, _, v) => assert(v > 0.0 && v <= 1.0) }

      // simhash: identical docs share signatures; hamming within 0..32
      val sig = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
      assert(sig(0L) == sig(100L) && sig(1L) == sig(101L))
      sig.values.foreach(s => assert(s >= 0L && s < (1L << 32)))
      // simhash collapse-before-banding reproduces the direct
      // (pair, hamming) set exactly, with no pair emitted twice. A wide
      // maxHamming keeps cross-class pairs in play on random corpora.
      val simDirect = Dedup.simhashPairs(docs, maxHamming = 12)
        .as[(Long, Long, Int)].collect().toSet
      Dedup.releaseScratch()
      val simCollapsed = Dedup.simhashPairsCollapsed(docs, maxHamming = 12)
        .as[(Long, Long, Int)].collect()
      Dedup.releaseScratch()
      assert(simCollapsed.length == simCollapsed.toSet.size,
        s"seed $seedNo: collapsed simhash path emitted a duplicate pair")
      assert(simCollapsed.toSet == simDirect,
        s"seed $seedNo: collapsed=${simCollapsed.toSet -- simDirect} " +
          s"direct=${simDirect -- simCollapsed.toSet}")

      // clustering: labels are cluster minima and idempotent under re-run
      val comp = Dedup.connectedComponents(cand.toSeq.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      comp.foreach { case (doc, cl) => assert(cl <= doc) }
      assert(comp(100L) <= 0L || comp(100L) == comp(0L))

      // the lifted rep-graph labeling reproduces CC over the direct
      // candidate pairs exactly on arbitrary corpora — same doc set,
      // same min-id labels — and emits each doc once
      val liftedComp = Dedup.minhashComponentsCollapsed(docs)
        .as[(Long, Long)].collect()
      Dedup.releaseScratch()
      assert(liftedComp.length == liftedComp.toSet.size,
        s"seed $seedNo: lifted labeling emitted a doc more than once")
      assert(liftedComp.toMap == comp,
        s"seed $seedNo: lifted=${liftedComp.toMap.toSet -- comp.toSet} " +
          s"direct=${comp.toSet -- liftedComp.toMap.toSet}")

      // simhash lifting: same identity over the simhash pair graph
      val shDirectComp = Dedup.connectedComponents(
          Dedup.simhashPairs(docs, maxHamming = 12)
            .select(col("doc_a"), col("doc_b")))
        .as[(Long, Long)].collect().toMap
      Dedup.releaseScratch()
      val shLifted = Dedup.simhashComponentsCollapsed(docs, maxHamming = 12)
        .as[(Long, Long)].collect()
      Dedup.releaseScratch()
      assert(shLifted.length == shLifted.toSet.size,
        s"seed $seedNo: simhash lifted labeling emitted a doc twice")
      assert(shLifted.toMap == shDirectComp,
        s"seed $seedNo: simhash lifted diverged from direct CC")

      // incremental admission: splitting the corpus at ANY point and
      // folding the tail in as a delta must reproduce CC over
      // (head pairs ∪ delta×head edges) — the incremental contract
      val headDocs = docs.filter(col("doc_id") < 15)
      val deltaDocs = docs.filter(col("doc_id") >= 15)
      val headPairs = Dedup.minhashCandidates(headDocs)
        .localCheckpoint(false)
      val headClusters = Dedup.connectedComponents(headPairs)
      val deltaCand = Dedup.incrementalCandidates(headDocs, deltaDocs)
        .localCheckpoint(false)
      val updated = Dedup.incrementalClusters(headClusters, deltaCand)
        .as[(Long, Long)].collect()
      val groundIncr = Dedup.connectedComponents(headPairs.unionByName(
          deltaCand.select(col("new_id").as("doc_a"),
            col("dup_of").as("doc_b"))))
        .as[(Long, Long)].collect().toMap
      Dedup.releaseScratch()
      assert(updated.length == updated.toSet.size,
        s"seed $seedNo: incremental labeling emitted a doc twice")
      assert(updated.toMap == groundIncr,
        s"seed $seedNo: incremental update diverged from batch CC")

      // keep-best maintenance (r14): folding the same delta into the
      // head's keep-best table must equal batch keep-best over the
      // updated labeling, for ANY scores — coarse-quantized here so
      // cross-entity score TIES occur and the composed (score DESC,
      // id ASC) tie-break is genuinely exercised, with a NULL stripe
      // (doc_id ≡ 3 mod 11) so nulls-lose survives composition too
      val score = when(col("doc_id") % 11 === 3, lit(null).cast("double"))
        .otherwise((col("doc_id") * 7919 % 13).cast("double") / 13.0)
      val headScored = headDocs.select(col("doc_id"),
        score.as("quality_score"))
      val deltaScored = deltaDocs.select(col("doc_id"),
        score.as("quality_score"))
      def kbRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getAs[Long]("entity_id"),
          r.getAs[Long]("keep_id"), r.getAs[Long]("n_members"),
          Option(r.getAs[java.lang.Double]("best_score"))))
      val kb = kbRows(Dedup.incrementalKeepBest(headClusters,
        Dedup.keepBest(headScored, headClusters), deltaCand, deltaScored))
      val kbGround = kbRows(Dedup.keepBest(
        headScored.unionByName(deltaScored),
        updated.toSeq.toDF("doc_id", "cluster_id"))).toSet
      Dedup.releaseScratch()
      assert(kb.length == kb.toSet.size,
        s"seed $seedNo: incremental keep-best emitted an entity twice")
      assert(kb.toSet == kbGround,
        s"seed $seedNo: incremental keep-best diverged from batch")

      // persisted-store admission ≡ recompute on arbitrary corpora (r14
      // VERDICT #6): the store path must survive the round-trip through
      // the bucketed on-disk table, not just frame-level delegation —
      // and compacting that store against the head labeling must leave
      // the maintained cluster table byte-identical (the compaction
      // keeps one member per (band, sig, entity), which is exactly the
      // grain admission contracts to)
      val tbl = s"sig_prop_seed$seedNo"
      Dedup.writeSignatureStore(headDocs, tbl, buckets = 4)
      val candStore = Dedup.incrementalCandidatesFromStore(
          spark.table(tbl), deltaDocs)
        .as[(Long, Long)].collect().toSet
      val candRecompute = deltaCand
        .as[(Long, Long)].collect().toSet
      assert(candStore == candRecompute,
        s"seed $seedNo: store candidates diverged from recompute")
      Dedup.compactSignatureStore(spark, tbl, headClusters)
      val updCompact = Dedup.incrementalClusters(headClusters,
          Dedup.incrementalCandidatesFromStore(spark.table(tbl), deltaDocs))
        .as[(Long, Long)].collect().toMap
      Dedup.releaseScratch()
      assert(updCompact == updated.toMap,
        s"seed $seedNo: admit-after-compact diverged from full-store")
      spark.sql(s"DROP TABLE `$tbl`")

      // applying clusters keeps exactly one representative per cluster
      val kept = Dedup.applyClusters(docs,
          comp.toSeq.toDF("doc_id", "cluster_id"))
        .select("doc_id").as[Long].collect().toSet
      comp.groupBy(_._2).foreach { case (cl, members) =>
        assert(members.keySet.intersect(kept) == Set(cl),
          s"seed $seedNo cluster $cl: kept ${members.keySet.intersect(kept)}")
      }
    }
  }

  test("connectedComponents matches union-find on random graphs (6 seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // sparse edges over a small node domain: several components, cycles,
    // self-loops, and repeated edges all occur across the seeds
    val genEdges: Gen[List[(Long, Long)]] =
      Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 15L)
        b <- Gen.chooseNum(0L, 15L)
      } yield (a, b)))
    (1L to 6L).foreach { seedNo =>
      val edges = genEdges.pureApply(Gen.Parameters.default, Seed(seedNo))
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      // union-find reference, component labeled by its min node id
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val want = nodes.map(n => n -> find(n)).toMap
      assert(got == want, s"seed $seedNo: got $got want $want")
    }
  }

  test("connectedComponents converges on a deep path within default rounds") {
    // Regression for the r13 cc growth-axis failure: a chain-shaped
    // component (diameter ≫ iteration budget) blew past 20 one-hop
    // label-propagation rounds and threw; the r15 star-contraction core
    // closes any path in O(log) two-phase iterations. Shuffled edge
    // order: convergence must not depend on ids arriving chain-ordered.
    val rnd = new scala.util.Random(7)
    val edges = rnd.shuffle((0L until 300L).map(i => (i, i + 1)).toList)
    val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect()
    assert(got.length == 301)
    got.foreach { case (_, c) => assert(c == 0L) }

    // the DEEP-CHAIN shape at corpus scale (r15 storelife finding):
    // cross-step admission twins chained thousands of old cluster
    // labels into one jumbled-id component that label propagation +
    // pointer jumping could not close in 40 rounds (the label forest
    // stays shallow, so jumps are no-ops and the min walks segment by
    // segment — O(#local minima) rounds). Star contraction must close
    // a 25 000-edge path well inside the default budget.
    val deep = spark.range(0, 25000)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val labels = Dedup.connectedComponents(deep)
      .agg(count(lit(1)), max(col("cluster_id"))).head()
    assert(labels.getLong(0) == 25001L && labels.getLong(1) == 0L)
  }

  test("connectedComponents stats estimates do not compound across rounds") {
    // Regression for the r15 storelife driver hang: Spark 4 checkpoints
    // carry originStats, so the per-round label-table stats compounded
    // ^4 per round — with a stats-less leaf (sizeInBytes =
    // spark.sql.defaultSizeInBytes = Long.MaxValue, what a catalog
    // table without ANALYZE reports) a ~10-round run built 10^8-bit
    // BigInteger estimates whose stats-walk MULTIPLICATION pinned the
    // driver for 18+ minutes. The edge list here goes through
    // createDataFrame (a LogicalRDD leaf with default MaxValue stats)
    // and the deep path forces multiple contraction iterations; the
    // stats-free per-iteration checkpoints must keep the final
    // estimate's bit-length flat (a few joins over MaxValue leaves ≈
    // hundreds of bits), not compounding with iteration count.
    val rows = (0L until 300L).map(i =>
      org.apache.spark.sql.Row(i, i + 1))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("doc_b",
        org.apache.spark.sql.types.LongType)))
    val maxValueLeaf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val labeled = Dedup.connectedComponents(maxValueLeaf)
    assert(labeled.as[(Long, Long)].collect().length == 301)
    val sizeBits = labeled.queryExecution.optimizedPlan.stats
      .sizeInBytes.bitLength
    assert(sizeBits < 4096,
      s"stats estimate compounded: $sizeBits-bit sizeInBytes")
  }

  test("sortedNeighborhoodPairs matches a sequential reference (5 seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny alphabet so block keys collide and edit distances spread
    val genText: Gen[String] = Gen.chooseNum(3, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    def lev(s: String, t: String): Int = {
      val dp = Array.tabulate(s.length + 1)(i => i)
      for (j <- 1 to t.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to s.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (s(i - 1) == t(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(s.length)
    }
    val window = 2; val keyLen = 4; val blockLen = 2
    val verifyLen = 10; val maxDist = 5
    (1L to 5L).foreach { seedNo =>
      val texts = Gen.listOfN(40, genText)
        .pureApply(Gen.Parameters.default, Seed(seedNo))
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.sortedNeighborhoodPairs(rows.toDF("doc_id", "text"),
          window, keyLen, blockLen, verifyLen, maxDist)
        .select("doc_a", "doc_b", "dist")
        .as[(Long, Long, Int)].collect().toSet
      val want = rows
        .groupBy { case (_, t) => t.take(blockLen) }.values.flatMap { blk =>
          val sorted = blk.sortBy { case (id, t) => (t.take(keyLen), id) }
          for {
            (a, ia) <- sorted.zipWithIndex
            i <- 1 to window
            if ia + i < sorted.size
            b = sorted(ia + i)
            d = lev(a._2.take(verifyLen), b._2.take(verifyLen))
            if d <= maxDist
          } yield (a._1, b._1, d)
        }.toSet
      assert(got == want, s"seed $seedNo: got ${got.size} want ${want.size}")
    }
  }

  test("containmentPairs matches a set-containment reference (5 seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // messy whitespace and mixed case exercise the normalize contract;
    // short docs (< n tokens) must contribute NO grams and thus no pairs
    val genDoc2: Gen[String] = Gen.chooseNum(1, 12).flatMap(k =>
      Gen.listOfN(k, for {
        w <- Gen.oneOf(vocab.take(6))
        up <- Gen.oneOf(false, true)
        ws <- Gen.oneOf(" ", "  ", "\t", " \n ")
      } yield (if (up) w.toUpperCase else w) + ws).map(_.mkString))
    val n = 3
    (1L to 5L).foreach { seedNo =>
      val texts = Gen.listOfN(14, genDoc2)
        .pureApply(Gen.Parameters.default, Seed(seedNo))
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val allPairs = for {
        a <- rows.indices; b <- rows.indices if a < b
      } yield (a.toLong, b.toLong)
      val got = Dedup.containmentPairs(rows.toDF("doc_id", "text"),
          allPairs.toDF("doc_a", "doc_b"), n = n)
        .select("doc_a", "doc_b", "containment_a", "containment_b")
        .as[(Long, Long, Double, Double)].collect().toSet
      Dedup.releaseScratch()
      def grams(t: String): Set[String] = {
        val toks = t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ").toSeq
        if (toks.size < n) Set.empty
        else toks.sliding(n).map(_.mkString(" ")).toSet
      }
      val g = rows.map { case (i, t) => i -> grams(t) }.toMap
      val want = (for {
        (a, b) <- allPairs
        ga = g(a); gb = g(b)
        if ga.nonEmpty && gb.nonEmpty
        inter = (ga & gb).size
        if inter > 0
        ca = inter.toDouble / ga.size; cb = inter.toDouble / gb.size
        if math.max(ca, cb) >= 0.5
      } yield (a, b, ca, cb)).toSet
      assert(got == want, s"seed $seedNo: got ${got.size} want ${want.size}")
    }
  }

  test("retirement repair equals the live-corpus rebuild (4 seeds)") {
    // The maintained cluster table is a PARTITION (membership rows, no
    // edge history), so conservative-merge deletion and a rebuild from
    // the live partition coincide EXACTLY — making the rebuild a strict
    // oracle here (bridge divergence only exists for edge-defined
    // clusterings; that caveat is documented on retireFromClusters and
    // exercised in DedupSpec). Random partitions over 30 ids, random
    // scores with a null stripe (id % 7 == 3), random retired subsets
    // hitting labels, non-label members, and singletons alike.
    (1L to 4L).foreach { seedNo =>
      val rnd = new scala.util.Random(seedNo)
      val ids = (0L until 30L).toSeq
      val groupOf = ids.map(i => i -> rnd.nextInt(8)).toMap
      val groups = ids.groupBy(groupOf).values.toSeq
      val clusterRows = groups.filter(_.size >= 2)
        .flatMap(ms => ms.map(m => (m, ms.min)))
      val clusters = clusterRows.toDF("doc_id", "cluster_id")
      val scored = ids.map(i => (i,
          if (i % 7 == 3) null.asInstanceOf[java.lang.Double]
          else java.lang.Double.valueOf(rnd.nextDouble())))
        .toDF("doc_id", "quality_score")
      val retiredSeq = {
        val r = ids.filter(_ => rnd.nextBoolean())
        if (r.isEmpty) Seq(0L) else r
      }
      val retiredSet = retiredSeq.toSet
      val retired = retiredSeq.toDF("doc_id")

      // cluster repair vs the in-memory rebuild of the live partition
      val repaired = Dedup.retireFromClusters(clusters, retired)
      val repairedRows = repaired.as[(Long, Long)].collect().toSet
      val expectClusters = groups
        .map(_.filterNot(retiredSet))
        .filter(_.size >= 2)
        .flatMap(ms => ms.map(m => (m, ms.min))).toSet
      assert(repairedRows == expectClusters,
        s"seed $seedNo: repaired $repairedRows expect $expectClusters")

      // keep-best repair vs batch keep-best over the live corpus
      val kb = Dedup.keepBest(scored, clusters).localCheckpoint(false)
      kb.count()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .as[(Long, Long, Long, Option[Double])].collect().toSet
      val got = rows(Dedup.retireKeepBest(kb, clusters, retired, scored))
      val liveScored = scored.join(retired, Seq("doc_id"), "left_anti")
      val expect = rows(Dedup.keepBest(liveScored, repaired))
      assert(got == expect,
        s"seed $seedNo: got-expect=${got -- expect} " +
          s"expect-got=${expect -- got}")

      // and no retired id survives anywhere in either table
      assert(!repairedRows.exists(r =>
        retiredSet(r._1) || retiredSet(r._2)), s"seed $seedNo")
      assert(!got.exists(r => retiredSet(r._1) || retiredSet(r._2)),
        s"seed $seedNo: retired id in keep-best $got")
    }
  }
}
