package graft

import graft.ext.Dedup
import graft.queries.CoreQueries
import org.apache.spark.sql.DataFrame

/** Plan-shape regression tests: the physical properties that make the
  * engine scale are asserted here, so a refactor that silently loses a
  * broadcast, a pushed filter, or a fused exchange fails CI rather than a
  * 100 TB run. (Row-level correctness is the DuckDB gate's job; this pins
  * HOW the answer is computed.) */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("enrich join broadcasts the dimension and pushes its filter") {
    val p = plan(CoreQueries.enrichedEvents(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(p.contains("GreaterThan(c_acctbal,5000.0)"),
      "dim filter must reach the parquet scan")
  }

  test("genre KPIs: hash-agg + broadcast max-tiebreak, no fact window") {
    val p = plan(CoreQueries.genreKpis(spark, dir))
    // a Window node would mean the plan regressed to shuffling and
    // per-group-sorting the whole fact table for the argmax
    assert(!p.contains("Window"),
      s"argmax must not be a fact-table window:\n$p")
    // the A1-A3 branch stays a CODEGEN hash aggregate (primitive/decimal
    // buffers, map-side partials) — the one-pass min(struct) alternative
    // was rejected because it dragged these into SortAggregate
    assert("HashAggregate\\(keys=.*partial_sum".r.findFirstIn(p).isDefined,
      s"A1-A3 partials must run in hash mode:\n$p")
    // the tie-break filters to max-tied rows via a BROADCAST of the
    // per-group maxima — the fact stream is never shuffled for the argmax.
    // Count >= 3: the enrich dimension join appears twice (once per fact
    // scan) and would still be present if the maxima join regressed to a
    // shuffle, so a bare contains() would be vacuous here
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 3,
      s"expected enrich joins + the maxima broadcast join, got $bhj:\n$p")
    // group-grain exchanges only: agg partials, tie partials, final join —
    // anything more means a fact-grain shuffle crept back in
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges <= 3,
      s"expected <=3 group-grain hash exchanges, got $hashExchanges:\n$p")
  }

  test("events scan prunes to the used columns") {
    val p = plan(CoreQueries.enrichedEvents(spark, dir)
      .select("event_id", "c_mktsegment"))
    // props (the widest column) must not be read
    assert(!p.contains("props"), "unused column read from parquet")
  }

  test("top-1 windows use WindowGroupLimit pushdown") {
    val p = plan(SparkEntry.queries("w2_top_artist")(spark, dir))
    assert(p.contains("WindowGroupLimit"), p.take(500))
  }

  test("null-key drop turns the left join into an inner join") {
    val p = plan(SparkEntry.queries("genre_kpis")(spark, dir))
    assert(!p.contains("LeftOuter"),
      "IsNotNull on join output should convert left->inner")
  }

  test("fused hourly KPIs execute the shared pre-aggregation stage once") {
    val df = CoreQueries.hourlyKpisFused(spark, dir)
    df.collect() // AQE proves reuse at runtime, not in the static plan
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"))
    assert(p.contains("Reused"),
      s"expected the shared l1 stage to be reused (one fact scan):\n$p")
    // and the result matches the two-scan parity formulation exactly
    val parity = CoreQueries.hourlyKpis(spark, dir).collect().toSeq
    assert(df.collect().toSeq === parity)
  }

  test("pretraining pipeline fuses to one hash exchange and no join") {
    val p = plan(graft.ext.Pretrain.curate(
      graft.io.Sources.table(spark, dir, "documents")))
    // gates + signals + split fuse into the scan-side map; the only hash
    // exchange is the exact-dedup window on content_hash (scatter's
    // round-robin, if present, is not a hash exchange)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange (dedup window), got $hashExchanges:\n$p")
    assert(!p.contains("Join"), s"composition must not join stages:\n$p")
  }

  test("funnel: both windows and the final aggregate share one exchange") {
    val p = plan(SparkEntry.queries("f_funnel_stages")(spark, dir))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1,
      s"expected 1 user-keyed exchange for window chain + agg, got $hashExchanges:\n$p")
  }

  test("scatter adds an exchange for an under-partitioned source") {
    import graft.io.Sources
    // testdata parquet is single-row-group → one scan partition → scatter
    // must introduce the round-robin exchange.
    val docs = Sources.table(spark, dir, "documents").select("doc_id")
    assert(docs.rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism)
    val out = Sources.scatter(docs)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(plan(out).contains("Exchange RoundRobinPartitioning"))
  }

  test("scatter is a no-op when the source is already parallel enough") {
    import graft.io.Sources
    val docs = Sources.table(spark, dir, "documents").select("doc_id")
    val already = docs.repartition(spark.sparkContext.defaultParallelism * 2)
    val out = Sources.scatter(already)
    // same DataFrame back: no second exchange stacked on the first
    assert(out eq already, "scatter must pass an already-wide frame through")
    val exchanges = "Exchange RoundRobinPartitioning".r
      .findAllIn(plan(out)).length
    assert(exchanges == 1, s"expected only the test's own exchange:\n${plan(out)}")
  }

  test("q5 star join broadcasts every dimension and pushes the region filter") {
    val p = plan(SparkEntry.queries("q5_star_join")(spark, dir))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"supplier/nation/region must broadcast:\n$p")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      "region predicate must reach the parquet scan")
  }

  test("merge-apply compiles to ONE full-outer join, no per-op passes") {
    val p = plan(SparkEntry.queries("etl_merge_apply")(spark, dir))
    val joins = "Join".r.findAllIn(p).length
    assert(p.contains("FullOuter"), p.take(800))
    assert(joins == 1, s"expected a single join, got $joins:\n$p")
  }

  test("snapshot-diff compiles to ONE full-outer join, like the apply side") {
    val p = plan(SparkEntry.queries("etl_snapshot_diff")(spark, dir))
    val joins = "Join".r.findAllIn(p).length
    assert(p.contains("FullOuter"), p.take(800))
    assert(joins == 1, s"expected a single join, got $joins:\n$p")
  }

  test("correlated subqueries decorrelate into joins (no per-row re-execution)") {
    val p = plan(SparkEntry.queries("q_subqueries")(spark, dir))
    assert(!p.contains("Subquery"),
      "scalar subqueries must be rewritten to aggregate-joins")
    assert(p.contains("LeftSemi"), "EXISTS must become a semi join")
  }

  test("lateral top-2 plans as WindowGroupLimit with a map-side partial pass") {
    val p = plan(SparkEntry.queries("j_lateral_top2")(spark, dir))
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(p.contains("row_number(), 2, Partial"),
      "per-key limit must run map-side before the exchange")
  }

  test("sparse-cosine query plans without a driver-side data job") {
    // N rides as a lazy broadcast 1-row aggregate; building the full
    // inverted-index pipeline must add no jobs over a bare documents scan.
    // Jobs are counted in DEDICATED job groups: the default group's id
    // list is evicted past spark.ui.retainedJobs, so global before/after
    // deltas go negative once the shared test session has run enough.
    val scanJobs = jobsInGroup("planspec-sparse-scan") {
      graft.io.Sources.table(spark, dir, "documents")
    }
    val queryJobs = jobsInGroup("planspec-sparse-query") {
      assert(SparkEntry.queries("sim_sparse_cosine")(spark, dir) != null)
    }
    assert(queryJobs <= scanJobs,
      s"query construction ran $queryJobs job(s) vs $scanJobs for a bare scan")
  }

  /** Count Spark jobs triggered by `body`, isolated in a job group so the
    * default group's retained-jobs eviction cannot skew the delta. */
  private def jobsInGroup(tag: String)(body: => Unit): Int = {
    spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = false)
    try {
      body
      spark.sparkContext.statusTracker.getJobIdsForGroup(tag).length
    } finally spark.sparkContext.clearJobGroup()
  }

  test("co-purchase pairs: basket expansion, not a fact self-join") {
    val p = plan(SparkEntry.queries("g_copurchase_pairs")(spark, dir))
    assert(!p.contains("Join"),
      s"pair expansion must come from the basket HOF, not a self-join:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"lineitem must be scanned once, got $scans:\n$p")
  }

  test("EWMA: range-window fold, no self-join on the daily grain") {
    val p = plan(SparkEntry.queries("t_ewma_daily")(spark, dir))
    assert(!p.contains("Join"),
      s"decayed sum must be a window fold, not the oracle's self-join:\n$p")
    assert(p.contains("RangeFrame, -13"),
      s"horizon must be a value-bounded RANGE frame:\n$p")
  }

  test("bitmap exact-distinct avoids the Expand multi-distinct shape") {
    val p = plan(SparkEntry.queries("a_bitmap_distinct")(spark, dir))
    assert(!p.contains("Expand"),
      s"bitmap path must not expand rows per distinct column:\n$p")
    // the fixed-size bitmap state must OR-merge map-side — that partial
    // combine is what bounds the exchange at 100 TB
    assert(p.contains("partial_bitmap_construct_agg"),
      s"bitmap build must combine map-side:\n$p")
  }

  test("sign-LSH query plans without a driver-side data job") {
    // sign-LSH previously probed dims via head() at plan-construction time.
    // spark.read.parquet itself runs a fixed footer/schema job, so measure
    // against that: building the full query must add NO jobs beyond the
    // plain table read. Group-scoped counting — see jobsInGroup.
    val scanJobs = jobsInGroup("planspec-lsh-scan") {
      graft.io.Sources.table(spark, dir, "embeddings")
    }
    var built: org.apache.spark.sql.DataFrame = null
    val queryJobs = jobsInGroup("planspec-lsh-query") {
      built = SparkEntry.queries("sim_neardup_lsh")(spark, dir)
    }
    assert(built != null)
    assert(queryJobs <= scanJobs,
      s"query construction ran $queryJobs job(s) vs $scanJobs for a bare scan" +
        " — a data-dependent probe (head()/count()) is back in the plan path")
  }

  test("SemDeDup pairs meet on the trained cell key, never all-pairs") {
    val p = plan(SparkEntry.queries("dedup_semantic")(spark, dir))
    assert(!p.contains("CartesianProduct"),
      s"within-cell pairing must be a keyed join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"no all-pairs nested loop anywhere in the dedup path:\n$p")
  }

  test("DSIR: model broadcasts; the doc-grain rank is not a window") {
    val p = plan(SparkEntry.queries("f_dsir_weights")(spark, dir))
    assert(p.contains("BroadcastExchange"),
      s"the buckets-row model must broadcast into the scoring join:\n$p")
    assert(!p.contains("Window"),
      s"selection rank must come from GlobalIndex, not an " +
        s"empty-partition ROW_NUMBER window:\n$p")
  }

  test("q21: one aggregate replaces both correlated EXISTS probes") {
    val p = plan(SparkEntry.queries("q21_supp_wait")(spark, dir))
    // lineitem twice (qualifier agg + probe), orders once, supplier once;
    // upper bound (not exact) so scan reuse / formatting shifts across
    // Spark versions can't fail the suite without a real regression
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 4,
      s"expected <=4 parquet scans (no triple fact self-join), got $scans:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"supplier must broadcast:\n$p")
    assert(!p.contains("Expand"),
      s"qualifier must be the two-level aggregate, not multi-distinct " +
        s"Expand (row doubling through the first exchange):\n$p")
  }

  test("q20: triple-nested subqueries flatten to one fact scan") {
    val p = plan(SparkEntry.queries("q20_excess_supp")(spark, dir))
    // the textbook plan scans lineitem three times (IN + two correlated
    // SUMs); the flattened plan touches it exactly once
    val liScans = "Scan parquet[^\\n]*lineitem".r.findAllIn(p).length
    assert(liScans == 1,
      s"expected a single lineitem scan, got $liScans:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"no per-row subquery execution:\n$p")
  }

  test("q2: correlated MIN becomes aggregate + equality join, fact scanned once") {
    val p = plan(SparkEntry.queries("q2_min_cost_supp")(spark, dir))
    // the pair-cost subtree feeds both the per-part MIN and the
    // join-back, so it appears twice pre-AQE (identical subtrees —
    // runtime ReuseExchange dedupes them); the textbook correlated form
    // would instead re-run the whole dim subtree per outer row
    val liScans = "Scan parquet[^\\n]*lineitem".r.findAllIn(p).length
    assert(liScans <= 2,
      s"expected the shared pair-cost subtree (<=2 lineitem scans), got $liScans:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the min must meet its pairs through a keyed join:\n$p")
  }

  test("q11: global-scalar HAVING rides a 1-row broadcast, not a rescan") {
    val p = plan(SparkEntry.queries("q11_important_parts")(spark, dir))
    val liScans = "Scan parquet[^\\n]*lineitem".r.findAllIn(p).length
    assert(liScans <= 2,
      s"the global total must come from the per-part frame (an exchange " +
        s"reuse or at worst one extra scan), not a full textbook " +
        s"re-aggregation chain, got $liScans:\n$p")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row total must broadcast into the HAVING filter:\n$p")
  }

  test("pagerank consumes one edge materialization, not per-round rebuilds") {
    // ReuseExchange cannot unify the pair-explode subtrees (lambda
    // canonicalization), so without the lazy localCheckpoint the unrolled
    // 3-iteration plan rebuilds the edge pipeline from parquet 14 times
    // (42 exchanges). The checkpointed shape reads the shared edge RDD.
    val p = plan(SparkEntry.queries("g_pagerank_int")(spark, dir))
    val liScans = "Scan parquet[^\\n]*lineitem".r.findAllIn(p).length
    assert(liScans == 0,
      s"iterations must consume the checkpointed edge table, got " +
        s"$liScans lineitem rebuild(s):\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 12,
      s"expected the collapsed plan (~8 exchanges), got $exchanges:\n$p")
  }

  test("triangle count consumes one edge materialization across all sides") {
    val p = plan(SparkEntry.queries("g_triangle_count")(spark, dir))
    val liScans = "Scan parquet[^\\n]*lineitem".r.findAllIn(p).length
    assert(liScans == 0,
      s"degree/wedge/closing sides must share the checkpointed edges, " +
        s"got $liScans lineitem rebuild(s):\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 8,
      s"expected the collapsed plan (~4 exchanges), got $exchanges:\n$p")
  }

  test("paragraph dedup: keyed joins only, staged tokenization reused") {
    val p = plan(SparkEntry.queries("text_para_dedup")(spark, dir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"paragraph matching must stay keyed on the block text:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"the exploded paragraph table feeds three consumers and must be " +
        s"staged once (persistScratch):\n$p")
    Dedup.releaseScratch()
  }
}
