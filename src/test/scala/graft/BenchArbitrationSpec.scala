package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the bench warm-pass arbitration policy — the three
  * measurement-integrity behaviors every BENCH_full.json perf claim rests
  * on (see BenchArbitration scaladoc). No Spark session needed: the policy
  * is pure. */
class BenchArbitrationSpec extends AnyFunSuite {

  private val record =
    """{"metric":"total","value":10.0,"sf":"/root/testdata/sf0.1",
      |"queries_warm":{"q1_agg":1.5,"f2_null_scan":0.25}}"""
      .stripMargin.replace("\n", "")

  test("committed warm baseline is trusted only at a matching sf") {
    val warm = BenchArbitration
      .parseCommittedWarm(record, "/root/testdata/sf0.1")
    assert(warm == Map("q1_agg" -> 1.5, "f2_null_scan" -> 0.25))
    // an sf0.1 record must not set expectations for an sf0.01 run
    assert(BenchArbitration
      .parseCommittedWarm(record, "/root/testdata/sf0.01").isEmpty)
  }

  test("a failed query's warm time never becomes the retime expectation") {
    // a committed record where q2 threw stores its TIME-TO-FAILURE
    // (near zero) in queries_warm; using that as the expectation would
    // force a pointless retime of the next healthy run's genuine timing
    val withFailed =
      """{"metric":"total","value":10.0,"sf":"/d",
        |"failed":["q2_broken"],
        |"queries_warm":{"q1_agg":1.5,"q2_broken":0.001}}"""
        .stripMargin.replace("\n", "")
    assert(BenchArbitration.parseCommittedWarm(withFailed, "/d") ==
      Map("q1_agg" -> 1.5))
  }

  test("records without sf or queries_warm, and garbage, yield no baseline") {
    assert(BenchArbitration
      .parseCommittedWarm("""{"queries_warm":{"q":1.0}}""", "x").isEmpty)
    assert(BenchArbitration
      .parseCommittedWarm("""{"sf":"x"}""", "x").isEmpty)
    assert(BenchArbitration.parseCommittedWarm("not json{", "x").isEmpty)
  }

  test("readCommittedWarm: missing file is an empty baseline, not a crash") {
    assert(BenchArbitration
      .readCommittedWarm("/nonexistent/BENCH.json", "x").isEmpty)
  }

  test("baseline path honors SPARK_GRAFT_BENCH_OUT") {
    val env = Map("SPARK_GRAFT_BENCH_OUT" -> "/tmp/alt-bench.json")
    assert(BenchArbitration.benchOutPath(env.get) == "/tmp/alt-bench.json")
    assert(BenchArbitration.benchOutPath(_ => None) == "BENCH_full.json")
  }

  test("uniq-canary medians: sf guard, short-series guard, per-phase keys") {
    val rec =
      """{"metric":"total","value":10.0,"sf":"/d",
        |"canary_uniq_cold":[1.0,2.0,4.0],
        |"canary_uniq_warm":[0.5,0.7]}""".stripMargin.replace("\n", "")
    assert(BenchArbitration.parseUniqCanaryMedians(rec, "/d") ==
      Map("cold" -> 2.0, "warm" -> 0.6))
    // cross-SF medians are not comparable (canary runs at the record's SF)
    assert(BenchArbitration.parseUniqCanaryMedians(rec, "/other").isEmpty)
    // a single sample is no median; the other phase still parses
    val short =
      """{"sf":"/d","canary_uniq_cold":[1.0],"canary_uniq_warm":[1.0,3.0]}"""
    assert(BenchArbitration.parseUniqCanaryMedians(short, "/d") ==
      Map("warm" -> 2.0))
    assert(BenchArbitration.parseUniqCanaryMedians("not json{", "/d").isEmpty)
    assert(BenchArbitration
      .readUniqCanaryMedians("/nonexistent/BENCH.json", "/d").isEmpty)
  }

  test("repeat-canary medians parse the canary_cold/canary_warm series") {
    // the r12 slide mode: execution-path degradation moves the REPEAT
    // canary while the compile-sensitive uniq one under-corrects — the
    // repeat medians feed the second normalization flavor
    val rec =
      """{"metric":"total","value":10.0,"sf":"/d",
        |"canary_cold":[1.0,1.2,1.4],
        |"canary_warm":[1.0,1.5],
        |"canary_uniq_cold":[9.0,9.0]}""".stripMargin.replace("\n", "")
    assert(BenchArbitration.parseRepeatCanaryMedians(rec, "/d") ==
      Map("cold" -> 1.2, "warm" -> 1.25))
    // same guards as the uniq flavor: sf mismatch and short series
    assert(BenchArbitration.parseRepeatCanaryMedians(rec, "/other").isEmpty)
    assert(BenchArbitration.parseRepeatCanaryMedians(
      """{"sf":"/d","canary_cold":[1.0]}""", "/d").isEmpty)
    // the two flavors read DIFFERENT series from the same record
    assert(BenchArbitration.parseUniqCanaryMedians(rec, "/d") ==
      Map("cold" -> 9.0))
  }

  test("committedRecordText prefers git HEAD over the working-tree file") {
    // Bench overwrites its own baseline file at the end of every run: two
    // back-to-back uncommitted runs must not re-baseline the second
    // against the first. This spec runs from the repo root, where
    // BENCH_full.json is committed — the git-HEAD version must win even
    // though a (possibly different) working-tree file exists.
    // worktrees: .git may be a file, not a directory — exists() covers both
    assume(new java.io.File(".git").exists
      && new java.io.File("BENCH_full.json").exists)
    val (txt, source) = BenchArbitration.committedRecordText("BENCH_full.json")
    assert(source == "git-HEAD", source)
    assert(txt.contains("\"metric\""), txt.take(80))
    // an untracked path (the forced-demo /tmp copy flow) falls back to the
    // file with provenance "file"
    val tmp = java.nio.file.Files.createTempFile("graft-bench", ".json")
    java.nio.file.Files.writeString(tmp, """{"metric":"total"}""")
    val (txt2, source2) = BenchArbitration.committedRecordText(tmp.toString)
    assert(source2 == "file" && txt2.contains("total"))
    java.nio.file.Files.delete(tmp)
    // neither git nor file: empty text, provenance "none", no crash
    assert(BenchArbitration.committedRecordText("/nonexistent/B.json") ==
      ("", "none"))
  }

  test("median matches bench_diff/arbitrate (mean-of-middle-two on even n)") {
    assert(BenchArbitration.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(BenchArbitration.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
  }

  test("normalized total scales by committed/observed; degenerate -> None") {
    // observed box 30% slower than the committed record's: a 190s raw warm
    // reads back as ~146s on the committed box
    val n = BenchArbitration.normalizedTotal(190.0, Some(1.0), Some(1.3))
    assert(n.exists(v => math.abs(v - 190.0 / 1.3) < 1e-9))
    // identical boxes: normalization is the identity
    assert(BenchArbitration.normalizedTotal(100.0, Some(0.8), Some(0.8))
      .contains(100.0))
    // missing or non-positive medians: no advisory number, never a crash
    assert(BenchArbitration.normalizedTotal(100.0, None, Some(1.0)).isEmpty)
    assert(BenchArbitration.normalizedTotal(100.0, Some(1.0), None).isEmpty)
    assert(BenchArbitration.normalizedTotal(100.0, Some(0.0), Some(1.0)).isEmpty)
    assert(BenchArbitration.normalizedTotal(100.0, Some(1.0), Some(0.0)).isEmpty)
  }

  test("retime trigger needs 2x ratio AND 0.5s excess AND a non-failed run") {
    val n = BenchArbitration.needsRetime _
    assert(n(2.0, 0.9, false))          // 2.2x, +1.1s
    assert(n(0.8, 0.3, false))          // 2.7x, exactly +0.5s — at the floor
    assert(!n(0.7, 0.3, false))         // 2.3x but +0.4s — under the floor
    assert(!n(5.0, 4.0, false))         // +1.0s but only 1.25x — under ratio
    assert(!n(2.0, 0.9, true))          // failed queries are never retimed
  }

  test("chunk time ratios: per-chunk sums, low-mass and no-baseline guards") {
    val committed = Map("a" -> 1.0, "b" -> 2.0, "c" -> 1.0, "d" -> 1.0,
      "e" -> 0.2)
    // chunk 0 (a,b) flat; chunk 1 (c,d) stalled 3x; chunk 2 (e alone)
    // has only 0.2s of committed mass -> None, not a noise ratio
    val observed = Seq("a" -> 1.1, "b" -> 1.9, "c" -> 3.0, "d" -> 3.0,
      "e" -> 1.7)
    val rs = BenchArbitration.chunkTimeRatios(observed, committed, 2)
    assert(rs.size == 3)
    assert(rs(0).exists(r => math.abs(r - 1.0) < 1e-9))
    assert(rs(1).exists(r => math.abs(r - 3.0) < 1e-9))
    assert(rs(2).isEmpty)
    // a query absent from the baseline contributes to NEITHER sum — the
    // ratio stays a like-for-like comparison
    val rs2 = BenchArbitration.chunkTimeRatios(
      Seq("a" -> 1.0, "new_q" -> 99.0), Map("a" -> 1.0), 2)
    assert(rs2 == Seq(Some(1.0)))
    // no committed baseline at all -> no series (the record omits the
    // field rather than stamping all-null)
    assert(BenchArbitration.chunkTimeRatios(observed, Map.empty, 2).isEmpty)
  }

  test("canary ratio series: per-sample over committed median, guarded") {
    val rs = BenchArbitration.canaryRatioSeries(Seq(1.0, 1.5, 3.0), Some(1.5))
    assert(rs.size == 3 && math.abs(rs(2) - 2.0) < 1e-9)
    assert(BenchArbitration.canaryRatioSeries(Seq(1.0), None).isEmpty)
    assert(BenchArbitration.canaryRatioSeries(Seq(1.0), Some(0.0)).isEmpty)
  }

  test("committed cold baseline parses the queries map with the same guards") {
    val rec =
      """{"metric":"total","sf":"/root/testdata/sf0.1","failed":["bad_q"],
        |"queries":{"q1_agg":2.5,"bad_q":0.01},
        |"queries_warm":{"q1_agg":1.5}}""".stripMargin.replace("\n", "")
    val cold = BenchArbitration
      .parseCommittedCold(rec, "/root/testdata/sf0.1")
    // failed queries excluded — their cold time is a time-to-failure
    assert(cold == Map("q1_agg" -> 2.5))
    assert(BenchArbitration
      .parseCommittedCold(rec, "/root/testdata/sf0.01").isEmpty)
  }

  test("only a successful retime may lower the sample") {
    // success: min of the two samples (noise is one-sided additive)
    assert(BenchArbitration.merged(3.0, retimeOk = true, 1.2) == 1.2)
    assert(BenchArbitration.merged(1.0, retimeOk = true, 2.5) == 1.0)
    // failure: a crashed retime returns near-instantly — keeping min would
    // record a fake fast warm pass; the original sample must survive
    assert(BenchArbitration.merged(3.0, retimeOk = false, 0.01) == 3.0)
  }
}
