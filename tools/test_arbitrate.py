#!/usr/bin/env python3
"""Unit coverage for tools/arbitrate.py: flag re-derivation must match
bench_diff's thresholds (including the streaming RESTATED carve-out),
the verdict math must judge warm flags on the steady median and cold
flags on pass 1, and the stamped record must stay a parseable JSON line
with the original fields intact. bench_one is monkeypatched — no JVMs
here. Plain asserts, no pytest; run directly:

    python3 tools/test_arbitrate.py

Invoked from sbt test via BenchDiffToolSpec alongside test_bench_diff.
"""
import json
import os
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import arbitrate  # noqa: E402


def record(queries, queries_warm):
    return {
        "metric": "total", "value": sum(queries.values()),
        "warm_total": sum(queries_warm.values()),
        "queries": queries, "queries_warm": queries_warm,
        "canary_cold": [0.1] * 4, "canary_warm": [0.1] * 4,
        "failed": [], "retimed": [], "sf": "/root/testdata/sf0.1",
    }


def write(d, name, rec):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        json.dump(rec, f)
    return p


def run_main(argv, fake_series):
    calls = []

    def fake_bench_one(query, passes, sf_dir):
        calls.append((query, passes, sf_dir))
        return fake_series[query]

    orig, arbitrate.bench_one = arbitrate.bench_one, fake_bench_one
    orig_argv, sys.argv = sys.argv, ["arbitrate.py"] + argv
    try:
        rc = arbitrate.main()
    finally:
        arbitrate.bench_one = orig
        sys.argv = orig_argv
    return rc, calls


def test_flags_match_bench_diff_thresholds():
    with tempfile.TemporaryDirectory() as d:
        old = record({"a": 1.0, "b": 1.0}, {"a": 1.0, "streaming_x": 0.07})
        # a: cold 1.0->1.4 (1.4x, under ratio) not flagged;
        # b: cold 1.0->2.0 flagged; a warm 1.0->3.0 flagged;
        # streaming_x warm 0.07->2.0 is the RESTATED carve-out, skipped
        new = record({"a": 1.4, "b": 2.0},
                     {"a": 3.0, "streaming_x": 2.0})
        np_, op = write(d, "new.json", new), write(d, "old.json", old)
        flags = arbitrate.flags_from_diff(np_, op)
        assert sorted((p, q) for p, q, *_ in flags) == [
            ("queries", "b"), ("queries_warm", "a")], flags


def test_warm_steady_vs_cold_pass1_verdicts():
    with tempfile.TemporaryDirectory() as d:
        old = record({"c": 1.0}, {"w": 1.0})
        new = record({"c": 3.0}, {"w": 3.0})
        np_, op = write(d, "new.json", new), write(d, "old.json", old)
        # w: flagged warm at 3.0 but fresh steady median(1.1,1.0,1.2)=1.1
        #    -> jitter; c: flagged cold, fresh pass1 2.9 -> confirmed
        rc, calls = run_main(
            [np_, "--old", op],
            {"w": [9.0, 1.1, 1.0, 1.2], "c": [2.9, 1.0, 1.0, 1.0]})
        assert rc == 1, rc  # one confirmed flag -> nonzero
        assert all(p == arbitrate.PASSES for _, p, _ in calls), calls
        with open(np_) as f:
            stamped = json.load(f)
        arb = stamped["arbitration"]
        assert arb["w"]["verdict"] == "jitter", arb
        assert abs(arb["w"]["steady"] - 1.1) < 1e-9, arb
        assert arb["c"]["verdict"] == "confirmed", arb
        assert arb["c"]["passes"][0] == 2.9, arb
        # original record fields survive the stamp
        assert stamped["queries"] == new["queries"], stamped


def test_forced_query_prefers_warm_and_all_jitter_exits_zero():
    with tempfile.TemporaryDirectory() as d:
        old = record({"q": 1.0}, {"q": 1.0})
        new = record({"q": 1.0}, {"q": 1.0})  # nothing flagged
        np_, op = write(d, "new.json", new), write(d, "old.json", old)
        rc, calls = run_main([np_, "--old", op, "--passes", "3", "q"],
                             {"q": [2.0, 1.0, 1.1]})
        assert rc == 0, rc
        assert calls == [("q", 3, "/root/testdata/sf0.1")], calls
        with open(np_) as f:
            arb = json.load(f)["arbitration"]["q"]
        assert arb["phase"] == "queries_warm", arb
        assert arb["verdict"] == "jitter", arb


def test_no_flags_leaves_record_untouched():
    with tempfile.TemporaryDirectory() as d:
        old = record({"q": 1.0}, {"q": 1.0})
        new = record({"q": 1.0}, {"q": 1.0})
        np_, op = write(d, "new.json", new), write(d, "old.json", old)
        before = open(np_).read()
        rc, calls = run_main([np_, "--old", op], {})
        assert rc == 0 and calls == [], (rc, calls)
        assert open(np_).read() == before


def test_box_verdict_when_uniq_canary_explains_the_shift():
    with tempfile.TemporaryDirectory() as d:
        # cold a unchanged (1.8 -> 1.8, no flag); warm a and b 1.0 -> 1.8
        # (>=1.5x, >=0.5s): flagged. The uniq canary medians also moved
        # 1.0 -> 1.8, so a fresh-JVM series that re-measures ~1.8 must
        # stamp `box`, not `confirmed`
        old = record({"a": 1.8}, {"a": 1.0, "b": 1.0})
        old["canary_uniq_cold"] = [1.0, 1.0]
        old["canary_uniq_warm"] = [1.0, 1.0]
        new = record({"a": 1.8}, {"a": 1.8, "b": 1.8})
        new["canary_uniq_cold"] = [1.8, 1.8]
        new["canary_uniq_warm"] = [1.8, 1.8]
        new_p = write(d, "new.json", new)
        old_p = write(d, "old.json", old)
        rc, _ = run_main([new_p, "--old", old_p],
                         {"a": [5.0, 1.8, 1.8, 1.8],
                          "b": [5.0, 1.8, 1.8, 1.8]})
        # box verdicts exit 2 (not 0): the heuristic can absorb a genuine
        # regression coinciding with a host-wide shift, so CI must surface
        # the run for re-arbitration on a healthy box
        assert rc == 2, rc
        got = json.load(open(new_p))["arbitration"]
        assert got["a"]["verdict"] == "box", got
        assert got["b"]["verdict"] == "box", got
        # without the canary fields in the OLD record, the same series
        # stays `confirmed` (no baseline to attribute the shift to)
        old2 = record({"a": 1.0}, {"a": 1.0})
        new2 = record({"a": 1.8}, {"a": 1.8})
        new2["canary_uniq_cold"] = [1.8, 1.8]
        new2_p = write(d, "new2.json", new2)
        old2_p = write(d, "old2.json", old2)
        rc2, _ = run_main([new2_p, "--old", old2_p],
                          {"a": [5.0, 1.8, 1.8, 1.8]})
        assert rc2 == 1, rc2  # confirmed regressions exit 1
        got2 = json.load(open(new2_p))["arbitration"]
        assert got2["a"]["verdict"] == "confirmed", got2


def test_confirmed_verdict_survives_a_same_query_box_verdict():
    with tempfile.TemporaryDirectory() as d:
        # q flagged in BOTH phases: the cold fresh-JVM pass1 (5.0) is far
        # beyond what the 1.8x box shift explains -> confirmed; the warm
        # steady (1.8) matches the shift -> box. The record is keyed by
        # query name, so the later warm entry must NOT bury the confirmed
        # cold one, and the exit must be 1 (a real regression), not 2.
        old = record({"q": 1.0}, {"q": 1.0})
        old["canary_uniq_cold"] = [1.0, 1.0]
        old["canary_uniq_warm"] = [1.0, 1.0]
        new = record({"q": 5.0}, {"q": 1.8})
        new["canary_uniq_cold"] = [1.8, 1.8]
        new["canary_uniq_warm"] = [1.8, 1.8]
        new_p = write(d, "new.json", new)
        old_p = write(d, "old.json", old)
        rc, _ = run_main([new_p, "--old", old_p],
                         {"q": [5.0, 1.8, 1.8, 1.8]})
        assert rc == 1, rc
        got = json.load(open(new_p))["arbitration"]["q"]
        assert got["verdict"] == "confirmed" and got["phase"] == "queries", got


def test_rearbitration_can_downgrade_a_stale_stamp():
    with tempfile.TemporaryDirectory() as d:
        # the record carries a PRIOR run's `box` stamp for q (the exit-2
        # "re-run on a healthy box" flow). The healthy-box rerun measures
        # jitter — the fresh arbitration must REPLACE the stale entry, not
        # keep it under the more-severe rule (which applies only among
        # verdicts written in one invocation)
        old = record({"q": 1.0}, {"q": 1.0})
        new = record({"q": 1.0}, {"q": 1.8})
        new["arbitration"] = {"q": {"phase": "queries_warm", "old": 1.0,
                                    "flagged": 1.8, "passes": [1.8],
                                    "steady": 1.8, "verdict": "box"}}
        np_, op = write(d, "new.json", new), write(d, "old.json", old)
        rc, _ = run_main([np_, "--old", op], {"q": [2.0, 1.0, 1.0, 1.1]})
        assert rc == 0, rc
        got = json.load(open(np_))["arbitration"]["q"]
        assert got["verdict"] == "jitter", got


def test_box_ratio_override_replaces_record_derived_ratio():
    with tempfile.TemporaryDirectory() as d:
        # both records' uniq canaries moved 1.0 -> 1.8, so the DERIVED
        # ratio would absorb a genuine 1.8x regression as `box`. The
        # healthy-box re-arbitration passes --box-ratio 1.0 (measured on
        # the box the fresh-JVM reruns run on): the same series must now
        # stamp `confirmed`.
        old = record({"a": 1.8}, {"a": 1.0})
        old["canary_uniq_warm"] = [1.0, 1.0]
        new = record({"a": 1.8}, {"a": 1.8})
        new["canary_uniq_warm"] = [1.8, 1.8]
        np_, op = write(d, "new.json", new), write(d, "old.json", old)
        rc, _ = run_main([np_, "--old", op, "--box-ratio", "1.0"],
                         {"a": [5.0, 1.8, 1.8, 1.8]})
        assert rc == 1, rc
        got = json.load(open(np_))["arbitration"]["a"]
        assert got["verdict"] == "confirmed", got
        # and the converse: a derived-ratio-free pair (no canary fields)
        # with --box-ratio 1.8 attributes the same shift to the box
        old2 = record({"a": 1.8}, {"a": 1.0})
        new2 = record({"a": 1.8}, {"a": 1.8})
        np2, op2 = write(d, "new2.json", new2), write(d, "old2.json", old2)
        rc2, _ = run_main([np2, "--old", op2, "--box-ratio", "1.8"],
                          {"a": [5.0, 1.8, 1.8, 1.8]})
        assert rc2 == 2, rc2
        got2 = json.load(open(np2))["arbitration"]["a"]
        assert got2["verdict"] == "box", got2


def test_chunk_verdict_attributes_a_localized_stall_without_reruns():
    with tempfile.TemporaryDirectory() as d:
        # ten queries, canary_every=2 -> five chunks [a,b][c,d][e,f][g,h]
        # [i,j] in run (sorted) order. Chunk 1 stalled mid-run: c and d
        # tripled while the median chunk stayed flat — the record's own
        # chunk_time_ratio_warm series (Bench's rolling guard) says so.
        # No canary field here, so the >= 2-flag corroboration is
        # flags-only: the chunk's REPRESENTATIVE (c, first in run order)
        # gets one fresh-JVM probe (r15 ADVICE — a shared-helper change
        # can slow two same-chunk queries); its clean series corroborates
        # the stall, so d is stamped chunk with no further runs. The
        # genuine regression e (whose chunk ratio is diluted under
        # CHUNK_STALL by its heavy flat neighbor f) must still be rerun
        # and confirmed, so the exit is 1.
        names = [chr(ord("a") + k) for k in range(10)]
        old_warm = {q: 1.0 for q in names}
        old_warm["f"] = 10.0
        old = record({q: 1.0 for q in names}, old_warm)
        warm_new = dict(old_warm)
        warm_new.update({"c": 3.0, "d": 3.1, "e": 2.8})
        new = record({q: 1.0 for q in names}, warm_new)
        new["canary_every"] = 2
        new["chunk_time_ratio_warm"] = [1.05, 3.05, 1.16, 1.0, 1.0]
        np_, op = write(d, "new.json", new), write(d, "old.json", old)
        rc, calls = run_main([np_, "--old", op],
                             {"c": [1.1, 1.0, 1.0, 1.1],
                              "e": [5.0, 2.8, 2.8, 2.9]})
        assert rc == 1, rc  # the confirmed e outranks the chunk verdicts
        # c probed once (clean), d never rerun
        assert [c[0] for c in calls] == ["c", "e"], calls
        arb = json.load(open(np_))["arbitration"]
        assert arb["c"]["verdict"] == "chunk" and arb["c"]["chunk"] == 1, arb
        assert arb["d"]["verdict"] == "chunk", arb
        assert arb["e"]["verdict"] == "confirmed", arb

        # all-chunk flags with nothing confirmed exit 2 (window-tainted);
        # the flags-only probe (c, clean) is the only fresh-JVM run
        warm2 = dict(old_warm)
        warm2.update({"c": 3.0, "d": 3.1})
        new2 = record({q: 1.0 for q in names}, warm2)
        new2["canary_every"] = 2
        new2["chunk_time_ratio_warm"] = [1.05, 3.05, 1.0, 1.0, 1.0]
        np2, op2 = write(d, "new2.json", new2), write(d, "old2.json", old)
        rc2, calls2 = run_main([np2, "--old", op2],
                               {"c": [1.1, 1.0, 1.0, 1.1]})
        assert rc2 == 2, rc2
        assert [c[0] for c in calls2] == ["c"], calls2

        # the probe REPRODUCING the slowdown rejects the flags-only
        # corroboration: both members rerun individually (the probe
        # series is reused for c — no double run) and confirm
        np2b, op2b = write(d, "new2b.json", new2), write(d, "old2b.json", old)
        rc2b, calls2b = run_main([np2b, "--old", op2b],
                                 {"c": [5.0, 3.0, 3.0, 3.1],
                                  "d": [5.0, 3.1, 3.1, 3.2]})
        assert rc2b == 1, rc2b
        assert [c[0] for c in calls2b] == ["c", "d"], calls2b
        arb2b = json.load(open(np2b))["arbitration"]
        assert arb2b["c"]["verdict"] == "confirmed", arb2b
        assert arb2b["d"]["verdict"] == "confirmed", arb2b

        # a UNIFORM elevation (every chunk ~3x) is the box mode, not a
        # stall: chunk attribution must decline and the reruns happen
        warm3 = {q: v * 3 for q, v in old_warm.items()}
        new3 = record({q: 1.0 for q in names}, warm3)
        new3["canary_every"] = 2
        new3["chunk_time_ratio_warm"] = [3.0] * 5
        np3, op3 = write(d, "new3.json", new3), write(d, "old3.json", old)
        rc3, calls3 = run_main(
            [np3, "--old", op3],
            {q: [1.0, 1.0, 1.0, 1.0] for q in names})
        assert rc3 == 0, rc3  # fresh JVMs all measure jitter
        assert len(calls3) == len(names), calls3

        # a forced query always gets its rerun even inside a stalled chunk
        rc4, calls4 = run_main([np_, "--old", op, "c"],
                               {"c": [1.0, 1.0, 1.0, 1.0]})
        assert [c[0] for c in calls4] == ["c"], calls4


def test_lone_chunk_flag_needs_canary_corroboration():
    with tempfile.TemporaryDirectory() as d:
        # a SINGLE genuine regression big enough to lift its own chunk's
        # sum >= 1.5x (c: 1.0 -> 3.0 doubles the [c,d] chunk) must NOT
        # hide behind a chunk verdict: with flat boundary canaries and no
        # second flag in the chunk, the fresh-JVM rerun happens and
        # confirms it (r14 ADVICE)
        names = [chr(ord("a") + k) for k in range(10)]
        old = record({q: 1.0 for q in names}, {q: 1.0 for q in names})
        warm = {q: 1.0 for q in names}
        warm["c"] = 3.0
        new = record({q: 1.0 for q in names}, warm)
        new["canary_every"] = 2
        new["chunk_time_ratio_warm"] = [1.0, 2.0, 1.0, 1.0, 1.0]
        new["chunk_canary_ratio_warm"] = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
        np_, op = write(d, "new.json", new), write(d, "old.json", old)
        rc, calls = run_main([np_, "--old", op], {"c": [5.0, 3.0, 3.0, 3.1]})
        assert rc == 1, rc
        assert [c[0] for c in calls] == ["c"], calls
        got = json.load(open(np_))["arbitration"]["c"]
        assert got["verdict"] == "confirmed", got

        # the SAME lone flag with an elevated boundary canary (untouched
        # canary code stalled too — evidence no code change can produce)
        # IS the window's fault: stamped chunk, no rerun
        new2 = dict(new)
        new2["chunk_canary_ratio_warm"] = [1.0, 2.4, 1.0, 1.0, 1.0, 1.0]
        np2 = write(d, "new2.json", new2)
        rc2, calls2 = run_main([np2, "--old", op], {})
        assert rc2 == 2, rc2
        assert calls2 == [], calls2
        got2 = json.load(open(np2))["arbitration"]["c"]
        assert got2["verdict"] == "chunk", got2

        # records predating chunk_canary_ratio_* (no field at all) keep
        # the >= 2-flag rule as the only corroboration: the lone flag
        # falls through to its rerun
        new3 = {k: v for k, v in new.items()
                if k != "chunk_canary_ratio_warm"}
        np3 = write(d, "new3.json", new3)
        rc3, calls3 = run_main([np3, "--old", op],
                               {"c": [1.0, 1.0, 1.0, 1.0]})
        assert rc3 == 0, rc3
        assert [c[0] for c in calls3] == ["c"], calls3


if __name__ == "__main__":
    test_flags_match_bench_diff_thresholds()
    test_warm_steady_vs_cold_pass1_verdicts()
    test_forced_query_prefers_warm_and_all_jitter_exits_zero()
    test_no_flags_leaves_record_untouched()
    test_box_verdict_when_uniq_canary_explains_the_shift()
    test_confirmed_verdict_survives_a_same_query_box_verdict()
    test_rearbitration_can_downgrade_a_stale_stamp()
    test_box_ratio_override_replaces_record_derived_ratio()
    test_chunk_verdict_attributes_a_localized_stall_without_reruns()
    test_lone_chunk_flag_needs_canary_corroboration()
    print("all assertions passed")
