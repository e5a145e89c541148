#!/usr/bin/env python3
"""Unit coverage for tools/bench_diff.py's strict-exit contract and
per-phase canary demotion (the measurement-integrity behaviors the perf
gate rests on). Plain asserts, no pytest dependency; run directly:

    python3 tools/test_bench_diff.py

Invoked from sbt test via BenchDiffToolSpec so the contract is part of
the standard gate.
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
DIFF = os.path.join(HERE, "bench_diff.py")

FLAT = [0.1, 0.1, 0.1, 0.1]
CLIMB = [0.1, 0.1, 2.5, 2.5]  # tail median 2.5 >= 2*0.1 and +1.0s
DRIFT = [1.0, 1.0, 1.4, 1.4]  # 1.4x / +0.4s: advisory, below demotion


def record(queries, queries_warm, canary_cold=FLAT, canary_warm=FLAT):
    return {
        "metric": "total", "value": sum(queries.values()),
        "warm_total": sum(queries_warm.values()),
        "queries": queries, "queries_warm": queries_warm,
        "canary_cold": canary_cold, "canary_warm": canary_warm,
        "failed": [], "retimed": [], "sf": "/root/testdata/sf0.1",
    }


def run(new, old, strict=True):
    with tempfile.TemporaryDirectory() as d:
        np, op = os.path.join(d, "new.json"), os.path.join(d, "old.json")
        with open(np, "w") as f:
            json.dump(new, f)
        with open(op, "w") as f:
            json.dump(old, f)
        args = [sys.executable, DIFF, np, op] + (["--strict"] if strict else [])
        p = subprocess.run(args, capture_output=True, text=True)
        return p.returncode, p.stdout


def main():
    old = record({"qa": 1.0, "qb": 1.0}, {"qa": 0.5, "qb": 0.5})

    # 1. clean run -> exit 0
    rc, out = run(record({"qa": 1.0, "qb": 1.1}, {"qa": 0.5, "qb": 0.6}), old)
    assert rc == 0, (rc, out)
    assert "REGRESS" not in out, out

    # 2. flat canaries + a real warm regression -> REGRESS, exit 1
    rc, out = run(record({"qa": 1.0, "qb": 1.0}, {"qa": 2.0, "qb": 0.5}), old)
    assert rc == 1, (rc, out)
    assert "REGRESS warm qa" in out, out

    # 3. degraded WARM canary demotes the warm flag -> SUSPECT, exit 2
    rc, out = run(record({"qa": 1.0, "qb": 1.0}, {"qa": 2.0, "qb": 0.5},
                         canary_warm=CLIMB), old)
    assert rc == 2, (rc, out)
    assert "SUSPECT" in out and "REGRESS warm" not in out, out

    # 4. per-phase isolation: degraded warm canary must NOT demote a COLD
    #    regression -> still exit 1 (cold flag keeps REGRESS status)
    rc, out = run(record({"qa": 3.0, "qb": 1.0}, {"qa": 2.0, "qb": 0.5},
                         canary_warm=CLIMB), old)
    assert rc == 1, (rc, out)
    assert "REGRESS cold qa" in out, out
    assert "SUSPECT (canary-degraded session) warm qa" in out, out

    # 5. symmetric: degraded COLD canary demotes cold but not warm
    rc, out = run(record({"qa": 3.0, "qb": 1.0}, {"qa": 2.0, "qb": 0.5},
                         canary_cold=CLIMB), old)
    assert rc == 1, (rc, out)
    assert "SUSPECT (canary-degraded session) cold qa" in out, out
    assert "REGRESS warm qa" in out, out

    # 6. missing query -> exit 1 even when everything else is clean; the
    #    tally counts DISTINCT query names (qb absent from both phases is
    #    ONE missing query), the per-phase lines keep the detail
    rc, out = run(record({"qa": 1.0}, {"qa": 0.5}), old)
    assert rc == 1, (rc, out)
    assert "MISSING cold qb" in out, out
    assert "MISSING warm qb" in out, out
    assert "1 missing" in out and "2 missing" not in out, out

    # 7. non-strict mode is informational: exit 0 despite regressions
    rc, out = run(record({"qa": 3.0, "qb": 1.0}, {"qa": 2.0, "qb": 0.5}),
                  old, strict=False)
    assert rc == 0, (rc, out)
    assert "REGRESS" in out, out

    # 8. differing jvm_gc provenance is named (informational, no exit
    #    change); absent on either side -> silent (pre-r10 records)
    new_gc = record({"qa": 1.0, "qb": 1.1}, {"qa": 0.5, "qb": 0.6})
    new_gc["jvm_gc"] = "PS Scavenge; PS MarkSweep"
    old_gc = dict(old)
    old_gc["jvm_gc"] = "G1 Young Generation; G1 Old Generation"
    rc, out = run(new_gc, old_gc)
    assert rc == 0, (rc, out)
    assert "GC MISMATCH" in out, out
    rc, out = run(new_gc, old)  # old record predates the field
    assert "GC MISMATCH" not in out, out

    # 8b. a sub-demotion canary climb is named CLIMBING: flags keep their
    #     REGRESS status and exit 1, but the run self-describes as suspect
    rc, out = run(record({"qa": 1.0, "qb": 1.0}, {"qa": 2.0, "qb": 0.5},
                         canary_warm=DRIFT), old)
    assert rc == 1, (rc, out)
    assert "canary warm: CLIMBING" in out, out
    assert "REGRESS warm qa" in out, out

    # 9. box-normalized totals lead the verdict when the record carries
    #    them (stamped by Bench against the committed canary medians);
    #    absent fields -> no NORMALIZED line (pre-r12 records)
    normed = record({"qa": 1.0, "qb": 1.1}, {"qa": 0.5, "qb": 0.6})
    normed["value_normalized"] = 1.6
    normed["warm_total_normalized"] = 0.85
    normed["box_ratio_cold"] = 1.31
    normed["box_ratio_warm"] = 1.29
    rc, out = run(normed, old)
    assert rc == 0, (rc, out)
    assert ("NORMALIZED totals (uniq-canary, box-slide corrected): "
            "cold 1.6s (box ratio 1.31), warm 0.8s (box ratio 1.29)"
            ) in out, out
    lines = [ln for ln in out.splitlines() if ln.startswith(("NORMALIZED",
                                                             "totals:"))]
    assert lines and lines[0].startswith("NORMALIZED"), out
    rc, out = run(record({"qa": 1.0, "qb": 1.1}, {"qa": 0.5, "qb": 0.6}),
                  old)
    assert "NORMALIZED" not in out, out

    # 9b. each phase prints independently: a record with only the WARM
    #     normalization (short cold canary series) must still print it
    one_phase = record({"qa": 1.0, "qb": 1.1}, {"qa": 0.5, "qb": 0.6})
    one_phase["warm_total_normalized"] = 0.9
    one_phase["box_ratio_warm"] = 1.05
    rc, out = run(one_phase, old)
    assert ("NORMALIZED totals (uniq-canary, box-slide corrected): "
            "warm 0.9s (box ratio 1.05)") in out, out
    assert "cold" not in [ln for ln in out.splitlines()
                          if ln.startswith("NORMALIZED")][0], out

    # 9c. repeat-canary flavor prints its own line (the r12 slide mode),
    #     and the normalization baseline provenance is named when stamped
    both = record({"qa": 1.0, "qb": 1.1}, {"qa": 0.5, "qb": 0.6})
    both["value_normalized"] = 1.6
    both["warm_total_normalized"] = 0.85
    both["value_normalized_repeat"] = 1.5
    both["warm_total_normalized_repeat"] = 0.8
    both["box_ratio_cold_repeat"] = 1.42
    both["box_ratio_warm_repeat"] = 1.38
    both["norm_baseline"] = {"uniq_cold": 1.0, "repeat_warm": 1.2,
                             "source": "git-HEAD"}
    rc, out = run(both, old)
    assert ("NORMALIZED totals (repeat-canary, box-slide corrected): "
            "cold 1.5s (box ratio 1.42), warm 0.8s (box ratio 1.38)"
            ) in out, out
    assert "NORMALIZED totals (uniq-canary" in out, out
    assert "normalization baseline source: git-HEAD" in out, out

    print("test_bench_diff: all assertions passed")


if __name__ == "__main__":
    main()
