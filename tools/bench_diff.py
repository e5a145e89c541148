#!/usr/bin/env python3
"""Round-over-round bench regression report.

Compares a fresh BENCH_full.json against a previous one (default: the
version committed at HEAD) and flags per-query regressions past BOTH a
ratio and an absolute floor — small queries jitter by milliseconds, so a
pure ratio would cry wolf.

Usage: tools/bench_diff.py [new.json] [old.json|HEAD]

Exit codes: 0 always without --strict (the report is informational; the
correctness gate is tools/check.sh). With --strict the contract is
three-valued:
  0  clean (no confirmed regressions, no missing queries, no demotions)
  1  confirmed per-query regressions and/or queries missing vs the old
     record — a real failure
  2  no confirmed regressions, but one or more flags were DEMOTED to
     SUSPECT because that phase's canary series showed session
     degradation — the run is suspect, rerun `graft.BenchOne <q> 3`
     before believing or dismissing the flagged queries
Wrappers that treat any nonzero as failure will also fail on 2; branch on
the exact code if suspect-but-unconfirmed runs should be retried instead.
"""
import json
import subprocess
import sys

RATIO = 1.5      # flag only if >= 1.5x slower...
ABS_FLOOR = 0.5  # ...and >= 0.5s absolute growth


def load(src: str) -> dict:
    if src == "HEAD":
        try:
            text = subprocess.run(
                ["git", "show", "HEAD:BENCH_full.json"],
                capture_output=True, text=True, check=True).stdout
        except subprocess.CalledProcessError:
            return {}
        return json.loads(text)
    with open(src) as f:
        return json.load(f)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv
    try:
        new = load(argv[0] if argv else "BENCH_full.json")
        old = load(argv[1] if len(argv) > 1 else "HEAD")
    except (OSError, json.JSONDecodeError) as e:
        # a mistyped path must be a diagnostic, not a traceback
        print(f"bench_diff: cannot load record: {e}")
        return 2
    if not old:
        print("bench_diff: no previous BENCH_full.json at HEAD; baseline run")
        return 0
    # Session-health verdict first: it gates how per-query flags print.
    # A flat canary means flagged queries are query-level (or local jitter);
    # a climbing canary means the SESSION degraded (the r6 failure mode) and
    # every per-query number from this run is suspect.
    def median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
    # Each canary series gates ONLY its own phase's flags: a climbing warm
    # canary says nothing about the cold pass (and vice versa), so demoting
    # both would let a genuine regression in the healthy phase hide behind
    # the other phase's degradation.
    degraded_phase = {"queries": False, "queries_warm": False}
    phase_of = {"canary_cold": "queries", "canary_warm": "queries_warm"}
    canary_lines = []
    for key in ("canary_cold", "canary_warm"):
        series = new.get(key) or []
        if len(series) >= 4:
            med_h = median(series[: len(series) // 2])
            med_t = median(series[len(series) // 2:])
            bad = med_t >= med_h * 2 and med_t - med_h >= 1.0
            # Advisory tier below demotion (r12): the early-r12 record's
            # warm canary climbed 1.34x mid-pass — a real host slide that
            # inflated 40+ flags — without reaching the 2x demotion bar.
            # Flags keep REGRESS status (the evidence is not conclusive),
            # but the climb is named so a mass-flag run reads as suspect.
            climbing = (not bad and med_t >= med_h * 1.25
                        and med_t - med_h >= 0.3)
            degraded_phase[phase_of[key]] = bad
            verdict = ("SESSION DEGRADATION suspected — median canary "
                       f"{med_h:.2f}s -> {med_t:.2f}s; treat this phase's "
                       "per-query numbers as suspect"
                       if bad else
                       ("CLIMBING (medians "
                        f"{med_h:.2f}s -> {med_t:.2f}s) — below the "
                        "demotion bar, but weigh this phase's flags "
                        "against the slide"
                        if climbing
                        else f"flat (medians {med_h:.2f}s -> {med_t:.2f}s)"))
            canary_lines.append(f"canary {key[7:]}: {verdict}")
    # Compile-sensitive canary (r11): the repeat canary hits Spark's codegen
    # cache and is blind to per-query plan/compile cost shifts (a host-level
    # single-core slowdown shows as N uniform per-query regressions with a
    # flat repeat canary). The uniq series forces a fresh compile per sample;
    # compare ITS medians against the committed record's to attribute a mass
    # uniform shift to the box, not the code.
    for key in ("canary_uniq_cold", "canary_uniq_warm"):
        series = new.get(key) or []
        old_series = old.get(key) or []
        if len(series) >= 2:
            line = f"canary {key[7:]}: median {median(series):.2f}s"
            if len(old_series) >= 2:
                line += f" (committed {median(old_series):.2f}s)"
            canary_lines.append(line)
    # Cross-collector comparisons are apples-to-oranges (r10 A/B: ParallelGC
    # runs ~11s warm / ~30s cold faster than G1 on the full suite), so name
    # the mismatch up front — per-query flags below may be pure GC delta.
    gc_new, gc_old = new.get("jvm_gc"), old.get("jvm_gc")
    if gc_new and gc_old and gc_new != gc_old:
        print(f"GC MISMATCH: old ran [{gc_old}], new ran [{gc_new}] — "
              "per-query deltas include the collector change")
    regress = []
    restated = []
    for phase in ("queries", "queries_warm"):
        for q, t_new in new.get(phase, {}).items():
            t_old = old.get(phase, {}).get(q)
            if t_old is None:
                continue
            if t_new >= t_old * RATIO and t_new - t_old >= ABS_FLOOR:
                # Known r5->r6 baseline break, not a regression: warm
                # streaming times through r5 were checkpoint-resume no-ops
                # (~0.07s, fixed state dirs); unique per-run dirs make the
                # warm pass run the real stream. A sub-second old warm time
                # on a streaming query identifies a pre-break record.
                if phase == "queries_warm" and q.startswith("streaming_") \
                        and t_old < 1.0:
                    restated.append((phase, q, t_old, t_new))
                else:
                    regress.append((phase, q, t_old, t_new))
    for phase, q, t_old, t_new in restated:
        print(f"RESTATED warm {q}: {t_old:.2f}s -> {t_new:.2f}s "
              f"(pre-r6 warm was a resume no-op; see BASELINE.md)")
    # Under a degraded-session verdict, that phase's flags are demoted to
    # SUSPECT (informational, excluded from the regression count): the
    # canary proves the box/JVM slowed down globally during that phase, so
    # individual elevations can't be attributed to the queries. Rerun via
    # `graft.BenchOne <q> 3` before believing any of them. The OTHER phase's
    # flags keep their REGRESS status — its canary was flat.
    demoted = [r for r in regress if degraded_phase[r[0]]]
    for phase, q, t_old, t_new in sorted(regress, key=lambda r: r[3] - r[2],
                                         reverse=True):
        label = ("SUSPECT (canary-degraded session)"
                 if degraded_phase[phase] else "REGRESS")
        print(f"{label} {phase[8:] or 'cold'} {q}: "
              f"{t_old:.2f}s -> {t_new:.2f}s ({t_new / t_old:.1f}x)")
    regress = [r for r in regress if not degraded_phase[r[0]]]
    # check BOTH phases: a warm pass that aborted partway writes a full
    # cold dict but a short warm one — cold-only diffing reads as clean.
    # The tally counts DISTINCT query names (a query absent from both
    # phases is one missing query, not two); the per-phase MISSING lines
    # keep the phase detail.
    gone = set()
    for phase, label in (("queries", "cold"), ("queries_warm", "warm")):
        for q in sorted(set(old.get(phase, {})) - set(new.get(phase, {}))):
            print(f"MISSING {label} {q}: present at HEAD, absent now")
            gone.add(q)
    for line in canary_lines:
        print(line)
    retimed = new.get("retimed") or []
    if retimed:
        print(f"retimed ({len(retimed)} warm samples arbitrated in-run): "
              + ", ".join(sorted(retimed)))
    nw, ow = new.get("warm_total", 0), old.get("warm_total", 0)
    # Box-normalized totals lead the verdict when the record carries them
    # (r12): Bench rescales its raw totals by committed-vs-observed
    # uniq-canary medians, so a snapshot taken mid-host-slide self-corrects
    # in the record instead of in prose. Raw totals stay printed below —
    # the normalized number is advisory, the raw one is what was measured.
    # Each phase prints independently: a record where one phase's canary
    # series was short (or the committed record lacked one phase) must not
    # suppress the other phase's valid normalization (r12 ADVICE). Two
    # normalization flavors (r12 VERDICT #2): the uniq canary corrects the
    # COMPILE-constant slide mode (r11), the repeat canary the
    # execution-path mode (r12) — when the two ratios disagree, the larger
    # one names which path the box degraded.
    for flavor, tot_cold, tot_warm, br_cold, br_warm in (
        ("uniq-canary", "value_normalized", "warm_total_normalized",
         "box_ratio_cold", "box_ratio_warm"),
        ("repeat-canary", "value_normalized_repeat",
         "warm_total_normalized_repeat",
         "box_ratio_cold_repeat", "box_ratio_warm_repeat"),
    ):
        parts = []
        for label, tot_key, br_key in (("cold", tot_cold, br_cold),
                                       ("warm", tot_warm, br_warm)):
            tot = new.get(tot_key)
            if tot is None:
                continue
            br = new.get(br_key)
            brs = f" (box ratio {br:.2f})" if br is not None else ""
            parts.append(f"{label} {tot:.1f}s{brs}")
        if parts:
            print(f"NORMALIZED totals ({flavor}, box-slide corrected): "
                  + ", ".join(parts))
    src = (new.get("norm_baseline") or {}).get("source")
    if src:
        print(f"normalization baseline source: {src}")
    print(f"totals: cold {old.get('value', 0):.1f}s -> "
          f"{new.get('value', 0):.1f}s, warm {ow:.1f}s -> {nw:.1f}s, "
          f"queries {len(old.get('queries', {}))} -> "
          f"{len(new.get('queries', {}))}; "
          f"{len(regress)} regressions, {len(demoted)} demoted-to-suspect, "
          f"{len(gone)} missing")
    # Strict mode: 1 on confirmed regressions/missing queries; 2 when flags
    # were demoted by a degraded canary — distinct so CI still surfaces the
    # suspect run instead of reading it as clean.
    if strict and (regress or gone):
        return 1
    if strict and demoted:
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
