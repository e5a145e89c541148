#!/usr/bin/env python3
"""Automated flag arbitration: resolve bench_diff's per-query flags with
fresh-JVM BenchOne series and stamp the verdicts INTO the bench record,
so a closing BENCH_full.json carries its own arbitration evidence
instead of the protocol living in session notes.

Usage: tools/arbitrate.py [record.json] [--old HEAD|old.json]
                          [--passes N] [--box-ratio R] [query ...]

--box-ratio R overrides the uniq-canary-derived box ratio for THIS
invocation. The re-arbitration flow exit code 2 prescribes runs on a
healthy box — but the default ratio is derived from the flagged
record's own canary series, which a rerun of the same record would just
recompute (structurally re-stamping `box` for any regression inside the
envelope). Pass the healthy window's measured ratio (e.g. 1.0 after a
fresh `tools/bench_one.sh q4_priority_exists 4` reads committed-era
times) so the box-absorb check reflects the box the reruns actually ran
on.

With no queries given, arbitrates every REGRESS/SUSPECT flag bench_diff
reports for `record.json` (default BENCH_full.json) vs `--old` (default
the record committed at HEAD). Explicit query names force arbitration of
those queries regardless of flags (the demo/debug path).

Per query: run `tools/bench_one.sh <q> <passes>` — a FRESH JVM under the
same pinned -Xmx8g+ParallelGC recipe as the full bench — and judge the
series against the old record with bench_diff's own thresholds
(>=1.5x AND >=0.5s):

  warm arbitration uses the STEADY state (median of passes 2..N; pass 1
  carries plan/codegen one-time cost) vs the old warm time;
  cold arbitration uses pass 1 vs the old cold time, with the caveat
  that cold times in memo-shared families are first-consumer-pays
  (SCALE.md r9 read rule) — an isolated cold pass pays the WHOLE family
  head, so only a `jitter` verdict there is conclusive; a `confirmed`
  cold verdict on a shared family needs the family-sum check by hand.

Verdicts land in the record as
  "arbitration": {"<q>": {"phase": "...", "old": s, "flagged": s,
                          "passes": [...], "steady": s,
                          "verdict": "jitter|confirmed|box"}, ...}

A `box` verdict fires when BOTH records carry the compile-sensitive
canary_uniq_* series (r11) and its median shifted by enough to explain
the query's own shift: a host-level slowdown inflates every unique
query's plan/compile constant uniformly, and re-running the query on the
same degraded box would "confirm" what is really an environment change
(the r11 code-control experiment; see SCALE.md).

A `chunk` verdict (r14) fires BEFORE any fresh-JVM rerun, from the
record's own chunk_time_ratio_* series (Bench's rolling in-run guard):
when the flagged query's chunk — its position in run order over
canary_every — shows a LOCALIZED time inflation (chunk ratio >= 1.5
while the median chunk sits <= 1.15), the whole chunk was a mid-run
stall window and every flag inside it is attributed wholesale instead
of 30 queries being rerun one by one. This is the slide mode both
canary flavors are blind to (the r13 third discard: an a_*-block stall
strictly between canary samples). The stall must be CORROBORATED by
evidence no code change can produce (r15): an elevated boundary canary
(chunk_canary_ratio_* sample ci or ci+1 >= 1.5 — canary code is
untouched by definition) or >= 2 independently flagged queries inside
the chunk; a lone uncorroborated flag gets its fresh-JVM rerun like any
other. Like `box`, `chunk` exits 2 — the window heuristic could still
absorb a genuine regression that happens to sit in a stalled chunk, so
the run must be re-arbitrated in a healthy window rather than read as
clean.
(parseCommittedWarm and bench_diff ignore unknown fields, so the stamp
is backward-compatible with every reader of the record.)

Exit codes (mirroring bench_diff --strict's three-valued contract):
  0  every arbitrated flag resolved to jitter (or nothing to arbitrate)
  1  one or more `confirmed` verdicts — a real regression
  2  no confirmations, but one or more `box` verdicts — the run is
     environment-tainted; re-arbitrate on a healthy box before trusting
     (the box heuristic can absorb a genuine regression slightly smaller
     than the host-wide canary shift, so a box run must not read as clean)
"""
import json
import re
import subprocess
import sys

RATIO = 1.5      # bench_diff's confirmation thresholds, reused verbatim
ABS_FLOOR = 0.5
PASSES = 4       # default fresh-JVM series length (1 cold + 3 steady)
CHUNK_STALL = 1.5    # a chunk this far over its committed sum is a stall…
CHUNK_FLAT = 1.15    # …but only when the median chunk stayed this flat
                     # (a uniform elevation is the box mode, not a stall)


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


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def flags_from_diff(record_path: str, old: str):
    """Re-derive bench_diff's REGRESS/SUSPECT flags (same thresholds)."""
    new, prev = load(record_path), load(old)
    out = []
    for phase in ("queries", "queries_warm"):
        for q, t_new in new.get(phase, {}).items():
            t_old = prev.get(phase, {}).get(q)
            if t_old is None:
                continue
            if t_new >= t_old * RATIO and t_new - t_old >= ABS_FLOOR:
                if phase == "queries_warm" and q.startswith("streaming_") \
                        and t_old < 1.0:
                    continue  # bench_diff's RESTATED carve-out
                out.append((phase, q, t_old, t_new))
    return out


def chunk_of(record: dict, phase: str, query: str):
    """Run-order chunk index of a query (chunks of canary_every, shared
    by both phases — run order is the sorted query list), or None."""
    every = record.get("canary_every", 25)
    order = sorted(record.get("queries", {}))
    if query not in order:
        return None
    return order.index(query) // every


def chunk_stall(record: dict, phase: str, query: str, flags_in_chunk: int):
    """Return (chunk_index, chunk_ratio) when the flagged query sits in a
    LOCALIZED stalled chunk per the record's chunk_time_ratio_* series
    (Bench's rolling guard), else None. Localization needs >= 3 measured
    chunks — one elevated chunk against zero flat siblings proves
    nothing.

    CORROBORATION (r14 ADVICE): a single genuine regression large enough
    to lift its own chunk's sum >= 1.5x would otherwise be stamped
    `chunk` and never rerun. The stall must therefore be corroborated by
    evidence a code change cannot produce: EITHER a boundary canary of
    the chunk (untouched canary code, chunk_canary_ratio_* samples ci
    and ci+1) itself elevated >= CHUNK_STALL, OR >= 2 independently
    flagged queries inside the same chunk and phase. A lone
    uncorroborated flag falls through to the fresh-JVM rerun.

    The flags-only leg is WEAKER than the canary leg (r15 ADVICE): a
    shared-helper change can genuinely slow two queries that land in
    the same chunk, so when the canaries are flat the caller must still
    fresh-JVM-probe ONE representative of the chunk before stamping the
    rest wholesale — hence the returned canary_hit flag."""
    field = ("chunk_time_ratio_cold" if phase == "queries"
             else "chunk_time_ratio_warm")
    ratios = record.get(field)
    if not ratios:
        return None
    ci = chunk_of(record, phase, query)
    if ci is None or ci >= len(ratios) or ratios[ci] is None:
        return None
    vals = [r for r in ratios if r is not None]
    if len(vals) < 3:
        return None
    if not (ratios[ci] >= CHUNK_STALL and median(vals) <= CHUNK_FLAT):
        return None
    can_field = ("chunk_canary_ratio_cold" if phase == "queries"
                 else "chunk_canary_ratio_warm")
    boundary = (record.get(can_field) or [])[ci:ci + 2]
    canary_hit = any(r is not None and r >= CHUNK_STALL for r in boundary)
    if not canary_hit and flags_in_chunk < 2:
        return None
    return ci, ratios[ci], canary_hit


def bench_one(query: str, passes: int, sf_dir: str):
    """One fresh-JVM BenchOne series; returns per-pass seconds."""
    proc = subprocess.run(
        ["tools/bench_one.sh", query, str(passes), sf_dir],
        capture_output=True, text=True)
    times = [float(m.group(1)) for m in re.finditer(
        rf"pass \d+ {re.escape(query)}\s+(\d+\.\d+)s", proc.stdout)]
    if len(times) != passes:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise RuntimeError(
            f"bench_one {query}: expected {passes} passes, "
            f"parsed {len(times)}")
    return times


def main() -> int:
    args = sys.argv[1:]
    record_path = "BENCH_full.json"
    old = "HEAD"
    passes = PASSES
    box_ratio_override = None
    queries = []
    i = 0
    while i < len(args):
        if args[i] == "--old":
            old = args[i + 1]
            i += 2
        elif args[i] == "--passes":
            passes = int(args[i + 1])
            i += 2
        elif args[i] == "--box-ratio":
            box_ratio_override = float(args[i + 1])
            i += 2
        elif args[i].endswith(".json"):
            record_path = args[i]
            i += 1
        else:
            queries.append(args[i])
            i += 1

    record = load(record_path)
    prev = load(old)
    sf_dir = record.get("sf", "/root/testdata/sf0.1")

    if queries:
        targets = []
        for q in queries:
            # arbitrate the warm phase by default for forced queries; fall
            # back to cold when no warm number exists
            for phase in ("queries_warm", "queries"):
                t_old = prev.get(phase, {}).get(q)
                t_new = record.get(phase, {}).get(q)
                if t_old is not None and t_new is not None:
                    targets.append((phase, q, t_old, t_new))
                    break
            else:
                print(f"arbitrate: {q} absent from record/old; skipping")
    else:
        targets = flags_from_diff(record_path, old)

    if not targets:
        print("arbitrate: no flags to arbitrate; record left untouched")
        return 0

    # Box-shift detector: ratio of compile-sensitive canary medians
    # between the two records (None when either record predates the field).
    def uniq_median(rec):
        xs = (rec.get("canary_uniq_cold") or []) + \
             (rec.get("canary_uniq_warm") or [])
        return median(xs) if len(xs) >= 2 else None
    m_new, m_old = uniq_median(record), uniq_median(prev)
    box_ratio = (m_new / m_old) if (m_new and m_old and m_old > 0) else None
    if box_ratio_override is not None:
        # Re-arbitration on a healthy box: the record's own canary series
        # would just recompute the degraded-window ratio; the override is
        # the ratio measured on the box the fresh-JVM reruns run on.
        print(f"arbitrate: box ratio OVERRIDDEN "
              f"{'%.2f' % box_ratio if box_ratio else 'n/a'} -> "
              f"{box_ratio_override:.2f} (caller-measured)")
        box_ratio = box_ratio_override
    elif box_ratio is not None:
        print(f"arbitrate: uniq-canary medians {m_old:.2f}s -> {m_new:.2f}s "
              f"(box ratio {box_ratio:.2f})")

    verdicts = record.setdefault("arbitration", {})
    # The record keys arbitration entries by query name; a query flagged in
    # BOTH phases would otherwise have its second verdict overwrite the
    # first (a warm `box` silently burying a cold `confirmed`). Keep the
    # more severe entry — but ONLY among verdicts written by THIS
    # invocation: a fresh arbitration (e.g. the exit-2 "re-run on a healthy
    # box" flow) must be able to downgrade a stale `box`/`confirmed` stamp
    # from an earlier run to `jitter`, else the stamped record permanently
    # contradicts the rerun's own printed output and exit code.
    severity = {"jitter": 0, "box": 1, "chunk": 1, "confirmed": 2}
    stamped_this_run = set()
    n_conf = n_box = n_chunk = 0
    # Per-(phase, chunk) flag counts feed the chunk corroboration rule:
    # >= 2 independent flags in one chunk cannot come from one changed
    # query (r14 ADVICE — a lone flag needs canary-boundary evidence or
    # its fresh-JVM rerun).
    chunk_flags = {}
    for phase, q, _, _ in targets:
        ci = chunk_of(record, phase, q)
        if ci is not None:
            chunk_flags[(phase, ci)] = chunk_flags.get((phase, ci), 0) + 1
    # Flags-only stalled chunks (canaries flat) get ONE representative
    # fresh-JVM probe before the wholesale stamp (r15 ADVICE: a shared-
    # helper change can slow >= 2 same-chunk queries); a probe that
    # CONFIRMS breaks the chunk attribution for its whole (phase, chunk)
    # group and every member falls through to its own rerun.
    probed_ok = {}     # (phase, ci) -> representative's passes
    probe_broken = set()  # (phase, ci) whose probe reproduced the slowdown
    for phase, q, t_old, t_new in targets:
        # Chunk attribution runs BEFORE any fresh-JVM rerun, and only for
        # auto-derived flags (a forced query is the explicit debug path
        # and always gets its rerun): a flag inside a localized stalled
        # chunk is the window's fault, stamped wholesale.
        stall = None if queries else chunk_stall(
            record, phase, q,
            chunk_flags.get((phase, chunk_of(record, phase, q)), 0))
        if stall is not None and not stall[2] \
                and (phase, stall[0]) in probe_broken:
            stall = None
        pre_series = None
        if stall is not None and not stall[2] \
                and (phase, stall[0]) not in probed_ok:
            # this flag is the chunk's representative: probe it fresh
            ci = stall[0]
            series = bench_one(q, passes, sf_dir)
            steady = median(series[1:]) if len(series) > 1 else series[0]
            sample = series[0] if phase == "queries" else steady
            reproduced = sample >= t_old * RATIO and \
                sample - t_old >= ABS_FLOOR
            if reproduced:
                print(f"arbitrate: chunk {ci} ({phase}) probe {q} "
                      f"REPRODUCED the slowdown fresh "
                      f"[{', '.join(f'{t:.2f}' for t in series)}] — "
                      f"flags-only corroboration rejected; members "
                      f"rerun individually")
                probe_broken.add((phase, ci))
                stall = None
                pre_series = series  # reuse; don't pay a second rerun
            else:
                print(f"arbitrate: chunk {ci} ({phase}) probe {q} clean "
                      f"fresh [{', '.join(f'{t:.2f}' for t in series)}] "
                      f"— stall corroborated, stamping chunk-wide")
                probed_ok[(phase, ci)] = series
        if stall is not None:
            ci, cr, _ = stall
            label = "cold" if phase == "queries" else "warm"
            print(f"ARBITRATED {label} {q}: old {t_old:.2f}s, flagged "
                  f"{t_new:.2f}s -> chunk {ci} stalled in-run "
                  f"(chunk ratio {cr:.2f}, sibling chunks flat): CHUNK "
                  f"— attributed to the window, no rerun")
            n_chunk += 1
            prior = verdicts.get(q) if q in stamped_this_run else None
            stamped_this_run.add(q)
            if prior is None or severity["chunk"] >= severity[prior["verdict"]]:
                verdicts[q] = {
                    "phase": phase, "old": round(t_old, 3),
                    "flagged": round(t_new, 3), "chunk": ci,
                    "chunk_ratio": round(cr, 3), "verdict": "chunk",
                }
            continue
        series = pre_series if pre_series is not None \
            else bench_one(q, passes, sf_dir)
        steady = median(series[1:]) if len(series) > 1 else series[0]
        sample = series[0] if phase == "queries" else steady
        confirmed = sample >= t_old * RATIO and sample - t_old >= ABS_FLOOR
        verdict = "confirmed" if confirmed else "jitter"
        if confirmed and box_ratio is not None and box_ratio > 1.1 \
                and sample <= t_old * box_ratio * 1.2:
            # the uniq-canary medians moved old->new by box_ratio: a shift
            # the canary explains is the HOST's, not the query's
            verdict = "box"
        label = "cold" if phase == "queries" else "warm"
        note = (" [memo-shared cold: isolated pass pays the family head — "
                "confirm via family sum]"
                if verdict == "confirmed" and phase == "queries" else "")
        print(f"ARBITRATED {label} {q}: old {t_old:.2f}s, flagged "
              f"{t_new:.2f}s, fresh-JVM "
              f"[{', '.join(f'{t:.2f}' for t in series)}] -> "
              f"{'pass1' if phase == 'queries' else 'steady'} "
              f"{sample:.2f}s: {verdict.upper()}{note}")
        n_conf += verdict == "confirmed"
        n_box += verdict == "box"
        prior = verdicts.get(q) if q in stamped_this_run else None
        stamped_this_run.add(q)
        if prior is None or severity[verdict] >= severity[prior["verdict"]]:
            verdicts[q] = {
                "phase": phase, "old": round(t_old, 3),
                "flagged": round(t_new, 3),
                "passes": [round(t, 3) for t in series],
                "steady": round(steady, 3), "verdict": verdict,
            }

    with open(record_path, "w") as f:
        json.dump(record, f, separators=(",", ":"))
        f.write("\n")
    print(f"arbitrate: {len(targets)} flag(s) stamped into {record_path} "
          f"({n_conf} confirmed, {n_box} box, {n_chunk} chunk)")
    # Three-valued exit, mirroring bench_diff --strict: 1 = confirmed
    # regressions; 2 = no confirmations but >=1 `box`/`chunk` verdict —
    # either attribution heuristic can absorb a genuine regression that
    # coincides with a host-wide shift or sits inside a stalled chunk,
    # so CI must surface the run for re-arbitration in a healthy window
    # rather than read it as clean; 0 = all-jitter.
    if n_conf:
        return 1
    if n_box or n_chunk:
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
