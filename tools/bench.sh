#!/usr/bin/env bash
# Full bench run -> BENCH_full.json + regression report vs the committed
# previous run. Usage: tools/bench.sh [sfDir] [cpus]
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.1}"
CPUS="${2:-32}"
sbt -batch compile 1>&2
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_EXTRA_JAVA_OPTS: same contract as check.sh — JVM/GC or
# spark.* -D experiments without editing the pinned recipe below.
# Recipe: -Xmx8g (G1 old-gen stalls measured r6/r7 on bigger heaps) +
# ParallelGC (r10 A/B: warm 164.6->153.4/152.3 s across two runs, cold
# 207.9->176.2/180.7 s, canary medians 1.14->1.03 — the throughput
# collector suits a 221-query batch session better than G1's pause
# targeting; see SCALE.md bench methodology r10).
# Full stderr to a side log: Bench's rolling chunk-guard warnings fire
# MID-RUN and a bare tail -5 would swallow them (r14 attempt 2: four
# guard lines lost); surface them explicitly after the run. Per-run
# mktemp, not a fixed path: concurrent invocations (or another user on
# a shared box) would clobber a shared log and the post-run grep could
# surface ANOTHER run's chunk-guard lines (r14 ADVICE).
# Delete the log only on a successful run: under set -e a java/Bench
# crash exits before the tail/grep surfacing lines, and an
# unconditional EXIT-trap rm would destroy the only postmortem record
# of the failure (r15 ADVICE). On failure, print the path and keep it.
STDERR_LOG="$(mktemp /tmp/graft_bench_stderr.XXXXXX)"
BENCH_OK=0
trap 'if [ "$BENCH_OK" = 1 ]; then rm -f "$STDERR_LOG"; else echo "bench.sh: run failed; stderr preserved at $STDERR_LOG" >&2; fi' EXIT
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
java $ADD_OPENS -Xmx8g -XX:+UseParallelGC ${GRAFT_EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
  graft.Bench 2> "$STDERR_LOG" | tail -1 > /dev/null
tail -5 "$STDERR_LOG" >&2
grep "chunk guard" "$STDERR_LOG" >&2 || true
# The bench itself succeeded past this point; bench_diff's nonzero
# exits (1 = regressions, 2 = arbitration convention) are verdicts,
# not failures, and must not preserve-the-log/mislabel the run.
BENCH_OK=1
# Diff the record Bench actually wrote: under SPARK_GRAFT_BENCH_OUT
# (e.g. BENCH_lc.json) a hardcoded BENCH_full.json would silently diff
# the WRONG file against HEAD and report a stale verdict.
OUT="${SPARK_GRAFT_BENCH_OUT:-BENCH_full.json}"
if git show "HEAD:$OUT" > /tmp/graft_bench_old.json 2>/dev/null; then
  python3 tools/bench_diff.py "$OUT" /tmp/graft_bench_old.json
else
  echo "bench.sh: no committed $OUT at HEAD; baseline run, diff skipped"
fi
