#!/usr/bin/env bash
# Isolated per-query arbitration runs (graft.BenchOne) under the SAME
# pinned JVM recipe as tools/bench.sh (-Xmx8g + ParallelGC) — an
# arbitration measured under a different collector than the record it
# arbitrates would re-introduce the ~11s-warm/~30s-cold GC delta as
# phantom jitter (SCALE.md, bench methodology r10).
# Usage: tools/bench_one.sh <query[,query...]> [passes] [sfDir]
set -euo pipefail
cd "$(dirname "$0")/.."
QUERIES="${1:?usage: tools/bench_one.sh <query[,query...]> [passes] [sfDir]}"
PASSES="${2:-3}"
SF_DIR="${3:-/root/testdata/sf0.1}"
sbt -batch compile 1>&2
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Pin parallelism to the full-bench recipe too (env-overridable): an
# arbitration at HarnessSession's local[4] default would re-measure a
# 32-core record's parallel query ~8x slower and stamp a phantom
# 'confirmed' — the same apples-to-oranges error the GC pin prevents.
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
java $ADD_OPENS -Xmx8g -XX:+UseParallelGC ${GRAFT_EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
  graft.BenchOne "$QUERIES" "$PASSES"
