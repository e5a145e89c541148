#!/usr/bin/env bash
# Arbitrate bench_diff's per-query flags with fresh-JVM BenchOne series
# and stamp the verdicts into the bench record (see tools/arbitrate.py
# for the protocol). Run after tools/bench.sh when the diff printed
# REGRESS/SUSPECT lines; pass query names to force arbitration runs.
# Usage: tools/arbitrate.sh [record.json] [--old HEAD|old.json]
#                           [--passes N] [query ...]
set -euo pipefail
cd "$(dirname "$0")/.."
exec python3 tools/arbitrate.py "$@"
