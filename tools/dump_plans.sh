#!/usr/bin/env bash
# Regenerate PLANS.md from the current build.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile 1>&2
/opt/spark/bin/spark-shell --master 'local[8]' \
  --driver-class-path target/scala-2.13/classes \
  --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.session.timeZone=UTC -I tools/dump_plans.scala
