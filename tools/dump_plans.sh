#!/usr/bin/env bash
# Regenerate PLANS.md from the current build.
set -euo pipefail
cd "$(dirname "$0")/.."
# UTF-8 throughout: under a POSIX locale the shell's -I reader mangles the
# note strings' em-dashes into replacement characters before they ever
# reach the (UTF-8) file write.
export LANG=C.UTF-8 LC_ALL=C.UTF-8
sbt -batch compile 1>&2
/opt/spark/bin/spark-shell --master 'local[8]' \
  --driver-class-path target/scala-2.13/classes \
  --driver-java-options "-Dfile.encoding=UTF-8" \
  --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.session.timeZone=UTC -I tools/dump_plans.scala
