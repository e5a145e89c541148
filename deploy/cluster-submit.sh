#!/usr/bin/env bash
# Production spark-submit profile for the graft engine at ~100 TB input on
# a ~1000-executor YARN/K8s cluster. Everything here is standard Apache
# Spark configuration; values encode the sizing rationale in SCALE.md.
#
# Usage: deploy/cluster-submit.sh <main-class> [args...]
set -euo pipefail
MAIN_CLASS="${1:?main class}"; shift

exec spark-submit \
  --class "$MAIN_CLASS" \
  --deploy-mode cluster \
  `# --- executor sizing: 5 cores/executor keeps HDFS/S3 client` \
  `#     throughput per JVM healthy; 4 such executors per 32-core node` \
  --conf spark.executor.cores=5 \
  --conf spark.executor.memory=20g \
  --conf spark.executor.memoryOverhead=4g \
  --conf spark.dynamicAllocation.enabled=true \
  --conf spark.dynamicAllocation.maxExecutors=1000 \
  --conf spark.dynamicAllocation.shuffleTracking.enabled=true \
  `# --- shuffle: ~128 MB per reduce partition at the biggest shuffle;` \
  `#     AQE coalesces the small ones back down at runtime` \
  --conf spark.sql.shuffle.partitions=8192 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.autoBroadcastJoinThreshold=64m \
  `# --- scans: 256 MB input splits halve the task count of the 100 TB` \
  `#     read without starving parallelism (400k -> 400 tasks/TB)` \
  --conf spark.sql.files.maxPartitionBytes=256m \
  --conf spark.sql.parquet.aggregatePushdown=true \
  `# --- resilience: retried stages must not change answers -> every` \
  `#     graft operator is deterministic by construction (no rand())` \
  --conf spark.speculation=true \
  --conf spark.stage.maxConsecutiveAttempts=8 \
  `# --- object-store output: magic committer avoids O(files) renames` \
  --conf spark.hadoop.fs.s3a.committer.name=magic \
  --conf spark.sql.sources.commitProtocolClass=org.apache.spark.internal.io.cloud.PathOutputCommitProtocol \
  --conf spark.sql.parquet.output.committer.class=org.apache.hadoop.mapreduce.lib.output.BindingPathOutputCommitter \
  `# --- streaming state at scale: RocksDB keeps state off-heap with` \
  `#     incremental checkpoints (used by transformWithState paths)` \
  --conf spark.sql.streaming.stateStore.providerClass=org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider \
  graft-assembly.jar "$@"
