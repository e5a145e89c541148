package graft.streaming

import org.apache.spark.sql.{GraftShims, SparkSession}

/** Between-queries hygiene for sessions that run MANY short streaming
  * queries (the Verify/Bench harness shape: hundreds of AvailableNow
  * streams, each against its own per-invocation temp checkpoint).
  *
  * Why it's needed: every stateful streaming run registers one state-store
  * provider per (stateful operator × shuffle partition) under its
  * checkpoint's `StateStoreProviderId` in a JVM-global map. Providers are
  * normally evicted by the state-store MAINTENANCE cycle (default 60 s)
  * once the coordinator marks the run inactive — an eviction rate tuned
  * for a cluster hosting a few long-lived streams, not for a harness
  * starting a new stream every few seconds. Unique-per-run checkpoints
  * (required for bench/verify isolation — see the r6 fixed-dir bug where
  * the warm pass resumed pass-1 state and timed a no-op) mean NO provider
  * is ever reused, so the map only grows between maintenance ticks:
  * HDFS-backed stores pin their version maps on heap, RocksDB stores pin
  * native memory and background threads. Measured effect in the r6 driver
  * bench: queries early in the suite alphabet cost 0.5 s in isolation but
  * 10–50 s in the long-lived session — the accumulation degrades the
  * whole JVM, not just streaming.
  *
  * `release` unloads all providers and stops maintenance (lazily
  * restarted by the next stateful stream), then prunes the terminated
  * query registry. It must only be called when NO streaming query is
  * active — concurrent active streams would lose their stores mid-batch
  * and pay a reload (correct but slow). Memory-sink tables are left
  * alone: runners reuse fixed query names, so each run replaces its
  * predecessor's table instead of accumulating. */
object StreamHygiene {
  def release(spark: SparkSession): Unit = {
    if (spark.streams.active.isEmpty) GraftShims.stopStateStores()
    spark.streams.resetTerminated()
  }
}
