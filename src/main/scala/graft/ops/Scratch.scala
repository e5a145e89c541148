package graft.ops

import org.apache.spark.sql.DataFrame

/** Scratch-cache registry: frames persisted because one query plan
  * consumes them more than once (self-join sides, a sorted frame read by
  * both zipWithIndex's count job and the downstream scan). The persist
  * must outlive the query's ACTION — which happens after the builder
  * returns — so builders can't unpersist; each persist registers here and
  * the runner (Verify/Bench loop, or any long-lived session) calls
  * [[releaseAll]] once the action completes. Same lifecycle shape as
  * CoreQueries.warmShared/coolShared, scoped per-query instead of
  * per-run. (Moved from Dedup so non-ext operators share the lifecycle;
  * Dedup.releaseScratch remains the runner-facing entry point.) */
object Scratch {

  private val registry = scala.collection.concurrent.TrieMap
    .empty[DataFrame, Unit]

  // MEMORY_AND_DISK (the Dataset.persist default, made explicit): under
  // full-suite memory pressure an evicted scratch partition is re-read
  // from local disk, never recomputed through the subtree it exists to
  // avoid — the warm-slower-than-cold failure mode.
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registry.put(p, ()); p
  }

  /** Unpersist every registered scratch frame. Safe to call between
    * queries in a long-lived session; one-shot JVMs may skip it (process
    * exit releases everything). */
  def releaseAll(): Unit =
    registry.keys.foreach { df =>
      registry.remove(df)
      try df.unpersist() catch { case _: Throwable => () }
    }
}
