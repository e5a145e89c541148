package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. `classic.ExpressionUtils` is private[sql] in Spark 4, so the
  * conversion lives in this package — the conventional extension point for
  * libraries adding native expressions (no Spark internals are modified). */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Where `name`'s data lives (or would live): the catalog's recorded
    * location when the table exists, else the path the catalog would assign
    * to it — the directory a managed table from a PREVIOUS process left
    * behind even though the current in-memory catalog has no entry for it.
    * `sessionState` is private[sql], hence this shim. */
  def tableLocation(spark: SparkSession, name: String): java.net.URI = {
    val ss = spark.asInstanceOf[classic.SparkSession].sessionState
    val id = ss.sqlParser.parseTableIdentifier(name)
    if (ss.catalog.tableExists(id)) ss.catalog.getTableMetadata(id).location
    else ss.catalog.defaultTablePath(id)
  }

  /** A LAZY local checkpoint that does NOT propagate the origin plan's
    * statistics — the iterative-algorithm twin of
    * `Dataset.localCheckpoint(false)`.
    *
    * Why it exists: Spark 4's `Dataset.checkpoint` stamps the new
    * `LogicalRDD` with `originStats` = the checkpointed plan's
    * estimated statistics (SPARK-39748, to keep broadcast decisions
    * after a checkpoint). For an ITERATIVE algorithm that checkpoints
    * every round, those stats COMPOUND: a round plan referencing the
    * previous label table k times has sizeInBytes ≈ prev^k, so the
    * estimate's bit-length grows k-fold per round — and when any leaf
    * carries `spark.sql.defaultSizeInBytes` (= Long.MaxValue for a
    * catalog table with no stats), round ~10's estimate is a BigInteger
    * of 10^8+ bits and a SINGLE stats walk (JoinSelection's
    * canBroadcastBySize, InjectRuntimeFilter) pins the driver for
    * minutes to hours inside Toom-Cook multiplication. Caught live on
    * the storelife growth axis: connectedComponents over edges drawn
    * from the signature-store TABLE hung the driver 18+ minutes in
    * SizeInBytesOnlyStatsPlanVisitor. A stats-free LogicalRDD falls
    * back to defaultSizeInBytes per ROUND — constant, never
    * compounding, exactly Spark 3's behavior these loops were designed
    * against.
    *
    * Mirrors checkpoint's mechanics otherwise: same materialize-on-
    * first-action laziness (the convergence check right after
    * materializes it), same output partitioning/ordering preservation
    * (skipping them would add one exchange per round). */
  def statsFreeLocalCheckpoint(df: Dataset[Row]): Dataset[Row] = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val qe = cds.queryExecution
    val physical = qe.executedPlan
    val internalRdd = qe.toRdd.map(_.copy())
    internalRdd.localCheckpoint()
    def firstLeafPartitioning(p: catalyst.plans.physical.Partitioning)
        : catalyst.plans.physical.Partitioning = p match {
      case c: catalyst.plans.physical.PartitioningCollection =>
        firstLeafPartitioning(c.partitionings.head)
      case other => other
    }
    classic.Dataset.ofRows(cds.sparkSession,
      execution.LogicalRDD(qe.analyzed.output, internalRdd,
        firstLeafPartitioning(physical.outputPartitioning),
        physical.outputOrdering, cds.isStreaming)(
        cds.sparkSession, None, None))
  }

  /** The table's bucket count (None when the table exists unbucketed).
    * Store maintenance reads this so appends and compaction rewrites
    * always match the layout the store was CREATED with, whatever
    * bucket count the caller picked then. `sessionState` is
    * private[sql], hence this shim. */
  def tableBuckets(spark: SparkSession, name: String): Option[Int] = {
    val ss = spark.asInstanceOf[classic.SparkSession].sessionState
    val id = ss.sqlParser.parseTableIdentifier(name)
    ss.catalog.getTableMetadata(id).bucketSpec.map(_.numBuckets)
  }

  /** Unload every loaded streaming state-store provider and stop the
    * state-store maintenance machinery. Safe to call between queries: the
    * next stateful stream lazily re-creates what it needs
    * (`StateStore.get` restarts maintenance on demand).
    *
    * Why this exists: each stateful streaming query run against a FRESH
    * checkpoint dir registers new `StateStoreProviderId`s (one per shuffle
    * partition per stateful operator) in the executor-global provider map;
    * unloading normally waits on the 60 s maintenance cycle noticing the
    * coordinator deactivated the run. A harness that starts hundreds of
    * short AvailableNow streams, each with its own temp checkpoint,
    * accumulates providers (heap for HDFS-backed stores, NATIVE memory for
    * RocksDB) faster than maintenance drains them — which progressively
    * degrades the whole JVM. Must NOT be called while a streaming query is
    * actively running (its executors would lose their stores mid-batch and
    * pay a reload). */
  def stopStateStores(): Unit =
    execution.streaming.state.StateStore.stop()

  /** Number of state-store providers currently loaded in this JVM —
    * diagnostic twin of [[stopStateStores]] (the map itself is private, so
    * this goes through reflection; returns -1 if the field moves in a
    * future Spark). */
  def loadedStateStoreProviders(): Int =
    try {
      val cls = execution.streaming.state.StateStore.getClass
      val f = cls.getDeclaredField("loadedProviders")
      f.setAccessible(true)
      f.get(execution.streaming.state.StateStore)
        .asInstanceOf[scala.collection.mutable.HashMap[_, _]].size
    } catch { case scala.util.control.NonFatal(_) => -1 }

  /** Block until the async listener bus has delivered every queued
    * event. A SparkListener accumulating task metrics over a code
    * region reads ZEROS (or a prior region's stragglers) without this —
    * task-end events are posted asynchronously. `listenerBus` is
    * private[spark], hence the shim. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
