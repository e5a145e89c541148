package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global consecutive row numbering over a total order — the distributed
  * alternative to `row_number() OVER (ORDER BY …)`, whose empty
  * partition-by clause funnels the ENTIRE dataset through one reducer
  * (the canonical 100 TB cliff; Spark even warns about it at plan time).
  *
  * Shape: range-repartition on the order keys (distributed total sort —
  * boundaries from Spark's deterministic reservoir sketch), sort within
  * partitions, then `zipWithIndex`, which runs one O(partitions) count
  * job and adds each partition's offset map-side. Cost: one wide
  * exchange + one scalar-per-partition driver round — no data ever
  * converges on a single task. The assigned ids equal ROW_NUMBER's as
  * long as the order keys are a total order (unique); with duplicate
  * keys the ids are still consecutive and sorted, but tie order is
  * partitioning-dependent — pass a tie-breaking key, as ROW_NUMBER
  * itself would need for determinism anyway.
  */
object GlobalIndex {

  def withRowId(df: DataFrame, orderCols: Seq[Column],
                idCol: String = "row_id", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // The sorted frame is read twice — by zipWithIndex's per-partition
    // count job and by the downstream scan. Deliberately NOT persisted: a
    // full-suite A/B at sf0.1 (both BENCH_full arms, healthy post-hygiene
    // session) showed the Scratch persist is a wash-to-loss on every
    // caller (o_global_rowid 0.78→0.52 s warm WITHOUT it, o_prefix_sum
    // 0.80→0.71, f_dsir_weights 4.80→5.13 — the one small win), because
    // shuffle-file stage reuse already skips the upstream map stages on
    // the second job and only the reduce-side sort re-runs. The earlier
    // claimed 19.5→14.5 s f_dsir_weights win was measured in a degrading
    // session and does not reproduce. Persist-free also removes a
    // lifecycle trap: a long-lived caller (foreachBatch loop) would have
    // to release the Scratch registry after every action or accumulate
    // MEMORY_AND_DISK persists. A 100 TB caller whose order keys are
    // expensive computed columns can persist `df` itself before calling.
    val sorted =
      df.repartitionByRange(n, orderCols: _*)
        .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, schema)
  }
}
