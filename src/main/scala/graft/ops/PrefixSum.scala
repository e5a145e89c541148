package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global running sum — the scale-correct replacement for
  * `sum(x) OVER (ORDER BY …)`, whose empty partition-by funnels the whole
  * dataset through one reducer.
  *
  * Classic two-phase parallel prefix: range-repartition on the order keys
  * (distributed total sort), compute each partition's local sum (one
  * O(partitions)-scalars job — the same driver round GlobalIndex's
  * zipWithIndex pays), broadcast the exclusive prefix of those totals,
  * then a second map pass adds each partition's offset to its local
  * running sum. The sort's shuffle files are computed once and reused by
  * both jobs (shared RDD lineage); no task ever sees more than its own
  * partition.
  *
  * The running value at a row depends on row order, so pass order keys
  * that are a total order (or pre-aggregate to one row per key, as the
  * sweep-line queries do) — the same caveat ROW_NUMBER/window SUM carry.
  */
object PrefixSum {

  def runningSum(df: DataFrame, orderCols: Seq[Column], valueCol: String,
                 outCol: String = "running", partitions: Int = 0)
      : DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    // the per-partition passes read the value with getLong; fail loud at
    // plan time rather than ClassCastException inside a task
    require(df.schema(valueCol).dataType == LongType,
      s"runningSum needs a LongType value column; '$valueCol' is " +
        s"${df.schema(valueCol).dataType.simpleString} - cast it first")
    val valueIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val partTotals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(valueIdx)) s += r.getLong(valueIdx))
      Iterator.single(pid -> s)
    }.collect().toMap
    val offsets = (0 until n).scanLeft(0L) { (acc, pid) =>
      acc + partTotals.getOrElse(pid, 0L)
    }.toArray // exclusive prefix: offsets(pid) = sum of partitions < pid
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = bc.value(pid)
      it.map { r =>
        if (!r.isNullAt(valueIdx)) s += r.getLong(valueIdx)
        Row.fromSeq(r.toSeq :+ s)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
