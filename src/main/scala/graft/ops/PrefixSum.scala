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

  /** PER-GROUP running sum — the scale-correct replacement for
    * `sum(x) OVER (PARTITION BY g ORDER BY …)` when the group key has FEW
    * distinct values: Spark's window hash-partitions on the key, so a
    * 6-value key runs the whole fact table through 6 tasks no matter how
    * many executors exist (the same parallelism collapse the empty
    * partition-by has, divided by |groups|).
    *
    * Same two-phase shape as [[runningSum]], with the group key LEADING
    * the range-partition order so each group occupies a contiguous run of
    * partitions (a large group spans MANY partitions — that is the point).
    * Each partition reports only its boundary state — (first group key,
    * last group key, sum of the trailing last-group run) — an O(1)-per-
    * partition driver collect; a partition's offset is then the chained
    * trailing sums of the immediately-preceding partitions that end in
    * its first group (walked backward on the driver, transparent across
    * empty partitions). The second map pass resets the running value at
    * every within-partition group change, so only each partition's FIRST
    * group consumes the offset.
    *
    * `groupCols` are column NAMES (the boundary walk compares row values
    * by field index); `orderCols` must totally order rows WITHIN a group,
    * the same caveat the window form carries. */
  def groupedRunningSum(df: DataFrame, groupCols: Seq[String],
                        orderCols: Seq[Column], valueCol: String,
                        outCol: String = "running", partitions: Int = 0)
      : DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val keys = groupCols.map(df.col) ++ orderCols
    val sorted = df.repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
    require(df.schema(valueCol).dataType == LongType,
      s"groupedRunningSum needs a LongType value column; '$valueCol' is " +
        s"${df.schema(valueCol).dataType.simpleString} - cast it first")
    // The boundary walk compares group-key values on the driver and in the
    // second map pass. BinaryType keys come back as Array[Byte] — reference
    // equality, so a group spanning a partition boundary would silently
    // fail to chain. Fail loud at plan time instead (composite array/map/
    // struct keys are rejected conservatively too: binary can nest inside
    // them); hash such keys to an atomic column (e.g. xxhash64) upstream.
    groupCols.foreach { g =>
      import org.apache.spark.sql.types._
      val dt = df.schema(g).dataType
      val valueComparable = dt match {
        case BinaryType => false // Array[Byte]: reference equality
        case _: ArrayType | _: MapType | _: StructType => false
        case _ => true
      }
      require(valueComparable,
        s"groupedRunningSum group key '$g' is ${dt.simpleString}: keys are " +
          "compared by value equality, which binary (and binary nested in " +
          "array/map/struct) does not provide - hash the key to an atomic " +
          "column first")
    }
    val gIdx = groupCols.map(sorted.schema.fieldIndex)
    val valueIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    // Group-key equality must match SPARK's grouping semantics, not
    // Scala's: Scala == unboxes numerics, so NaN != NaN and every
    // NaN-keyed row would silently restart its group (and -0.0 vs 0.0
    // would split a group Spark considers one). Normalize floats once
    // (canonical NaN, -0.0 -> 0.0) and compare with java.lang equals
    // (bit-level for boxed Double/Float: NaN equals NaN).
    def gkey(r: Row): Seq[Any] = gIdx.map { i =>
      r.get(i) match {
        case d: java.lang.Double =>
          if (d.isNaN) java.lang.Double.valueOf(Double.NaN)
          else if (d.doubleValue() == 0d) java.lang.Double.valueOf(0d) else d
        case f: java.lang.Float =>
          if (f.isNaN) java.lang.Float.valueOf(Float.NaN)
          else if (f.floatValue() == 0f) java.lang.Float.valueOf(0f) else f
        case x => x
      }
    }
    def sameKey(a: Seq[Any], b: Seq[Any]): Boolean =
      a.lazyZip(b).forall((x, y) =>
        if (x == null) y == null else x.equals(y))
    // Boundary state per partition: (firstKey, lastKey, trailingSum) where
    // trailingSum covers the run of rows at the END of the partition whose
    // key == lastKey. Interior groups never need cross-partition offsets.
    val bounds: Array[Option[(Seq[Any], Seq[Any], Long)]] = {
      val collected = rdd.mapPartitionsWithIndex { (pid, it) =>
        var first: Seq[Any] = null
        var cur: Seq[Any] = null
        var curSum = 0L
        it.foreach { r =>
          val k = gkey(r)
          val v = if (r.isNullAt(valueIdx)) 0L else r.getLong(valueIdx)
          if (first == null) { first = k; cur = k; curSum = v }
          else if (sameKey(k, cur)) curSum += v
          else { cur = k; curSum = v }
        }
        Iterator.single(pid ->
          (if (first == null) None else Some((first, cur, curSum))))
      }.collect().toMap
      Array.tabulate(n)(pid => collected.getOrElse(pid, None))
    }
    val offsets = Array.tabulate(n) { p =>
      bounds(p) match {
        case None => 0L
        case Some((firstKey, _, _)) =>
          var acc = 0L
          var q = p - 1
          var continue = true
          while (continue && q >= 0) {
            bounds(q) match {
              case None => q -= 1 // empty partition: transparent
              case Some((qFirst, qLast, qTrailing)) =>
                if (sameKey(qLast, firstKey)) {
                  acc += qTrailing
                  // the group may extend further back only if it fills
                  // partition q entirely
                  if (sameKey(qFirst, firstKey)) q -= 1 else continue = false
                } else continue = false
            }
          }
          acc
      }
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: Seq[Any] = null
      var s = 0L
      it.map { r =>
        val k = gkey(r)
        if (cur == null) { cur = k; s = bc.value(pid) }
        else if (!sameKey(k, cur)) { cur = k; s = 0L }
        if (!r.isNullAt(valueIdx)) s += r.getLong(valueIdx)
        Row.fromSeq(r.toSeq :+ s)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
