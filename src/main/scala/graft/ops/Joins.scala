package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / range join operators Spark lacks as built-ins, composed from
  * relational primitives so Catalyst/Tungsten still drive execution
  * (preference (a) of the custom-operator ladder: no custom physical node
  * needed — the semantics ARE expressible, the trick is expressing them
  * without a cross join).
  */
object Joins {

  /** As-of join: attach to each left row the latest right row whose time is
    * ≤ (or < when `strict`) the left row's time, per key — the canonical
    * "enrich events with the most recent dimension snapshot" operator
    * (DuckDB/kdb ASOF JOIN, pandas merge_asof).
    *
    * Formulated as union + keyed window, NOT a join:
    *   tag sides → union → last(right payload, ignoreNulls) over
    *   (PARTITION BY keys ORDER BY time, side) ROWS UNBOUNDED PRECEDING..CURRENT
    * so the right values "carry forward" onto subsequent left rows.
    *
    * Scale properties: exactly ONE hash exchange (on the keys) for any
    * input sizes — no broadcast requirement on either side, no range
    * explosion, no per-key reducer skew beyond what the key distribution
    * itself has. A join-based formulation would need an inequality
    * condition (cross-ish) or a broadcast; this shape is how you run it on
    * two 100 TB tables.
    *
    * Contract: right rows with a null key or null time are unmatchable in
    * SQL semantics and are dropped up front; (keys, rightTime) should be
    * unique on the right (pre-aggregate otherwise) — ties at identical
    * time would be order-dependent. Left and right non-key column names
    * must be disjoint (rename before calling).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               strict: Boolean = false): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, strict, forward = false)

  /** Forward as-of join: the EARLIEST right row whose time is ≥ (or >
    * when `strict`) the left row's time, per key — pandas
    * merge_asof(direction='forward'). Same union + keyed window shape and
    * scale properties as [[asofJoin]], mirrored: the carry runs over
    * ROWS CURRENT..UNBOUNDED FOLLOWING with first(_, ignoreNulls), and
    * the tie-break tags flip so an inclusive forward as-of sees a right
    * row at the exact same time while a strict one does not. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      strict: Boolean = false): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, strict, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       strict: Boolean, forward: Boolean): DataFrame = {
    // Same-type times are REQUIRED, not coerced: an implicit cast would
    // either throw per-row under ANSI or (legacy) turn malformed values
    // into nulls that sort first and leak payload onto earlier left rows.
    // Failing at plan construction is the honest contract.
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"asofJoin: $leftTime is ${left.schema(leftTime).dataType.sql} but " +
        s"$rightTime is ${right.schema(rightTime).dataType.sql} — cast " +
        "explicitly before joining")
    val payload = right.columns.filterNot(c => keys.contains(c)).toSeq
    val leftOther = left.columns.filterNot(c => keys.contains(c)).toSeq
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val payloadStruct = org.apache.spark.sql.types.StructType(
      right.schema.fields.filter(f => payload.contains(f.name)).toSeq)

    // At equal times an inclusive as-of must see the right row, a strict
    // one must not. Backward carries from earlier rows (right sorts first
    // to be seen), forward from later rows (right sorts last to be seen) —
    // strictness flips each.
    val (rightTag, leftTag) =
      if (forward) { if (strict) (0, 1) else (1, 0) }
      else { if (strict) (1, 0) else (0, 1) }

    val l2 = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_gt"), lit(leftTag).as("_gs")) ++
        leftOther.map(col) :+
        lit(null).cast(payloadStruct).as("_gp"): _*)
    // The payload rides as ONE struct: last(_, ignoreNulls) then picks the
    // latest right ROW atomically — a per-column carry would resurrect an
    // older row's value wherever the latest row holds a null, and could
    // stitch fields of different right rows into one output row.
    val r2 = right
      .select(
        keys.map(col) ++
          Seq(col(rightTime).as("_gt"), lit(rightTag).as("_gs")) ++
          leftOther.map(c => lit(null).cast(leftTypes(c)).as(c)) :+
          struct(payload.map(col): _*).as("_gp"): _*)
      .filter(keys.map(col(_).isNotNull).reduceOption(_ && _)
        .getOrElse(lit(true)) && col("_gt").isNotNull)

    // A null-timed LEFT row is unmatchable in SQL semantics (t >= NULL is
    // never true), so it must sort where its carry window sees no right
    // rows: nulls FIRST for the backward carry (nothing precedes it) and
    // nulls LAST for the forward carry (nothing follows it). Spark's
    // default asc is nulls-first — correct for backward only by accident,
    // and wrong for forward, where a null-timed left row would swallow the
    // earliest right payload. Both are pinned explicitly.
    val timeOrder =
      if (forward) col("_gt").asc_nulls_last else col("_gt").asc_nulls_first
    val wBase = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("_gs").asc)
    val (w, carry) =
      if (forward)
        (wBase.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("_gp"), ignoreNulls = true))
      else
        (wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("_gp"), ignoreNulls = true))

    l2.unionByName(r2)
      .select(keys.map(col) ++ Seq(col("_gs")) ++ leftOther.map(col) :+
        carry.over(w).as("_gp"): _*)
      .filter(col("_gs") === leftTag)
      .select(keys.map(col) ++ leftOther.map(col) ++
        payload.map(c => col(s"_gp.$c").as(c)): _*)
  }

  /** Range (interval containment) join: pair each point row with every
    * interval row of the same `keys` whose [lo, hi] contains the point.
    * `pointCol` / `loCol` / `hiCol` must share a numeric domain (cast
    * dates to epoch days first).
    *
    * Scale path: overlap bucketing. Intervals replicate to each bucket of
    * width `bucketWidth` they touch (sequence + explode), points map to
    * exactly one bucket, and the equi-join runs on (keys :+ bucket) with
    * the exact containment predicate re-checked after. No cross join for
    * keyless range joins, no broadcast requirement, and a point is emitted
    * at most once per containing interval (it lives in one bucket).
    * Choose bucketWidth ≈ typical interval span: replication factor is
    * 1 + span/width while bucket selectivity improves with smaller widths.
    *
    * `maxSpanBuckets` fail-fasts (clear in-plan error naming the row's
    * span) on intervals that would replicate pathologically — one
    * open-ended sentinel like hi = Long.MaxValue would otherwise ask
    * sequence() for billions of elements and kill the job with an opaque
    * array-size error (or OOM a task first). A row that trips it means
    * the width is wrong for the data or the data is malformed; both
    * should surface, not burn the cluster. */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame,
                        pointCol: String, loCol: String, hiCol: String,
                        bucketWidth: Long, keys: Seq[String] = Nil,
                        maxSpanBuckets: Long = 1L << 20)
      : DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxSpanBuckets > 0,
      s"maxSpanBuckets must be positive, got $maxSpanBuckets")
    val loBkt = floor(col(loCol) / lit(bucketWidth))
    val hiBkt = floor(col(hiCol) / lit(bucketWidth))
    val p2 = points
      .filter(col(pointCol).isNotNull)
      .withColumn("_bkt", floor(col(pointCol) / lit(bucketWidth)))
    val i2 = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("_bkt", explode(sequence(loBkt,
        when(hiBkt - loBkt < lit(maxSpanBuckets), hiBkt)
          .otherwise(raise_error(format_string(
            s"rangeJoinBucketed: interval [%s, %s] spans %s buckets of " +
              s"width $bucketWidth (max $maxSpanBuckets); widen " +
              "bucketWidth or clean the interval",
            col(loCol), col(hiCol), hiBkt - loBkt + lit(1)))))))
    p2.join(i2, keys :+ "_bkt")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bkt")
  }
}
