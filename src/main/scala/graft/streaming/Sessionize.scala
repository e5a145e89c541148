package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** User sessionization (gap-based) — both execution shapes:
  *
  *  - [[batch]]: lag + running-sum-of-breaks over a (user, time) window.
  *    One shuffle on user_id; every downstream engine expresses the same
  *    thing, so it is oracle-checkable.
  *  - [[streaming]]: `flatMapGroupsWithState` with event-time timeout — the
  *    custom-state path for unbounded streams. State per user is just the
  *    open session's (start, last, count); a session is emitted when the
  *    watermark passes its last event + gap. State size is O(active users),
  *    independent of stream length — the property that matters at scale.
  */
object Sessionize {

  /** `ts` stays a timestamp so the input's event-time watermark survives to
    * the stateful operator (projecting it to a long would discard it). */
  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class Session(user_id: Long, session_start_ms: Long,
                     session_end_ms: Long, n_events: Long)
  /** Per-user state: the (only) open session. Public — the state encoder's
    * generated code constructs it reflectively. */
  case class OpenSession(start: Long, last: Long, n: Long)

  /** Batch formulation: break when the gap to the previous event exceeds
    * `gapMs`, session id = running sum of breaks. */
  def batch(events: DataFrame, gapMs: Long, userCol: String = "user_id",
            tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("ts_ms"))
    events
      .select(col(userCol), unix_millis(col(tsCol)).as("ts_ms"))
      .withColumn("brk",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(w) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_no",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_no"))
      .agg(min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
  }

  /** Streaming formulation. Input must carry an event-time watermark on
    * `ts`; emits each session once it can no longer grow. */
  def streaming(events: Dataset[SessionEvent], gapMs: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.last, s.n))
          } else {
            // General gap-merge over [open session interval + new events]:
            // sort every interval by start and coalesce neighbors within
            // gapMs. This is the batch formulation's logic applied to the
            // micro-batch, so ANY arrival order converges to the same
            // sessions — in particular several out-of-order events that all
            // precede the open session merge with EACH OTHER, not only
            // against the open session. All merged sessions except the
            // latest are emitted closed (one-open-session state model: an
            // in-watermark event that would bridge two of them is treated
            // as late, exactly like the batch rerun would re-derive it).
            val intervals =
              state.getOption.map(s => (s.start, s.last, s.n)).toSeq ++
                it.map { e => val t = e.ts.getTime; (t, t, 1L) }
            val merged = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long)]
            intervals.sortBy(i => (i._1, i._2)).foreach {
              case (s0, l0, n0) =>
                merged.lastOption match {
                  case Some((ps, pl, pn)) if s0 - pl <= gapMs =>
                    merged(merged.size - 1) =
                      (ps, math.max(pl, l0), pn + n0)
                  case _ => merged += ((s0, l0, n0))
                }
            }
            val closed = Seq.newBuilder[Session]
            merged.dropRight(1).foreach { case (s0, l0, n0) =>
              closed += Session(user, s0, l0, n0)
            }
            merged.lastOption.foreach { case (s0, l0, n0) =>
              // A data invocation preempts this group's timeout invocation,
              // and setTimeoutTimestamp rejects timestamps at or before the
              // current watermark — so a batch of only backward-extending
              // events for an already-expired session must close it HERE,
              // not re-arm the timer in the past.
              if (l0 + gapMs <= state.getCurrentWatermarkMs()) {
                closed += Session(user, s0, l0, n0)
                state.remove()
              } else {
                state.update(OpenSession(s0, l0, n0))
                state.setTimeoutTimestamp(l0 + gapMs)
              }
            }
            closed.result().iterator
          }
      }
  }
}
