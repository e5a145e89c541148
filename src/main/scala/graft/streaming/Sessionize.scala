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
            // Merge new events (sorted; micro-batches may interleave) into
            // the open session, closing any session a gap terminates.
            // Out-of-order events within the watermark can precede the open
            // session: within gap of its start they extend it BACKWARD;
            // more than a gap earlier they are their own (already-final)
            // session — the previous open session's span never reached them.
            val sorted = it.map(e => e.ts.getTime).toSeq.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.last > gapMs =>
                  closed += Session(user, s.start, s.last, s.n)
                  open = Some(OpenSession(t, t, 1))
                case Some(s) if s.start - t > gapMs =>
                  closed += Session(user, t, t, 1)
                case Some(s) =>
                  open = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
