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
  *    custom-state path for unbounded streams. State per user is the short
  *    list of sessions the watermark has not yet sealed (each just (start,
  *    last, count)); a session is emitted when the watermark passes its
  *    last event + gap. State size is O(active users), independent of
  *    stream length — the property that matters at scale.
  */
object Sessionize {

  /** `ts` stays a timestamp so the input's event-time watermark survives to
    * the stateful operator (projecting it to a long would discard it). */
  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class Session(user_id: Long, session_start_ms: Long,
                     session_end_ms: Long, n_events: Long)
  /** One not-yet-closed session. Public — the state encoder's generated
    * code constructs it reflectively. */
  case class OpenSession(start: Long, last: Long, n: Long)
  /** Per-user state: EVERY session the watermark has not yet sealed, not
    * just the latest. A session is closed only once `last + gap ≤
    * watermark` — before that, a non-late event can still arrive inside
    * its gap and extend or bridge it, so emitting it early would diverge
    * from the batch formulation (which a rerun would re-derive). The list
    * stays bounded: all kept sessions end within (watermark, watermark +
    * allowed lateness + gap], so its length is ≤ lateness/gap + O(1),
    * a constant per key — state is still O(active users) at scale. */
  case class OpenSessions(sessions: Seq[OpenSession])

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
    * `ts`; emits each session exactly when the watermark seals it
    * (`last + gap ≤ watermark`) — never earlier, so any event the
    * watermark still admits lands in a still-open session and streaming
    * output equals [[batch]] on the same data for every non-late arrival
    * order (SessionizeSpec pins this with a bridging-event case). */
  def streaming(events: Dataset[SessionEvent], gapMs: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent],
         state: GroupState[OpenSessions]) =>
          // One code path for data and timeout invocations alike (a
          // timeout is a data invocation with zero rows): gap-merge
          // [kept sessions + new events] — the batch formulation's fold
          // applied to the micro-batch, so ANY arrival order converges
          // to the same sessions — then close what the watermark sealed
          // and keep the rest. A timeout only fires once min(last + gap)
          // is behind the watermark, so it always closes ≥ 1 session;
          // backward-only batches for an expired session merge and close
          // here instead of re-arming a timer in the past
          // (setTimeoutTimestamp rejects timestamps ≤ watermark).
          val intervals =
            state.getOption.map(_.sessions.map(s => (s.start, s.last, s.n)))
              .getOrElse(Seq.empty) ++
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
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) =
            merged.partition { case (_, l0, _) => l0 + gapMs <= wm }
          if (open.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(OpenSessions(open.map {
              case (s0, l0, n0) => OpenSession(s0, l0, n0)
            }.toSeq))
            // earliest seal time among kept sessions; > wm by construction
            state.setTimeoutTimestamp(
              open.map { case (_, l0, _) => l0 + gapMs }.min)
          }
          closed.iterator.map { case (s0, l0, n0) =>
            Session(user, s0, l0, n0)
          }
      }
  }
}
