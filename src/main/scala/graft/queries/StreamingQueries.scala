package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.streaming.{Sessionize, StreamingKpis}

/** Streaming parity queries: each Structured Streaming query must equal
  * the equivalent batch aggregation (DuckDB computes the batch twin).
  * Every window family has a real-stream entry — tumbling
  * (streaming_hourly_counts), sliding (streaming_sliding_counts), and
  * session (streaming_sessions) — plus gap sessionization in its batch
  * formulation (the flatMapGroupsWithState custom-state twin is asserted
  * equal in SessionizeSpec). */
object StreamingQueries extends QueryGroup {

  private def hourly(s: SparkSession, dir: String): DataFrame =
    StreamingKpis.runAvailableNow(s, dir)

  private def genreStream(s: SparkSession, dir: String): DataFrame =
    StreamingKpis.runGenreAvailableNow(s, dir)

  private def attribution(s: SparkSession, dir: String): DataFrame =
    StreamingKpis.runAttributionAvailableNow(s, dir)

  private def streamDedup(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamDedup.runAvailableNow(s, dir)

  private def upsertReplay(s: SparkSession, dir: String): DataFrame =
    StreamingKpis.runUpsertReplayAvailableNow(s, dir)

  private def sessions(s: SparkSession, dir: String): DataFrame =
    Sessionize.batch(Sources.table(s, dir, "events"), 30 * 60 * 1000L)
      .orderBy("user_id", "session_no")

  /** The same gap sessions via Spark's NATIVE session_window operator (the
    * idiomatic form, identical in batch and streaming). Boundary semantics
    * differ from [[Sessionize.batch]] by one instant: session_window's
    * half-open [t, t+gap) splits at a gap of EXACTLY 30 min where the
    * lag-formulation merges — the oracle encodes session_window's `>=`
    * break so the native operator is pinned, not approximated. */
  private def sessionsNative(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("session_start_ms"),
        // window end = last event + gap; report the last EVENT time
        (unix_millis(col("w.end")) - lit(30 * 60 * 1000L))
          .as("session_end_ms"),
        col("n_events"))
      .orderBy("user_id", "session_start_ms")

  private def admission(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamAdmission.runAvailableNow(s, dir)

  /** Batch twin of the streaming admission: the same (b=2, r=2) MinHash
    * signature family (ExtensionQueries.sigCte), delta×base collision →
    * min dup id, LEFT JOIN so unmatched (and unshingleable) delta docs
    * are admitted. */
  private val admissionOracle: String =
    ExtensionQueries.dCte + ExtensionQueries.shCte + ExtensionQueries.sigCte +
      """, m AS (SELECT d.doc_id, MIN(b.doc_id) AS dup_of
        |    FROM sig d JOIN sig b ON d.band = b.band AND d.sig = b.sig
        |    WHERE d.doc_id % 3 = 0 AND b.doc_id % 3 <> 0
        |    GROUP BY d.doc_id)
        |SELECT dd.doc_id, (m.dup_of IS NULL) AS admitted, m.dup_of
        |FROM documents dd LEFT JOIN m USING (doc_id)
        |WHERE dd.doc_id % 3 = 0
        |ORDER BY doc_id""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("streaming_admission", admission, Some(admissionOracle)),
    QueryDef("streaming_hourly_counts", hourly, Some(
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
        |       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
        |       event_type, COUNT(*) AS plays
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),
    QueryDef("streaming_genre_counts", genreStream, Some(
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
        |       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
        |       c_mktsegment AS genre, COUNT(*) AS plays
        |FROM events e JOIN (SELECT c_custkey, c_mktsegment FROM customer
        |                    WHERE c_acctbal > 5000) c
        |  ON e.user_id = c.c_custkey
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),
    QueryDef("streaming_sliding_counts",
      (s, dir) => StreamingKpis.runSlidingAvailableNow(s, dir), Some(
      """WITH k AS (SELECT unnest([0, 1]) AS off)
        |SELECT epoch_ms(date_trunc('hour', ts) - off * INTERVAL 1 HOUR)
        |    AS win_start_ms,
        |  event_type, COUNT(*) AS plays
        |FROM events, k
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QueryDef("streaming_click_attribution", attribution, Some(
      """SELECT i.user_id,
        |       'camp_' || CAST(i.event_id % 5 AS VARCHAR) AS campaign,
        |       epoch_ms(i.ts) AS imp_ts_ms, epoch_ms(c.ts) AS click_ts_ms
        |FROM events i JOIN events c
        |  ON i.user_id = c.user_id
        | AND i.event_type = 'view' AND c.event_type = 'click'
        | AND c.ts >= i.ts AND c.ts <= i.ts + INTERVAL 30 MINUTE
        |ORDER BY 1, 2, 3, 4""".stripMargin)),
    // Streaming top-k per hour window: stateful windowed counts in the
    // stream, bounded ranking on the complete sink (see
    // StreamingKpis.runTopKAvailableNow).
    QueryDef("streaming_topk_types",
      (s, dir) => StreamingKpis.runTopKAvailableNow(s, dir), Some(
      """WITH c AS (SELECT epoch_ms(date_trunc('hour', ts)) AS win_start_ms,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS plays
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY win_start_ms
        |        ORDER BY plays DESC, event_type ASC) AS INTEGER) AS rk
        |      FROM c)
        |SELECT win_start_ms, event_type, plays, rk
        |FROM r WHERE rk <= 3
        |ORDER BY win_start_ms ASC, rk ASC""".stripMargin)),
    QueryDef("streaming_running_totals",
      (s, dir) => graft.streaming.RunningCounts.runAvailableNow(s, dir), Some(
      """SELECT user_id, CAST(count(*) AS BIGINT) AS total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),
    QueryDef("streaming_type_totals",
      (s, dir) => graft.streaming.RunningCounts.runTypesAvailableNow(s, dir),
      Some(
      """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin)),
    QueryDef("streaming_dedup_hashes", streamDedup, Some(
      """SELECT DISTINCT md5(text) AS content_hash FROM documents
        |ORDER BY content_hash""".stripMargin)),
    QueryDef("streaming_upsert_replay", upsertReplay, Some(
      """SELECT user_id, epoch_ms(max(ts)) AS last_ts_ms,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),
    // streaming retraction: per-batch signed CDC partials fold into the
    // persistent net-multiplicity state (StreamingKpis scaladoc); the
    // oracle recomputes the post-CDC set directly — the streaming twin
    // of etl_incremental_retract, same fixture rule
    QueryDef("streaming_retract_totals",
      (s, dir) => StreamingKpis.runRetractAvailableNow(s, dir), Some(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
        |    AS avg_value,
        |  COUNT(DISTINCT user_id) AS live_users
        |FROM events
        |WHERE event_id % 11 = 0 OR event_id % 13 <> 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),
    QueryDef("sessionize_batch", sessions, Some(
      """WITH o AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |b AS (SELECT user_id, ts_ms,
        |        CASE WHEN ts_ms - lag(ts_ms) OVER
        |               (PARTITION BY user_id ORDER BY ts_ms) > 1800000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM o),
        |s AS (SELECT user_id, ts_ms,
        |        CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        |      FROM b)
        |SELECT user_id, session_no,
        |       MIN(ts_ms) AS session_start_ms, MAX(ts_ms) AS session_end_ms,
        |       COUNT(*) AS n_events
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    // The native operator ACTUALLY STREAMING: same result contract as
    // sessionize_native (same oracle), but computed through the streaming
    // session-state store — tumbling, sliding, and session windows all
    // have a real-stream entry.
    QueryDef("streaming_sessions",
      (s, dir) => StreamingKpis.runSessionsAvailableNow(s, dir), Some(
      """WITH o AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |b AS (SELECT user_id, ts_ms,
        |        CASE WHEN ts_ms - lag(ts_ms) OVER
        |               (PARTITION BY user_id ORDER BY ts_ms) >= 1800000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM o),
        |s AS (SELECT user_id, ts_ms,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
        |          ROWS UNBOUNDED PRECEDING) AS session_no
        |      FROM b)
        |SELECT user_id,
        |       MIN(ts_ms) AS session_start_ms, MAX(ts_ms) AS session_end_ms,
        |       COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_no
        |ORDER BY user_id, session_start_ms""".stripMargin)),
    QueryDef("sessionize_native", sessionsNative, Some(
      """WITH o AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |b AS (SELECT user_id, ts_ms,
        |        CASE WHEN ts_ms - lag(ts_ms) OVER
        |               (PARTITION BY user_id ORDER BY ts_ms) >= 1800000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM o),
        |s AS (SELECT user_id, ts_ms,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
        |          ROWS UNBOUNDED PRECEDING) AS session_no
        |      FROM b)
        |SELECT user_id,
        |       MIN(ts_ms) AS session_start_ms, MAX(ts_ms) AS session_end_ms,
        |       COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_no
        |ORDER BY user_id, session_start_ms""".stripMargin)),
  )
}
