package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.EventWindows
import QueryDefs._

/** Judged batch-mode runs of the streaming window operators
  * (SURVEY.md §2.10 T1–T3). The SAME EventWindows transforms run under
  * Structured Streaming in StreamingSpec (MemoryStream + watermark);
  * here they run in batch over the events table so DuckDB can verify
  * the window semantics row-for-row.
  *
  * Oracle notes: DuckDB reads events.ts as TIMESTAMP_NS; CAST AS
  * TIMESTAMP truncates to µs identically to the Spark-side nanos shim
  * (SURVEY.md §1.3, verified round 1). Window boundaries are
  * epoch-aligned in both engines (Spark `window()` aligns to the epoch;
  * the oracle reproduces that with epoch_us arithmetic / date_trunc).
  */
object Streaming {

  /** T1: daily tumbling windows per event_type. */
  val qStreamTumbling: QueryFn = withTables { spark =>
    EventWindows.tumbling(spark.table("events"), "1 day")
      .orderBy("w_start", "event_type")
  }

  /** T2: 1-hour windows sliding every 30 minutes, per event_type; each
    * event contributes to exactly 2 windows.
    */
  val qStreamSliding: QueryFn = withTables { spark =>
    EventWindows.sliding(spark.table("events"), "1 hour", "30 minutes")
      .orderBy("w_start", "event_type")
  }

  /** T3: per-user sessions with a 30-minute inactivity gap. */
  val qStreamSession: QueryFn = withTables { spark =>
    EventWindows.sessions(spark.table("events"), "30 minutes")
      .orderBy("user_id", "s_start")
  }

  /** Row-level sessionization: every event tagged with its per-user
    * session_no (30-min gap, same rule as T3) — the event→session
    * assignment downstream per-session features need. One user-keyed
    * exchange; lag + running sum share a single window sort
    * (PlanSpec-pinned).
    */
  val qSessionize: QueryFn = withTables { spark =>
    EventWindows.sessionize(spark.table("events"),
        "user_id", "ts", "event_id", gapSeconds = 1800L)
      .select(col("user_id"), col("event_id"), col("session_no"))
      .orderBy("user_id", "event_id")
  }

  /** Conversation assembly: each (user, session) collapsed to one
    * ordered transcript of its event types plus count and span — the
    * events→documents bridge (downstream text ops consume the
    * transcript column like document text). Same 30-min gap rule and
    * total (ts, event_id) order as q_sessionize, so the transcript
    * string is deterministic in both engines.
    */
  val qSessionTranscript: QueryFn = withTables { spark =>
    EventWindows.sessionTranscripts(spark.table("events"),
        "user_id", "ts", "event_id", "event_type", gapSeconds = 1800L)
      .select(col("user_id"), col("session_no"), col("transcript"),
        col("n_events"), col("span_sec"))
      .orderBy("user_id", "session_no")
  }

  /** Top-10 three-step in-session event flows under the same 30-min
    * gap rule and (ts, event_id) total order: exact path counts,
    * (n DESC, path) total-order ranking.
    */
  val qTopPaths: QueryFn = withTables { spark =>
    EventWindows.topPaths(spark.table("events"), "user_id", "ts",
        "event_id", "event_type", gapSeconds = 1800L, pathLen = 3, k = 10)
      .orderBy(col("n").desc, col("path"))
  }

  /** Bounce rate per landing event type under the q_sessionize gap
    * rule: exact session counts, one rounded division.
    */
  val qBounceRate: QueryFn = withTables { spark =>
    EventWindows.bounceRate(spark.table("events"), "user_id", "ts",
        "event_id", "event_type", gapSeconds = 1800L)
      .orderBy("event_type")
  }

  val queries: Map[String, QueryFn] = Map(
    "q_bounce_rate" -> qBounceRate,
    "q_stream_tumbling" -> qStreamTumbling,
    "q_stream_sliding" -> qStreamSliding,
    "q_stream_session" -> qStreamSession,
    "q_sessionize" -> qSessionize,
    "q_session_transcript" -> qSessionTranscript,
    "q_top_paths" -> qTopPaths,
  )

  val oracles: Map[String, String] = Map(
    // q_sessionize's gaps-and-islands CTE; landing = first event in
    // the (ts, event_id) total order; bounce = single-event session.
    "q_bounce_rate" -> """
      WITH e AS (SELECT user_id, event_id, event_type,
                        CAST(ts AS TIMESTAMP) AS ts
                 FROM events),
      m AS (
        SELECT user_id, event_id, event_type, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      i AS (
        SELECT user_id, event_id, event_type, ts,
               CAST(SUM(brk) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM m),
      per AS (
        SELECT user_id, session_no,
               COUNT(*)::BIGINT AS n,
               FIRST(event_type ORDER BY ts, event_id) AS landing
        FROM i GROUP BY 1, 2)
      SELECT landing AS event_type,
             COUNT(*)::BIGINT AS n_sessions,
             SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces,
             CAST(ROUND(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS bounce_rate
      FROM per
      GROUP BY landing
      ORDER BY event_type""",

    // Tumbling day = date_trunc; epoch-aligned like Spark's window().
    "q_stream_tumbling" -> """
      WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start,
             CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS w_end,
             event_type,
             COUNT(*) AS n_events,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_value
      FROM e
      GROUP BY 1, 2, 3
      ORDER BY w_start, event_type""",

    // Sliding 1h/30m: every event belongs to the two 30-min-aligned
    // windows [floor30(ts)-i*30m, +1h) for i in {0,1} — exactly
    // Spark's assignment. Reproduced via epoch-µs floor division.
    "q_stream_sliding" -> """
      WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      w AS (
        SELECT make_timestamp(((epoch_us(ts) // 1800000000) - i) * 1800000000) AS w_start,
               event_type, value
        FROM e, (SELECT UNNEST([0, 1]) AS i) shifts)
      SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end, event_type,
             COUNT(*) AS n_events,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_value
      FROM w
      GROUP BY 1, 2, 3
      ORDER BY w_start, event_type""",

    // Sessions: gaps-and-islands. A new session starts when the gap to
    // the previous event is >= 30 min (Spark sessions are [start,
    // last+gap) EXCLUSIVE of the end, so an event exactly gap-after
    // opens a new session). Session end = last event + gap.
    "q_stream_session" -> """
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      m AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      i AS (
        SELECT user_id, ts, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sess
        FROM m)
      SELECT user_id,
             MIN(ts) AS s_start,
             MAX(ts) + INTERVAL 30 MINUTE AS s_end,
             COUNT(*) AS n_events,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_value
      FROM i
      GROUP BY user_id, sess
      ORDER BY user_id, s_start""",

    // Row-level gaps-and-islands with the SAME break rule as
    // q_stream_session (gap >= 30 min opens a session); event_id
    // breaks timestamp ties so the order is total on both engines.
    "q_sessionize" -> """
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events),
      m AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, event_id,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM m
      ORDER BY user_id, event_id""",

    // q_sessionize's gaps-and-islands CTE + per-session STRING_AGG in
    // the same total (ts, event_id) order; span truncates to whole
    // seconds exactly like Spark's micros-div
    "q_session_transcript" -> """
      WITH e AS (SELECT user_id, event_id, event_type,
                        CAST(ts AS TIMESTAMP) AS ts
                 FROM events),
      m AS (
        SELECT user_id, event_id, event_type, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      i AS (
        SELECT user_id, event_id, event_type, ts,
               CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM m)
      SELECT user_id, session_no,
             STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS transcript,
             COUNT(*) AS n_events,
             CAST(FLOOR(EPOCH(MAX(ts) - MIN(ts))) AS BIGINT) AS span_sec
      FROM i
      GROUP BY user_id, session_no
      ORDER BY user_id, session_no""",

    // q_sessionize's gaps-and-islands CTE, LEAD steps within
    // (user, session) in the same total order; || NULL-propagation
    // drops incomplete windows exactly like the Spark guard.
    "q_top_paths" -> """
      WITH e AS (SELECT user_id, event_id, event_type,
                        CAST(ts AS TIMESTAMP) AS ts
                 FROM events),
      m AS (
        SELECT user_id, event_id, event_type, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id, event_id, event_type, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
        FROM m),
      p AS (
        SELECT event_type || '>' || LEAD(event_type, 1) OVER w2
               || '>' || LEAD(event_type, 2) OVER w2 AS path
        FROM s
        WINDOW w2 AS (PARTITION BY user_id, session_no
                      ORDER BY ts, event_id)),
      c AS (SELECT path, COUNT(*)::BIGINT AS n
            FROM p WHERE path IS NOT NULL GROUP BY path)
      SELECT path, n
      FROM (SELECT path, n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, path ASC) AS rn
            FROM c)
      WHERE rn <= 10
      ORDER BY n DESC, path""",
  )
}
