package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}
import graft.functions.Exact._

/** Event-time windowing (SURVEY.md §2.8 Q11), computed in BATCH mode so
  * DuckDB can oracle it — the same `window`/`session_window` expressions
  * run unchanged under Structured Streaming (see graft.streaming, which
  * asserts streaming ≡ batch on these exact queries).
  *
  * Spark's `window()` aligns to the epoch; the sliding oracle
  * materializes the same epoch-aligned 15-minute grid with
  * generate_series. Session windows follow Spark semantics: a session
  * ends gap after its last event (end = max(ts) + gap).
  */
object EventWindows {

  /** Q20 — tumbling 1-hour windows per event type. */
  val q20: Q = Q(
    "q20_window_tumbling",
    run = { (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("val_sum"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("event_type"), col("n"), col("val_sum"))
    },
    oracle = Some("""
      WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
      SELECT date_trunc('hour', ts) AS w_start,
        date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
        event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS val_sum
      FROM e GROUP BY 1, 2, 3"""))

  /** Q21 — sliding 1-hour windows every 15 minutes: each event lands in 4
    * windows; only windows containing events are emitted (groupBy
    * semantics), which the oracle reproduces via an epoch-aligned grid
    * join. */
  val q21: Q = Q(
    "q21_window_sliding",
    run = { (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("val_sum"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("event_type"), col("n"), col("val_sum"))
    },
    oracle = Some("""
      WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      -- grid bounds derived from the data (not hard-coded): earliest window
      -- containing min(ts) starts 45 min before its 15-min bucket; the
      -- bucket origin is pinned to the epoch explicitly so the grid matches
      -- Spark's epoch-aligned window() for ANY slide, not just slides that
      -- happen to divide DuckDB's default 2000-01-03 origin evenly
      ws AS (SELECT unnest(generate_series(
               (SELECT time_bucket(INTERVAL 15 MINUTE, min(ts), TIMESTAMP '1970-01-01 00:00:00') - INTERVAL 45 MINUTE FROM e),
               (SELECT time_bucket(INTERVAL 15 MINUTE, max(ts), TIMESTAMP '1970-01-01 00:00:00') FROM e),
               INTERVAL 15 MINUTE)) AS w_start)
      SELECT ws.w_start, ws.w_start + INTERVAL 1 HOUR AS w_end,
        event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS val_sum
      FROM e JOIN ws ON e.ts >= ws.w_start AND e.ts < ws.w_start + INTERVAL 1 HOUR
      GROUP BY 1, 2, 3"""))

  /** Q22 — session windows (30-minute gap) per user; oracle is the classic
    * gaps-and-islands construction. Spark MERGES an event at exactly
    * prev_ts + gap into the session (inclusive boundary — verified
    * empirically in ScaleSpec), so the oracle's merge condition is `<=`. */
  val q22: Q = Q(
    "q22_window_session",
    run = { (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("val_sum"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("user_id"), col("n"), col("val_sum"))
    },
    oracle = Some("""
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      m AS (SELECT *, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
            FROM e),
      g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM m)
      SELECT min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end,
        user_id, CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS val_sum
      FROM g GROUP BY user_id, sid"""))

  /** q79 — per-event sessionization: the event-level counterpart of
    * q22's session AGGREGATES — every event gets its user-relative
    * session index (30-minute gap rule) so downstream ops can key on
    * (user, session). Classic gaps-and-islands: lag + boundary flag +
    * running sum, all over ONE (user_id) window shuffle. The gap compare
    * is µs-exact on both sides (unix_micros ≡ epoch_us); ordering
    * carries the event_id tie-break (the fixtures fuzz within-user ts
    * ties). Boundary semantics match q22/Spark session_window: an event
    * at exactly prev + 30 min MERGES (`>` starts a new session, not
    * `>=`). */
  val q79: Q = Q(
    "q79_sessionize",
    run = { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val run = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("new_s")).over(run))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("session_idx"))
    },
    oracle = Some("""
      WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events),
      m AS (SELECT *, CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800 * 1000000 OR lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_s
            FROM e)
      SELECT event_id, user_id, ts,
        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_idx
      FROM m"""))

  /** Core of q99 over any (event_id, user_id, ts, event_type) frame:
    * the q79 gaps-and-islands assignment followed by the session-level
    * rollup — the "session table" a product-analytics warehouse
    * actually stores (duration, size, conversion flag per session).
    * Both the assignment window and the rollup agg key on user_id, so
    * the whole plan is ONE hash shuffle (the q79/q58 posture); the
    * duration is integer µs→s floor-division, hash-portable. */
  def sessionMetrics(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchase_flag"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_ts"), col("end_ts"),
        expr("(unix_micros(end_ts) - unix_micros(start_ts)) div 1000000")
          .as("duration_s"),
        (col("purchase_flag") === 1L).as("converted"))
  }

  /** q99 — session metrics table (rollup of q79's sessionization). */
  val q99: Q = Q(
    "q99_session_metrics",
    run = { (spark, dir) => sessionMetrics(Tables.events(spark, dir)) },
    oracle = Some("""
      WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                   event_type
                 FROM events),
      m AS (SELECT *, CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800 * 1000000 OR lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_s
            FROM e),
      s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_idx
            FROM m)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        CAST(count(*) AS BIGINT) AS n_events,
        min(ts) AS start_ts, max(ts) AS end_ts,
        (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s,
        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
          AS converted
      FROM s GROUP BY user_id, session_idx"""))

  /** Core of q235: purchase↔error PAIRS — each purchase joined to the
    * same user's errors in the strictly-preceding 5 minutes. This is
    * the pair-grain sibling of q36's per-purchase count and the BATCH
    * TWIN of the streaming stream-stream join
    * (`EventStreams.purchaseErrorJoin` — identical key + interval
    * predicate; StreamingSpec proves ROW-SET equality between the two
    * across arrival splits, so the watermark-bounded streaming state
    * provably loses nothing on in-watermark data). Scale shape: one
    * user-keyed equi-join with the interval bound riding it as a
    * post-condition — both sides co-partition on user_id, state ∝
    * per-user events in the window, never a time-only theta join. */
  def purchaseErrorPairs(
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val e = events.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
    p.join(e,
        col("user_id") === col("err_user") &&
          col("err_ts") >= col("ts") - expr("INTERVAL 5 MINUTES") &&
          col("err_ts") < col("ts"))
      .select(col("event_id"), col("user_id"), col("ts").as("ts_us"),
        col("err_id"), col("err_ts").as("err_ts_us"))
  }

  /** q235 — the stream-stream join's batch twin, hash-gated (the
    * round-13/14 verdicts' missing registry half of the streaming
    * interval join). */
  val q235: Q = Q(
    "q235_stream_join_twin",
    run = { (spark, dir) => purchaseErrorPairs(Tables.events(spark, dir)) },
    oracle = Some("""
      WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                    event_type FROM events),
      p AS (SELECT event_id, user_id, ts FROM ev
            WHERE event_type = 'purchase'),
      e AS (SELECT event_id AS err_id, user_id AS err_user, ts AS err_ts
            FROM ev WHERE event_type = 'error')
      SELECT p.event_id, p.user_id, p.ts AS ts_us, e.err_id,
        e.err_ts AS err_ts_us
      FROM p JOIN e ON p.user_id = e.err_user
        AND e.err_ts >= p.ts - INTERVAL 5 MINUTE AND e.err_ts < p.ts"""))

  val all: Seq[Q] = Seq(q20, q21, q22, q79, q99, q235)
}
