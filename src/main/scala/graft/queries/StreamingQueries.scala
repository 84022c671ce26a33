package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.streaming.EventsStreaming

/** Batch replays of the streaming transforms (SURVEY §2b "streaming" row):
  * the exact same EventsStreaming plan runs here over the batch `events`
  * table so the DuckDB oracle can value-check it; StreamingSpec runs the
  * same transforms through readStream + the exactly-once lake sink.
  */
object StreamingQueries {

  val defs: Seq[QueryDef] = Seq(

    // ───── q37: tumbling windows (watermarked in stream mode) ────────────
    // Spark's window('1 hour') and DuckDB's time_bucket both align to the
    // unix epoch in UTC, so window_start values match exactly.
    QueryDef.df(
      "q37_event_tumbling",
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      EventsStreaming.tumblingCounts(t(s, dir, "events"))
        // surface as NTZ: DuckDB's time_bucket is timezone-naive; the session
        // runs UTC so the cast is value-preserving
        .withColumn("window_start", col("window_start").cast("timestamp_ntz"))
        .orderBy("window_start", "event_type")
    },

    // ───── q43: stateful dedup, batch replay ─────────────────────────────
    // The streaming pipeline dedups on event_id within the watermark; the
    // batch replay proves the same keys survive (events are unique by
    // event_id in the testdata, so this doubles as an identity check the
    // oracle can pin).
    QueryDef.df(
      "q43_event_dedup",
      """SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_unique
        |FROM events""".stripMargin) { (s, dir) =>
      EventsStreaming.dedupped(t(s, dir, "events"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_unique"))
    },

    // ───── q46: as-of join (latest prior purchase for each click) ────────
    // The temporal-join operator Spark lacks natively, composed from
    // built-ins the scalable way: tag both streams, ONE shuffle on the key,
    // per-partition sort, and last_value(ignoreNulls) over a running frame
    // carries the most recent purchase forward to each click. No join
    // explosion, no range cross-product — O(events) rows through one
    // exchange, the plan a 100 TB tick-data as-of needs. Oracle: DuckDB's
    // native ASOF LEFT JOIN (q.ts <= t.ts inclusive — matched by sorting
    // purchases before clicks at equal ts).
    QueryDef.df(
      "q46_asof_join",
      """SELECT t.event_id, t.user_id, CAST(t.value AS DOUBLE) AS click_value,
        |       q.event_id AS purchase_event_id, CAST(q.value AS DOUBLE) AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') t
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') q
        |  ON t.user_id = q.user_id AND q.ts <= t.ts
        |ORDER BY t.event_id""".stripMargin) { (s, dir) =>
      val tagged = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("is_click", when(col("event_type") === "click", 1).otherwise(0))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_click")) // purchase first at equal ts => inclusive <=
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("purchase_event_id",
          last(when(col("is_click") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("purchase_value",
          last(when(col("is_click") === 0, col("value")), ignoreNulls = true).over(w))
        .filter(col("is_click") === 1)
        .select(col("event_id"), col("user_id"),
          col("value").cast("double").as("click_value"),
          col("purchase_event_id"), col("purchase_value").cast("double"))
        .orderBy("event_id")
    },

    // ───── q47: range join (clicks within 5 min before each error) ───────
    // The interval-join operator, in the shape that scales: bucket both
    // sides into 5-minute bins, EQUI-join on (user, bin) with the error
    // side probing its own and the previous bin, then apply the exact
    // range predicate inside the join. Catalyst gets a shuffled hash join
    // on (user_id, bin) — never the BroadcastNestedLoopJoin a raw
    // inequality join degenerates to. A click matches exactly one probe
    // bin, so counts need no dedup; LEFT join keeps zero-click errors.
    QueryDef.df(
      "q47_range_join",
      """SELECT e.event_id, CAST(count(c.event_id) AS BIGINT) AS clicks_before
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND c.ts >= e.ts - INTERVAL 5 MINUTE AND c.ts < e.ts
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val bin = (c: org.apache.spark.sql.Column) => floor(unix_micros(c) / (300L * 1000000L))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts").as("ets"))
        .withColumn("probe_bin", explode(array(bin(col("ets")) - 1, bin(col("ets")))))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("cts"),
          col("event_id").as("c_event_id"), bin(col("ts")).as("c_bin"))
      errors
        .join(clicks,
          col("user_id") === col("c_user") && col("probe_bin") === col("c_bin")
            && col("cts") >= col("ets") - expr("INTERVAL 5 MINUTES")
            && col("cts") < col("ets"),
          "left")
        .groupBy("event_id")
        .agg(count(col("c_event_id")).as("clicks_before"))
        .orderBy("event_id")
    },

    // ───── q44: session windows per user ─────────────────────────────────
    // Spark's session_window merges an event into the current session while
    // ts < (previous max ts + gap); per user with ts ascending that is the
    // classic gaps-and-islands recurrence, which IS ANSI SQL: mark a new
    // session when ts - lag(ts) >= gap, number sessions with a running sum,
    // aggregate. StreamingSpec additionally value-checks boundaries against
    // a hand-computed oracle.
    QueryDef.df(
      "q44_event_sessions",
      """WITH e AS (SELECT user_id, ts, value FROM events WHERE user_id < 10),
        |m AS (SELECT user_id, ts, value,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |             OR ts - lag(ts) OVER w >= INTERVAL 15 MINUTE THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, value,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 15 MINUTE AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      EventsStreaming.sessionized(t(s, dir, "events"))
        .filter(col("user_id") < 10)
        // NTZ surface: DuckDB timestamps are naive; the session runs UTC
        .withColumn("session_start", col("session_start").cast("timestamp_ntz"))
        .withColumn("session_end", col("session_end").cast("timestamp_ntz"))
        .orderBy("user_id", "session_start")
    },

    // ───── q200: session profiles — transformWithState's batch replay ───
    // The Spark-4-native arbitrary-state API (`transformWithState`:
    // typed ValueState + EVENT-TIME TIMERS, the successor to
    // flatMapGroupsWithState) runs these exact semantics as a stream in
    // graft.streaming.SessionTws — an idle session closes when the
    // watermark passes last+gap, state evicts on the timer, so state
    // tracks ACTIVE users only. StreamingSpec proves the streaming path
    // emits exactly these rows; here the batch gaps-and-islands replay
    // (one shuffle on user_id for the windows, then the per-(user,
    // session) agg) rides the DuckDB hash gate. vs q44: all users, plus
    // the distinct-type census the TWS state tracks.
    QueryDef.df(
      "q200_session_profiles",
      """WITH m AS (SELECT user_id, ts, event_id, event_type, value,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |             OR ts - lag(ts) OVER w >= INTERVAL 15 MINUTE THEN 1 ELSE 0 END AS brk
        |      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, event_type, value,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("brk", when(lag("ts", 1).over(w).isNull ||
          col("ts") >= lag("ts", 1).over(w) + expr("INTERVAL 15 MINUTES"), 1).otherwise(0))
        .withColumn("sid", sum("brk").over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("ts").cast("timestamp_ntz").as("session_start"),
          count(lit(1)).as("n_events"),
          countDistinct("event_type").as("n_types"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select("user_id", "session_start", "n_events", "n_types", "sum_value")
        .orderBy("user_id", "session_start")
    },

    // ───── q78: stream-stream interval join (click attribution) ─────────
    // The batch replay of EventsStreaming.attributedClicks — the
    // watermarked stream-stream join whose true-streaming semantics
    // (bounded state, watermark eviction, late-drop) StreamingSpec pins
    // with MemoryStreams. Here the same plan runs over the batch events
    // table so DuckDB can hash-check the join itself.
    QueryDef.df(
      "q78_stream_interval_join",
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |  CAST(p.value AS DOUBLE) AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        |  AND c.ts >= p.ts - INTERVAL 180 MINUTE AND c.ts <= p.ts
        |ORDER BY purchase_id, click_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      EventsStreaming.attributedClicks(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"),
          horizon = "180 minutes")
        .orderBy("purchase_id", "click_id")
    },

    // ───── q70: resample + gap-fill (the time-series densification op) ───
    // Hourly per-user averages forward-filled onto a dense per-user hour
    // grid — the resample/ffill primitive every metrics pipeline needs and
    // Spark has no single operator for. Composed the scalable way: raw
    // events reduce through a partial+final aggregation (map-side combine
    // shrinks them BEFORE their only shuffle), the per-user grid comes from
    // a sequence() explode of hourly bounds (rows ∝ output, never events ×
    // grid) and BROADCASTS into the join, and last(ignoreNulls) over a
    // running frame fills the gaps — after the hourly points exist, the
    // only data movement is the window's user_id exchange of grid-sized
    // rows. The decimal-sum discipline keeps the hourly averages
    // bit-identical to the oracle.
    QueryDef.df(
      "q70_resample_ffill",
      """WITH obs AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS v
        |  FROM events WHERE user_id < 5 GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(min(hour), max(hour),
        |    INTERVAL 1 HOUR)) AS hour
        |  FROM obs GROUP BY user_id),
        |joined AS (
        |  SELECT g.user_id, g.hour, o.v
        |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.hour = o.hour)
        |SELECT user_id, hour,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
        |FROM joined ORDER BY user_id, hour""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val obs = t(s, dir, "events").filter(col("user_id") < 5)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast("decimal(18,6)")).cast("double") / count(lit(1))).as("v"))
      val grid = obs.groupBy("user_id")
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
      val w = Window.partitionBy("user_id").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour").cast("timestamp_ntz").as("hour"),
          last(col("v"), ignoreNulls = true).over(w).as("v_fill"))
        .orderBy("user_id", "hour")
    },

    // ───── q169: streaming-state transition counts (fMGWS path) ──────────
    // q166 states the Markov transition matrix with lead() — not
    // streamable. This runs the SAME semantics through the custom
    // streaming-state operator ([[EventsStreaming.transitions]],
    // flatMapGroupsWithState carrying each user's last event), batch-mode
    // here so q166's own oracle SQL hash-gates the custom-state path;
    // StreamingSpec drives the identical transform through readStream
    // with cross-batch boundary stitching.
    QueryDef.df(
      "q169_stream_transitions",
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events)
        |SELECT event_type, nxt, CAST(count(*) AS BIGINT) AS n
        |FROM s WHERE nxt IS NOT NULL
        |GROUP BY event_type, nxt ORDER BY event_type, nxt""".stripMargin) { (s, dir) =>
      EventsStreaming.transitions(t(s, dir, "events"))
        .groupBy("event_type", "nxt")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "nxt")
    })
}
