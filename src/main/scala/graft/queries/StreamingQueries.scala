package graft.queries

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

    // ───── q44: session windows per user ─────────────────────────────────
    // Gap-based session merging isn't directly expressible in DuckDB SQL
    // without recursive windowing → rows-only driver check; StreamingSpec
    // value-checks the session boundaries against a hand-computed oracle.
    QueryDef.unoracled("q44_event_sessions") { (s, dir) =>
      EventsStreaming.sessionized(t(s, dir, "events"))
        .filter(col("user_id") < 10)
        .orderBy("user_id", "session_start")
    })
}
