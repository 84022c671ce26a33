package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming transforms over the `events` stream (SURVEY §2b
  * "streaming" row / §7 M7). The reference delegates all stream processing
  * to the engine (reference: src/catalog/mod.rs:359-361 — "A compute engine
  * like Spark or Flink"); this is the Flink-shaped half of that sentence,
  * expressed Spark-first.
  *
  * Each transform takes ANY events DataFrame — batch or streaming — and
  * returns the same logical plan, so the exact code that runs in the
  * micro-batch pipeline is batch-replayable for the DuckDB oracle
  * (q37/q43/q44 in StreamingQueries run these on the batch table).
  *
  * Scale posture: all state is keyed and watermark-bounded — tumbling
  * windows keep one row of state per (window, event_type); dedup keeps one
  * key per event_id inside the watermark horizon and drops it as the
  * watermark passes; session windows merge per user_id. No unbounded state,
  * no global ordering requirement, shuffles only on the group keys.
  */
object EventsStreaming {

  /** Tumbling-window counts/sums per event type. Watermark bounds state and
    * admits late data up to `watermarkDelay`; in append mode a window is
    * emitted exactly once, when the watermark passes its end.
    */
  def tumblingCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** Stateful exactly-once dedup on event_id within the watermark horizon —
    * the streaming twin of the batch exact-dedup operator (q27). State per
    * key is dropped once the watermark guarantees no more duplicates can
    * arrive (dropDuplicatesWithinWatermark, not the unbounded-state
    * dropDuplicates).
    */
  def dedupped(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("event_id")
    else
      // batch replay: the whole input is present, so plain dropDuplicates is
      // the exact batch semantics of watermark-bounded streaming dedup
      // (dropDuplicatesWithinWatermark is streaming-only in Spark).
      events.dropDuplicates("event_id")

  /** Stream-stream interval join: each purchase picks up the same user's
    * clicks from the preceding `horizon` (click attribution). In streaming
    * mode this is Spark's watermarked stream-stream inner join — BOTH sides
    * carry a watermark and the join condition bounds event time on both
    * sides, so the state store keeps only `horizon + watermarkDelay` of
    * either stream per key and evicts rows as the watermark passes: bounded
    * state on unbounded streams, the property a 100 TB/day clickstream
    * needs. In batch replay the same plan is a hash equi-join on user_id
    * with the time range as a post-join filter. Matches emit as soon as
    * both rows are present (inner join does not wait for the watermark).
    */
  def attributedClicks(
      purchases: DataFrame,
      clicks: DataFrame,
      horizon: String = "10 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", watermarkDelay)
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizon") &&
          col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"),
        col("purchase_value").cast("double").as("purchase_value"))
  }

  /** Per-user session windows (gap-based): rows closer than `gap` merge into
    * one session. Streaming uses the same expression via session_window.
    */
  def sessionized(
      events: DataFrame,
      gap: String = "15 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Streaming per-source token-quota enforcement — the CUSTOM-STATE API
    * (`KeyValueGroupedDataset.flatMapGroupsWithState`), for semantics no
    * built-in aggregate expresses: each source's cumulative accepted-token
    * count lives in managed per-key state across micro-batches, and a
    * document is emitted only while its source is still under `quotaTokens`.
    * This is the streaming half of corpus mixture control (batch twin:
    * q81's quota histogram): cap every domain's contribution AS DOCUMENTS
    * ARRIVE, no global sort, no second pass.
    *
    * Scale posture: state is ONE long per source key, shuffled once on
    * source; the iterator is consumed lazily per group within a batch, so
    * nothing buffers beyond a group's accepted rows. State never times out
    * — a quota is a permanent budget, and the keyspace (domains) is small
    * by construction; for unbounded keyspaces add a TTL timeout.
    *
    * Input columns: (source STRING, doc_id BIGINT, tokens BIGINT); output =
    * the accepted subset, same columns.
    */
  /** Streaming sequential-pattern detection — the state-machine shape
    * engines with MATCH_RECOGNIZE run on streams, here as ONE
    * `flatMapGroupsWithState` per user: advance view → click → purchase
    * strictly in event-time order and emit a row at each advance (batch
    * twin: q131's cascaded first-occurrence joins). Per-batch rows sort
    * within the group (bounded by a user's events per micro-batch);
    * across batches the state's last-advance timestamp enforces order, so
    * a late event that predates the current stage is ignored rather than
    * rewinding — the same no-retraction discipline as watermarked aggs.
    *
    * Scale posture: state is (stage, micros) per user — two longs —
    * shuffled once on user_id; emission is append-only.
    *
    * Input columns: (user_id BIGINT, ts TIMESTAMP, event_type STRING);
    * output (user_id, step, ts) with step ∈ view|click|purchase.
    */
  def funnelStages(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val steps = Vector("view", "click", "purchase")
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    events.selectExpr("user_id", "ts", "event_type")
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Long), (Long, String, java.sql.Timestamp)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, String)],
         state: GroupState[(Int, Long)]) =>
          var (stage, lastUs) = state.getOption.getOrElse((0, Long.MinValue))
          val out = collection.mutable.ArrayBuffer[(Long, String, java.sql.Timestamp)]()
          for ((_, ts, et) <- rows.toSeq.sortBy(r => micros(r._2))) {
            if (stage < steps.length && et == steps(stage) && micros(ts) > lastUs) {
              out += ((uid, steps(stage), ts))
              stage += 1
              lastUs = micros(ts)
            }
          }
          state.update((stage, lastUs))
          out.iterator
      }
      .toDF("user_id", "step", "ts")
  }

  /** Streaming Markov-transition extraction — q166's lead() window shape
    * is not streamable (lead needs the whole partition); the streaming
    * form carries each user's LAST event (type, micros, event_id) in
    * state and emits one (prev, next) pair per consecutive step. Rows
    * sort in event-time order within each micro-batch; across batches
    * the carried state stitches the boundary pair, so the lifetime
    * output equals the batch lead() exactly when event time is
    * monotone per batch (the same per-batch-order discipline as
    * [[funnelStages]]). Batch mode (one "batch" = the whole table)
    * reproduces q166 verbatim — the q169 QueryDef gates that against
    * q166's own oracle SQL.
    *
    * Scale posture: state is three scalars per user, one shuffle on
    * user_id, append-only emission.
    */
  def transitions(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    events.selectExpr("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(String, Long, Long), (String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[(String, Long, Long)]) =>
          var prev = state.getOption.orNull
          val out = collection.mutable.ArrayBuffer[(String, String)]()
          for ((_, ts, eid, et) <- rows.toSeq.sortBy(r => (micros(r._2), r._3))) {
            if (prev != null) out += ((prev._1, et))
            prev = (et, micros(ts), eid)
          }
          if (prev != null) state.update(prev)
          out.iterator
      }
      .toDF("event_type", "nxt")
  }

  def quotaSampled(docs: DataFrame, quotaTokens: Long): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    docs.as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long, Long)], state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          // materialize the accepted list BEFORE updating state: the output
          // iterator is consumed after this function returns
          val accepted = rows.filter { case (_, _, tk) =>
            if (used + tk <= quotaTokens) { used += tk; true } else false
          }.toList
          state.update(used)
          accepted.iterator
      }
      .toDF("source", "doc_id", "tokens")
  }
}
