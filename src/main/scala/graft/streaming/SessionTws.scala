package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One closed event-time session: q200's output row. */
final case class SessionProfile(
    user_id: Long,
    session_start: Timestamp,
    n_events: Long,
    n_types: Long,
    sum_value: Double)

/** Event-time sessionization on Spark 4's `transformWithState` — the
  * arbitrary-state API that succeeds flatMapGroupsWithState: typed
  * per-key [[org.apache.spark.sql.streaming.ValueState]] plus EVENT-TIME
  * TIMERS, so an idle session closes exactly when the watermark passes
  * `last event + gap` (no processing-time coupling, deterministic under
  * replay). Semantics match the batch gaps-and-islands replay
  * (q200_session_profiles): a row at `ts >= last + gap` starts a new
  * session; sessions carry (start, n_events, n_distinct_types,
  * sum_value).
  *
  * Scale posture: state is one small tuple per LIVE key (types bounded by
  * the event-type vocabulary), shuffled once on user_id; timers evict
  * state the moment the watermark passes, so state size tracks ACTIVE
  * users, never history. Requires the RocksDB state store provider
  * (transformWithState's backing store; rocksdbjni ships with Spark).
  */
object SessionTws {

  // state: (startMs, lastMs, nEvents, sumValue, distinct types in arrival order)
  private type SessState = (Long, Long, Long, Double, Seq[String])

  final class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Timestamp, String, Double), SessionProfile] {

    @transient private var state: org.apache.spark.sql.streaming.ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState]("session",
        Encoders.product[SessState], TTLConfig.NONE)

    private def profile(key: Long, s: SessState): SessionProfile =
      SessionProfile(key, new Timestamp(s._1), s._3, s._5.size.toLong, s._4)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Timestamp, String, Double)],
        timers: TimerValues): Iterator[SessionProfile] = {
      // event-time order within the batch (ties by type for determinism);
      // cross-batch order is enforced by the carried state + watermark
      val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionProfile]
      var cur: Option[SessState] = if (state.exists) Some(state.get) else None
      // the previously registered close-timer is superseded by this batch
      cur.foreach(s => getHandle.deleteTimer(s._2 + gapMs))
      sorted.foreach { case (_, ts, typ, v) =>
        val ms = ts.getTime
        cur match {
          case Some(s) if ms < s._2 + gapMs =>
            cur = Some((math.min(s._1, ms), math.max(s._2, ms), s._3 + 1, s._4 + v,
              if (s._5.contains(typ)) s._5 else s._5 :+ typ))
          case Some(s) => // gap reached inside the batch: close, start fresh
            out += profile(key, s)
            cur = Some((ms, ms, 1L, v, Seq(typ)))
          case None =>
            cur = Some((ms, ms, 1L, v, Seq(typ)))
        }
      }
      cur.foreach { s =>
        state.update(s)
        getHandle.registerTimer(s._2 + gapMs) // close when watermark passes
      }
      out.iterator
    }

    override def handleExpiredTimer(
        key: Long,
        timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionProfile] =
      if (state.exists && info.getExpiryTimeInMs >= state.get._2 + gapMs) {
        val s = state.get
        state.clear()
        Iterator.single(profile(key, s))
      } else Iterator.empty
  }

  /** Streaming session profiles over (event_id, ts, user_id, event_type,
    * value) rows; emits one row per CLOSED session (append mode).
    */
  def sessionProfiles(
      events: DataFrame,
      gapMinutes: Int = 15,
      watermarkDelay: String = "30 minutes"): Dataset[SessionProfile] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_type").cast("string"), col("value").cast("double"))
      .as[(Long, Timestamp, String, Double)]
      .groupByKey(_._1)
      .transformWithState(
        new SessionProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
