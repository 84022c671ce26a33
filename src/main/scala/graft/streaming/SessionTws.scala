package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One closed event-time session: q200's output row. */
final case class SessionProfile(
    user_id: Long,
    session_start: Timestamp,
    n_events: Long,
    n_types: Long,
    sum_value: Double)

/** Event-time sessionization on Spark 4's `transformWithState` — the
  * arbitrary-state API that succeeds flatMapGroupsWithState: typed
  * per-key state plus EVENT-TIME TIMERS. Sessions close ONLY when the
  * watermark passes `last event + gap` (never at input time), so a
  * late-but-admissible row arriving in a later micro-batch still merges
  * into — or bridges — the open sessions it belongs to, and the emitted
  * rows equal the batch gaps-and-islands replay (q200_session_profiles)
  * on any admissible arrival order. sum_value accumulates through
  * scale-6 BigDecimal exactly like the replay's DECIMAL(18,6) sum
  * (order-independent, engine-exact).
  *
  * Scale posture: state is the LIST of a key's OPEN sessions (closed
  * ones leave state the moment their timer fires), shuffled once on
  * user_id; timers evict, so state size tracks active users, never
  * history. Requires the RocksDB state store provider
  * (transformWithState's backing store; rocksdbjni ships with Spark).
  */
object SessionTws {

  // one open session: (startMs, lastMs, nEvents, sumValue6dp, distinct types)
  private type Sess = (Long, Long, Long, BigDecimal, Seq[String])

  final class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Timestamp, String, Double), SessionProfile] {

    @transient private var state: ListState[Sess] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getListState[Sess]("sessions",
        Encoders.product[Sess], TTLConfig.NONE)

    private def profile(key: Long, s: Sess): SessionProfile =
      SessionProfile(key, new Timestamp(s._1), s._3, s._5.size.toLong, s._4.toDouble)

    // the replay's DECIMAL(18,6) term: round each value to 6 dp, sum exactly
    private def dec6(v: Double): BigDecimal =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)

    private def mergeRow(sessions: Vector[Sess], ms: Long, typ: String,
        v: Double): Vector[Sess] = {
      // insert as a unit session, then coalesce neighbors within gap —
      // handles extension, out-of-order fill-in, AND bridging two
      // previously separate sessions with one late row
      val unit: Sess = (ms, ms, 1L, dec6(v), Seq(typ))
      val sorted = (sessions :+ unit).sortBy(s => (s._1, s._2))
      sorted.foldLeft(Vector.empty[Sess]) { (acc, s) =>
        acc.lastOption match {
          case Some(p) if s._1 < p._2 + gapMs =>
            acc.init :+ ((p._1, math.max(p._2, s._2), p._3 + s._3, p._4 + s._4,
              p._5 ++ s._5.filterNot(p._5.contains)))
          case _ => acc :+ s
        }
      }
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Timestamp, String, Double)],
        timers: TimerValues): Iterator[SessionProfile] = {
      var sessions = state.get().toVector
      val before = sessions.map(s => s._2 + gapMs).toSet
      rows.toSeq.sortBy(r => (r._2.getTime, r._3)).foreach { case (_, ts, typ, v) =>
        sessions = mergeRow(sessions, ts.getTime, typ, v)
      }
      state.put(sessions.toArray)
      // one close-timer per open session; drop timers whose session moved
      val after = sessions.map(s => s._2 + gapMs).toSet
      (before -- after).foreach(getHandle.deleteTimer)
      (after -- before).foreach(getHandle.registerTimer)
      Iterator.empty // emission happens ONLY when the watermark closes a session
    }

    override def handleExpiredTimer(
        key: Long,
        timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionProfile] = {
      val wm = math.max(info.getExpiryTimeInMs, timers.getCurrentWatermarkInMs)
      val (closed, open) = state.get().toVector.partition(s => s._2 + gapMs <= wm)
      if (open.isEmpty) state.clear() else state.put(open.toArray)
      closed.sortBy(_._1).iterator.map(profile(key, _))
    }
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
