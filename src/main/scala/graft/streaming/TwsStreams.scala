package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One keyed spend observation for the running-aggregate processor.
  * Spend is carried in integer cents so cross-batch accumulation is
  * exact (the same integer-contract as every oracled operator). */
case class SpendPoint(user_id: Long, ts: Timestamp, event_id: Long,
                      spend_cents: Long)

/** Epoch-micro conversions shared by the processors — event
  * timestamps carry microseconds, and `Timestamp.getTime`'s millis
  * would silently truncate them out of the ordering/state. */
private[streaming] object EventMicros {
  def usOf(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
  def tsOf(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
}

/** A running per-user emission: state AFTER folding the event. */
case class SpendRunning(user_id: Long, event_id: Long, n_events: Long,
                        total_cents: Long)

/** Running per-user spend on the Spark 4 `transformWithState` API
  * (the arbitrary-state successor to `flatMapGroupsWithState`:
  * typed named-state handles, TTL per state, timers decoupled from
  * state — and RocksDB-backed, so per-key state is spillable instead
  * of executor-heap-bound, which is the 100 TB posture for
  * billions-of-keys state). This processor is the library's reference
  * use of the API; the older twins stay on `flatMapGroupsWithState`
  * deliberately so both state APIs stay exercised.
  *
  * Semantics: per user, fold events in (ts, event_id) order into a
  * (count, total) ValueState and emit the running pair after each
  * event — the streaming twin of the batch cumulative window
  * (`ROWS UNBOUNDED PRECEDING`, same order). Integer arithmetic makes
  * cross-batch replay bit-identical to the batch window. */
class RunningSpendProcessor
    extends StatefulProcessor[Long, SpendPoint, SpendRunning] {

  @transient private var agg: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState[(Long, Long)]("agg",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[SpendPoint],
      timers: TimerValues): Iterator[SpendRunning] = {
    var (n, tot) = if (agg.exists()) agg.get() else (0L, 0L)
    val out = rows.toSeq
      .sortBy(p => (EventMicros.usOf(p.ts), p.event_id)).map { p =>
      n += 1
      tot += p.spend_cents
      SpendRunning(key, p.event_id, n, tot)
    }
    agg.update((n, tot))
    out.iterator
  }
}

/** A closed gap session (end = last event + gap, the native
  * `session_window` convention, so the batch twin compares 1:1). */
case class SessionClosed(user_id: Long, session_start: Timestamp,
                         session_end: Timestamp, ev_ct: Long,
                         cents: Long)

/** Gap-session close via EVENT-TIME TIMERS on `transformWithState` —
  * the API's timer surface (decoupled from state, unlike
  * `GroupStateTimeout`'s one-timeout-per-key): each arriving event
  * extends the open session and re-arms the key's timer at
  * `last + gap`; the timer firing (watermark passed the gap) emits
  * the closed session and clears. A gap INSIDE a batch closes inline
  * — the timer path and the inline path emit identical rows, so
  * which one wins a race is unobservable (both orderings occur in
  * the parity spec's replay). State per key is one (start, last,
  * count, cents) tuple regardless of session length. */
class GapSessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, SpendPoint, SessionClosed] {

  // state carries epoch MICROS: Timestamp.getTime is millis and would
  // silently truncate the micro-precision event times the batch
  // session_window keeps
  @transient private var sess: ValueState[(Long, Long, Long, Long)] = _

  import EventMicros.{usOf, tsOf}

  private val gapUs = gapMs * 1000L

  /** Timer slot for a session: first whole millisecond at or past
    * last + gap (timers are millisecond-granular). */
  private def timerMsFor(lastUs: Long): Long =
    Math.floorDiv(lastUs + gapUs + 999L, 1000L)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long, Long, Long)]("sess",
      Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)

  private def closed(key: Long, s: (Long, Long, Long, Long)) =
    SessionClosed(key, tsOf(s._1), tsOf(s._2 + gapUs), s._3, s._4)

  override def handleInputRows(key: Long, rows: Iterator[SpendPoint],
      timers: TimerValues): Iterator[SessionClosed] = {
    val out = scala.collection.mutable.ArrayBuffer[SessionClosed]()
    var cur = if (sess.exists()) Option(sess.get()) else None
    rows.toSeq.sortBy(p => (usOf(p.ts), p.event_id)).foreach { p =>
      val t = usOf(p.ts)
      cur match {
        case Some(s) if t - s._2 >= gapUs =>
          out += closed(key, s) // gap inside the stream: close inline
          cur = Some((t, t, 1L, p.spend_cents))
        case Some(s) =>
          cur = Some((s._1, math.max(s._2, t), s._3 + 1,
            s._4 + p.spend_cents))
        case None =>
          cur = Some((t, t, 1L, p.spend_cents))
      }
    }
    cur.foreach { s =>
      sess.update(s)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(timerMsFor(s._2)) // re-arm at last + gap
    }
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[SessionClosed] = {
    if (!sess.exists()) Iterator.empty
    else {
      val s = sess.get()
      // a stale timer (re-armed later) must not close a live session
      if (expired.getExpiryTimeInMs < timerMsFor(s._2)) Iterator.empty
      else {
        sess.clear()
        Iterator.single(closed(key, s))
      }
    }
  }
}

object TwsStreams {

  /** Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` →
    * `...state.RocksDBStateStoreProvider`) — `transformWithState`
    * does not run on the default HDFS-backed store. */
  def runningSpendStream(points: Dataset[SpendPoint]): Dataset[SpendRunning] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.user_id)
      .transformWithState(new RunningSpendProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Event-time timer sessions: `points` must carry a watermark on
    * `ts` (EventTime mode requires it); RocksDB store as above. */
  def gapSessionStream(points: Dataset[SpendPoint],
                       gapMs: Long = 30L * 60 * 1000): Dataset[SessionClosed] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.user_id)
      .transformWithState(new GapSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
