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

/** A running clamped balance emission: state AFTER the event. */
case class BalanceRunning(user_id: Long, event_id: Long,
                          balance_cents: Long, floor_clamps: Long,
                          cap_clamps: Long)

/** Clamped (saturating) per-user running balance on
  * `transformWithState` — the streaming leg of the batch
  * `TimeSeries.clampedInventory` fold: each event deposits its cents
  * and a constant drain is charged, the balance saturating at
  * [0, cap]. The clamp makes the recurrence non-windowable (each
  * prefix depends on the CLAMPED previous prefix), so streaming state
  * is the natural home: one (balance, floorCt, capCt) ValueState per
  * key regardless of history length, RocksDB-spillable — the
  * billions-of-keys posture. Integer arithmetic end to end, so
  * cross-batch replay is bit-identical to the batch fold and to the
  * oracle's per-key recursive CTE. */
class ClampedBalanceProcessor(drainCents: Long, capCents: Long)
    extends StatefulProcessor[Long, SpendPoint, BalanceRunning] {

  @transient private var bal: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bal = getHandle.getValueState[(Long, Long, Long)]("bal",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[SpendPoint],
      timers: TimerValues): Iterator[BalanceRunning] = {
    var (b, lo, hi) = if (bal.exists()) bal.get() else (0L, 0L, 0L)
    val out = rows.toSeq
      .sortBy(p => (EventMicros.usOf(p.ts), p.event_id)).map { p =>
      val raw = b + p.spend_cents - drainCents
      if (raw < 0) lo += 1
      if (raw > capCents) hi += 1
      b = math.max(0L, math.min(capCents, raw))
      BalanceRunning(key, p.event_id, b, lo, hi)
    }
    bal.update((b, lo, hi))
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

/** A typed spend observation carrying its event type (input of the
  * map/list-state processor). */
case class TypedSpendPoint(user_id: Long, ts: Timestamp, event_id: Long,
                           event_type: String, spend_cents: Long)

/** Per-event emission of [[MapListSpendProcessor]]: the per-type
  * running total (MapState) and the trailing-3-event sum (ListState)
  * AFTER folding the event. */
case class SpendEnriched(user_id: Long, event_id: Long, event_type: String,
                         type_total_cents: Long, last3_sum_cents: Long)

/** Exercises the remaining two `transformWithState` primitives the
  * running/session processors don't touch — `MapState` and
  * `ListState` — on semantics with an exact batch twin:
  *
  *  - MapState[event_type → total]: per-user per-type running spend
  *    (batch: cumulative window partitioned by (user, type));
  *  - ListState[last ≤2 cents]: trailing 3-event sum including the
  *    current event (batch: `ROWS BETWEEN 2 PRECEDING AND CURRENT
  *    ROW`) — the list holds only the 2 most recent predecessors, so
  *    state stays O(1) per key no matter the stream length.
  *
  * Integer cents keep cross-batch replay bit-identical to the batch
  * windows (the same contract as [[RunningSpendProcessor]]). */
class MapListSpendProcessor
    extends StatefulProcessor[Long, TypedSpendPoint, SpendEnriched] {

  @transient private var byType: MapState[String, Long] = _
  @transient private var recent: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    byType = getHandle.getMapState[String, Long]("bytype",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    recent = getHandle.getListState[Long]("recent",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[TypedSpendPoint],
      timers: TimerValues): Iterator[SpendEnriched] = {
    var tail = recent.get().toList // ≤2 predecessors, oldest first
    val out = rows.toSeq
      .sortBy(p => (EventMicros.usOf(p.ts), p.event_id)).map { p =>
      val t = (if (byType.containsKey(p.event_type))
        byType.getValue(p.event_type) else 0L) + p.spend_cents
      byType.updateValue(p.event_type, t)
      val win = (tail :+ p.spend_cents).takeRight(3)
      tail = win.takeRight(2)
      SpendEnriched(key, p.event_id, p.event_type, t, win.sum)
    }
    recent.put(tail.toArray)
    out.iterator
  }
}

object TwsStreams {

  /** Run `body` with the RocksDB state store provider set
    * (`transformWithState` does not run on the default HDFS-backed
    * store) AND the shuffle-partition count bounded to
    * [[ReplayStatePartitions]], restoring both after. The partition
    * bound is a HARNESS constant, not operator tuning: each replay
    * micro-batch opens/commits one RocksDB instance per state
    * partition, so 32 partitions over a few hundred sampled keys is
    * ~2 s of pure store fixed cost per batch. 8 partitions carry the
    * same keys (state is hash-distributed per key; results are
    * partition-count-independent) at a quarter of the fixed cost.
    * The production entries inherit whatever the deployment sets —
    * this conf scope ends before the replay's result frame is even
    * read. */
  private val ReplayStatePartitions = "8"
  private def withRocksDb[T](spark: org.apache.spark.sql.SparkSession)
                            (body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val pkey = "spark.sql.shuffle.partitions"
    val prior = spark.conf.getOption(key)
    val priorParts = spark.conf.getOption(pkey)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    spark.conf.set(pkey, ReplayStatePartitions)
    try body finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      priorParts match {
        case Some(v) => spark.conf.set(pkey, v)
        case None => spark.conf.unset(pkey)
      }
    }
  }

  /** Deterministic key-sample modulus for the REPLAY HARNESSES below:
    * MemoryStream keeps every added row on the driver, so an unbounded
    * replay would be the suite's first driver OOM as the gate SF
    * grows. Only users with `user_id % SampleMod == 0` are replayed —
    * exact semantics over the sampled keys (state is per-key, so
    * dropping whole keys changes nothing for the kept ones), and the
    * oracles apply the identical predicate. The production entries
    * (`runningSpendStream`/`gapSessionStream`/`mapListSpendStream`)
    * are full readStream transforms with no sampling. */
  val SampleMod = 4L

  /** Events table → time-ordered SpendPoints (integer cents),
    * key-sampled by [[SampleMod]] — the driver-bounded harness feed. */
  private def spendPoints(events: org.apache.spark.sql.DataFrame)
      : Array[SpendPoint] = {
    import org.apache.spark.sql.functions.{col, lit, pmod, round}
    import events.sparkSession.implicits._
    events.filter(pmod(col("user_id"), lit(SampleMod)) === 0)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("bigint").as("spend_cents"))
      .as[SpendPoint].collect()
      .sortBy(p => (EventMicros.usOf(p.ts), p.event_id))
  }

  /** Synchronous MemoryStream replay of [[RunningSpendProcessor]] over
    * the events table, fed in `batches` time-ordered chunks so
    * cross-batch state accumulation is exercised — the driver-oracle
    * harness for the `transformWithState` value-state surface (the
    * oracle is the batch cumulative window). The MemoryStream + driver
    * collect IS the harness, not the operator: the production entry is
    * `runningSpendStream` over a readStream source. */
  def runningSpendReplay(spark: org.apache.spark.sql.SparkSession,
                         events: org.apache.spark.sql.DataFrame,
                         batches: Int = 3): org.apache.spark.sql.DataFrame =
    withRocksDb(spark) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.col
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val pts = spendPoints(events)
      val name = "tws_spend_replay_" +
        java.util.UUID.randomUUID().toString.take(8)
      val ms = MemoryStream[SpendPoint]
      val q = runningSpendStream(ms.toDS()).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      val per = math.max(1, (pts.length + batches - 1) / batches)
      pts.grouped(per).foreach { b =>
        ms.addData(b.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
      spark.table(name)
        .select(col("user_id"), col("event_id"), col("n_events"),
          col("total_cents"))
        .orderBy("user_id", "event_id")
    }

  /** Synchronous MemoryStream replay of [[GapSessionProcessor]] (the
    * event-time-timer surface): time-ordered chunks, then two
    * far-future sentinel rows so the trailing watermark passes every
    * open session's timer and the timer path (not only the inline
    * close) emits. Oracle: batch gap-session assembly, end = last+gap. */
  def gapSessionReplay(spark: org.apache.spark.sql.SparkSession,
                       events: org.apache.spark.sql.DataFrame,
                       gapMs: Long = 30L * 60 * 1000,
                       batches: Int = 3): org.apache.spark.sql.DataFrame =
    withRocksDb(spark) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.{col, date_format}
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      // phase walls ride the bench artifact (`"walls"`): the replay's
      // fixed costs — source collect, query start (planning + state
      // store provider init), each micro-batch barrier — are the
      // breakdown the at-scale claim rides on, invisible inside the
      // one query timing
      val pts = graft.core.Walls.timed("tws_gap_sessions.source")(
        spendPoints(events))
      require(pts.nonEmpty, "gapSessionReplay: empty events")
      val flush = SpendPoint(-1L,
        EventMicros.tsOf(EventMicros.usOf(pts.last.ts) + 3L * gapMs * 1000L),
        -1L, 0L)
      val name = "tws_session_replay_" +
        java.util.UUID.randomUUID().toString.take(8)
      val ms = MemoryStream[SpendPoint]
      val q = graft.core.Walls.timed("tws_gap_sessions.start")(
        gapSessionStream(
            ms.toDS().withWatermark("ts", "0 seconds"), gapMs).writeStream
          .format("memory").queryName(name).outputMode("append").start())
      val per = math.max(1, (pts.length + batches - 1) / batches)
      pts.grouped(per).zipWithIndex.foreach { case (b, i) =>
        graft.core.Walls.timed(s"tws_gap_sessions.batch$i") {
          ms.addData(b.toSeq: _*); q.processAllAvailable()
        }
      }
      // watermark trails by one batch: the second sentinel batch lets
      // the first one's event time become the watermark, firing timers
      graft.core.Walls.timed("tws_gap_sessions.sentinels") {
        ms.addData(flush); q.processAllAvailable()
        ms.addData(flush.copy(event_id = -2L)); q.processAllAvailable()
      }
      graft.core.Walls.timed("tws_gap_sessions.stop")(q.stop())
      spark.table(name).filter(col("user_id") >= 0)
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_end"),
          col("ev_ct"), col("cents"))
        .orderBy("user_id", "session_start")
    }

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

  /** Clamped-balance processor (RocksDB store as above). */
  def clampedBalanceStream(points: Dataset[SpendPoint],
                           drainCents: Long = 5000L,
                           capCents: Long = 100000L)
      : Dataset[BalanceRunning] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.user_id)
      .transformWithState(new ClampedBalanceProcessor(drainCents, capCents),
        TimeMode.None(), OutputMode.Append())
  }

  /** Synchronous MemoryStream replay of [[ClampedBalanceProcessor]]
    * (same SampleMod-bounded harness contract as
    * [[runningSpendReplay]]): the oracle is the per-key recursive CTE
    * replaying the clamp with the same integer arithmetic. */
  def clampedBalanceReplay(spark: org.apache.spark.sql.SparkSession,
                           events: org.apache.spark.sql.DataFrame,
                           batches: Int = 3): org.apache.spark.sql.DataFrame =
    withRocksDb(spark) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.col
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val pts = spendPoints(events)
      val name = "tws_clamped_replay_" +
        java.util.UUID.randomUUID().toString.take(8)
      val ms = MemoryStream[SpendPoint]
      val q = clampedBalanceStream(ms.toDS()).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      val per = math.max(1, (pts.length + batches - 1) / batches)
      pts.grouped(per).foreach { b =>
        ms.addData(b.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
      spark.table(name)
        .select(col("user_id"), col("event_id"), col("balance_cents"),
          col("floor_clamps"), col("cap_clamps"))
        .orderBy("user_id", "event_id")
    }

  /** MapState + ListState processor (RocksDB store as above). */
  def mapListSpendStream(points: Dataset[TypedSpendPoint])
      : Dataset[SpendEnriched] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.user_id)
      .transformWithState(new MapListSpendProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Synchronous MemoryStream replay of [[MapListSpendProcessor]]
    * (same harness contract as [[runningSpendReplay]]): the oracle is
    * the pair of batch windows — per-(user,type) cumulative sum and
    * per-user trailing-3 sum. */
  def mapListReplay(spark: org.apache.spark.sql.SparkSession,
                    events: org.apache.spark.sql.DataFrame,
                    batches: Int = 3): org.apache.spark.sql.DataFrame =
    withRocksDb(spark) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.{col, lit, pmod, round}
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val pts = events.filter(pmod(col("user_id"), lit(SampleMod)) === 0)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"),
          round(col("value") * 100).cast("bigint").as("spend_cents"))
        .as[TypedSpendPoint].collect()
        .sortBy(p => (EventMicros.usOf(p.ts), p.event_id))
      val name = "tws_maplist_replay_" +
        java.util.UUID.randomUUID().toString.take(8)
      val ms = MemoryStream[TypedSpendPoint]
      val q = mapListSpendStream(ms.toDS()).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      val per = math.max(1, (pts.length + batches - 1) / batches)
      pts.grouped(per).foreach { b =>
        ms.addData(b.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
      spark.table(name)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("type_total_cents"), col("last3_sum_cents"))
        .orderBy("user_id", "event_id")
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
