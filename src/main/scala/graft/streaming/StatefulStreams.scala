package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TimeFns

/** Typed event row used by the streaming kernels (events table shape). */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** A closed session emitted by the bounce kernel. */
case class SessionOut(user_id: Long, sess_start: Timestamp, ev_ct: Long,
                      bounce: Boolean)

/** A per-user visit flag row emitted by the visit-flags kernel. */
case class VisitFlag(user_id: Long, cur_date: String, is_new: Int)

/** A unique-visitor detail row (first session start per user-day). */
case class UvDetail(user_id: Long, date_id: String, event_id: Long,
                    visit_time: String)

/** An event tagged by the late-row splitter. */
case class TaggedEv(event_id: Long, ts: Timestamp, user_id: Long,
                    event_type: String, value: Double, is_late: Boolean)

/** Attribution edge emitted by the streaming as-of kernel. */
case class Attribution(event_id: Long, user_id: Long,
                       asof_click_id: Option[Long],
                       click_value: Option[Double],
                       gap_us: Option[Long])

/** A funnel step advance emitted by the streaming funnel kernel. */
case class FunnelAdvance(user_id: Long, step: Int)

/** A closed SCD2 interval emitted by the streaming dim-history kernel. */
case class Scd2Closed(key: Long, version_id: Long, attr: String,
                      valid_from: Timestamp, valid_to: Timestamp)

/** A first-activity-of-day hit emitted by the streaming retention
  * kernel: one row per (user, active day). */
case class RetentionHit(user_id: Long, cohort_date: String,
                        day_offset: Int)

/** One keyed series observation consumed by the streaming z-score
  * kernel. */
case class SeriesPoint(key: Long, ts: Timestamp, x: Double)

/** A scored series point emitted by the streaming z-score kernel. */
case class ZScoreOut(key: Long, ts: Timestamp, x: Double,
                     z: Option[Double], is_anomaly: Boolean)

/** One-hot traffic bean row (`TrafficPageViewBean.java:12-38` shape)
  * as unioned by the traffic union job. */
case class TrafficUnionRow(vc: String, ch: String, ar: String,
    is_new: String, ts: Timestamp, uv: Long, sv: Long, pv: Long,
    dur: Double, uj: Long)

/** Structured-Streaming forms of the stateful kernels (SURVEY §2.5/§2.8).
  *
  * These are the streaming twins of the deterministic batch operators in
  * `graft.operators.state`; the ScalaTest suites prove parity by running
  * both over the same `MemoryStream` data. State is bounded exactly the
  * way the reference bounds it: watermarks stand in for Flink's state
  * TTL (`DwdTradeOrderPreProcess.java:39`), event-time timeouts for its
  * timers (`DwsTradePaymentSucWindow.java:102`).
  */
object StatefulStreams {

  /** A1 streaming — watermarked keyed tumbling window
    * (`DwsTrafficVcChArIsNewPageViewWindow.java:133-178`; 2 s
    * out-of-orderness as in `DwsTradeOrderWindow.java:111`). */
  def windowedAgg(events: DataFrame, watermark: String = "2 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("pv_ct"), round(sum(col("value")), 2).as("val_sum"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("event_type"), col("pv_ct"), col("val_sum"))

  /** A7 streaming — first-wins dedup: keyed ValueState flag with TTL
    * (`DwsTradeOrderWindow.java:84-108`: ValueState + 5 s TTL,
    * OnReadAndWrite). Emits only the first row seen per key; within one
    * micro-batch the winner is the (ts, event_id) minimum, matching the
    * batch twin's total order.
    *
    * The event-time timeout drops the per-key flag once the watermark
    * passes last-seen + `ttlSec` — the reference's TTL (refreshed on
    * read AND write, like OnReadAndWrite), without which state grows
    * one entry per key forever. Event-time (not processing-time)
    * timeouts keep the query drainable: processing-time timeouts
    * re-trigger empty batches forever and `processAllAvailable` never
    * returns. The watermark also drops late rows — the same rows the
    * reference's expired state would have re-admitted as duplicates. */
  def firstWinsStream(events: Dataset[Ev], watermark: String = "2 seconds",
                      ttlSec: Long = 7L * 24 * 3600): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Boolean, Ev](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove(); Iterator.empty
          } else {
            val rows = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out =
              if (state.exists) Iterator.empty
              else { state.update(true); rows.take(1).iterator }
            state.update(true) // TTL refresh on read-or-write
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1,
                rows.map(_.ts.getTime).max + ttlSec * 1000))
            out
          }
      }
  }

  /** CEP streaming — bounce/session detection
    * (`DwdTrafficUserJumpDetail.java:73-119`): per-user state buffers
    * the open session; a follow-up within `gapSec` extends it, a gap
    * closes it, and the event-time timeout (the CEP `within(10 s)`
    * timeout branch) closes it at watermark — emitting single-event
    * sessions as bounces. */
  def bounceStream(events: Dataset[Ev], gapSec: Long = 1800L,
                   watermark: String = "2 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    case class SessState(startMs: Long, lastMs: Long, ct: Long)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state: GroupState[(Long, Long, Long)]) =>
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          def close(s: (Long, Long, Long)): Unit =
            out += SessionOut(user, new Timestamp(s._1), s._3, s._3 == 1)
          if (state.hasTimedOut) {
            close(state.get); state.remove()
          } else {
            var cur = state.getOption
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s._2 <= gapSec * 1000 =>
                  cur = Some((s._1, e.ts.getTime, s._3 + 1))
                case Some(s) =>
                  close(s)
                  cur = Some((e.ts.getTime, e.ts.getTime, 1L))
                case None =>
                  cur = Some((e.ts.getTime, e.ts.getTime, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp to the eviction watermark: an accepted-but-late
              // event (previous-batch watermark admits it) could set a
              // timeout behind the CURRENT watermark, which throws and
              // kills the query — same guard lastWinsStream uses
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1,
                  s._2 + gapSec * 1000))
            }
          }
          out.iterator
      }
  }

  /** J1/J6 streaming — watermarked stream-stream join
    * (`DwdTradeOrderPreProcess.java:141-194` with idle-state TTL;
    * `Flink04_DataStreamJoinTest.java:57-66` interval form): both sides
    * watermarked, equi key + time-range condition bounding the join
    * state exactly like Flink's state TTL. Inner join: rows emit as
    * matches arrive; state is dropped once the watermark passes the
    * range. */
  def streamStreamIntervalJoin(left: DataFrame, right: DataFrame,
                               rangeSeconds: Long = 3600L,
                               watermark: String = "2 seconds"): DataFrame =
    intervalJoin(left, right, rangeSeconds, watermark, "inner")

  private def intervalJoin(left: DataFrame, right: DataFrame,
                           rangeSeconds: Long, watermark: String,
                           joinType: String): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("signup_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
    l.join(r,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $rangeSeconds SECONDS"),
      joinType)
  }

  /** J2 streaming — watermarked stream-stream LEFT OUTER join
    * (`DwdTradeOrderPreProcess.java:189-192`: order detail keeps its
    * row and pads null when no activity/coupon arrives before the join
    * state's TTL expires). Same equi key + time-range bound as the
    * inner form; Spark emits an unmatched left row null-padded exactly
    * when the watermark passes the row's join range — the state-expiry
    * null-padding semantics of the reference, made deterministic by
    * event time. Batch twin: `Joins.leftOuterActivity` /
    * the left-outer interval join in `StreamingParitySpec`. */
  def streamStreamLeftOuterJoin(left: DataFrame, right: DataFrame,
                                rangeSeconds: Long = 3600L,
                                watermark: String = "2 seconds"): DataFrame =
    intervalJoin(left, right, rangeSeconds, watermark, "left_outer")

  /** A10 streaming — daily unique-visitor dedup
    * (`DwdTrafficUniqueVisitorDetail.java:76-105`: per-mid ValueState
    * date with 1-day TTL): `dropDuplicatesWithinWatermark` over
    * (user, day) — state expires once the watermark passes, the exact
    * twin of the reference's TTL (plain `dropDuplicates` without the
    * event-time column in its keys would keep state forever). Emits
    * each user's first event per day. */
  def dailyUvStream(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withColumn("cur_date", date_format(col("ts"), "yyyy-MM-dd"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "cur_date")

  /** A8 streaming — last-wins dedup with flush-on-timer
    * (`DwsTradePaymentSucWindow.java:85-121`: keep the max-`row_op_ts`
    * row per key, 5 s processing-time timer flush; here the flush is an
    * event-time timeout, so emission is watermark-deterministic). */
  def lastWinsStream(events: Dataset[Ev],
                     watermark: String = "2 seconds"): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Ev, Ev](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state: GroupState[Ev]) =>
          if (state.hasTimedOut) {
            val e = state.get; state.remove(); Iterator.single(e)
          } else {
            val best = (state.getOption.iterator ++ it)
              .maxBy(e => (e.ts.getTime, e.event_id))
            state.update(best)
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1, best.ts.getTime + 1))
            Iterator.empty
          }
      }
  }

  /** AS-OF join streaming twin — last-touch attribution as keyed
    * ValueState: the state is the user's latest click (id, µs, value);
    * each purchase emits an edge against the state AT ITS EVENT TIME.
    * Within a batch rows are sorted (ts, click-before-purchase,
    * event_id) so a click at a purchase's exact timestamp matches —
    * the batch operator's inclusive-as-of tie rules. Like the other
    * single-ValueState kernels this assumes per-user event-time order
    * ACROSS micro-batches (a click arriving after a later purchase was
    * already emitted cannot retro-attribute it — Append mode emits
    * once); exact parity with `AsofJoin.purchaseAttribution` holds for
    * in-order replay, which is what the parity suite feeds. */
  def asofAttributionStream(events: Dataset[Ev]): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "purchase" || e.event_type == "click")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Double), Attribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, it, state: GroupState[(Long, Long, Double)]) =>
          def micros(t: java.sql.Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
          // 4-dp HALF_UP via Double.toString — the same BigDecimal path
          // Spark's `round` takes, so batch and stream agree at ties
          def r4(v: Double): Double =
            new java.math.BigDecimal(java.lang.Double.toString(v))
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
          var latest = state.getOption // (click_id, ts_us, value)
          val out = scala.collection.mutable.ArrayBuffer[Attribution]()
          it.toSeq.sortBy(e =>
            (micros(e.ts), if (e.event_type == "click") 0 else 1, e.event_id))
            .foreach { e =>
              if (e.event_type == "click") {
                val newer = latest.forall(s =>
                  s._2 < micros(e.ts) ||
                    (s._2 == micros(e.ts) && s._1 <= e.event_id))
                if (newer) latest = Some((e.event_id, micros(e.ts), e.value))
              } else out += Attribution(e.event_id, user,
                latest.map(_._1), latest.map(s => r4(s._3)),
                latest.map(s => micros(e.ts) - s._2))
            }
          latest.foreach(state.update)
          out.iterator
      }
  }

  /** Rolling z-score streaming twin — the last `n` observations per
    * key as a ring-buffer ValueState; each arriving point is scored
    * against the buffer BEFORE being pushed (the batch operator's
    * exclude-self trailing frame). Parity with
    * `AdvancedWindows.rollingZscore` is BIT-exact for in-order replay
    * because the state math replays Spark's own aggregate
    * implementations: the mean is the left-to-right sum of the frame
    * (`Average`), the stddev is the Welford recurrence
    * (`CentralMomentAgg`: delta = x − avg; avg += delta/k;
    * m2 += delta·(x − avg)), and the 4-dp rounding takes the same
    * BigDecimal HALF_UP path as `round`. Zero-variance baselines flag
    * on any deviation, never score (the batch clause pair). */
  def zscoreStream(points: Dataset[SeriesPoint], n: Int = 8,
                   threshold: Double = 2.0): Dataset[ZScoreOut] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key)
      .flatMapGroupsWithState[Vector[Double], ZScoreOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[Vector[Double]]) =>
          def r4(v: Double): Double =
            new java.math.BigDecimal(java.lang.Double.toString(v))
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
          var buf = state.getOption.getOrElse(Vector.empty[Double])
          val out = scala.collection.mutable.ArrayBuffer[ZScoreOut]()
          // full-precision micros, not getTime's millis — sub-ms
          // series points must fold in the batch window's order
          // (same-instant ties are caller-undefined on BOTH forms)
          def micros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
          it.toSeq.sortBy(p => micros(p.ts)).foreach { p =>
            val m = buf.size
            val (z, flag) =
              if (m >= 2) {
                val mean = buf.foldLeft(0.0)(_ + _) / m
                var avg = 0.0; var m2 = 0.0; var k = 0
                buf.foreach { x =>
                  k += 1; val d = x - avg; avg += d / k; m2 += d * (x - avg)
                }
                val sd = math.sqrt(m2 / (m - 1))
                if (sd > 0) {
                  val zz = r4((p.x - mean) / sd)
                  (Some(zz), math.abs(zz) > threshold)
                } else (None, p.x != mean)
              } else (None, false)
            out += ZScoreOut(key, p.ts, p.x, z, flag)
            buf = (buf :+ p.x).takeRight(n)
          }
          state.update(buf)
          out.iterator
      }
  }

  /** Funnel streaming twin — per-user progress as an Int ValueState
    * (highest step reached). A user emits `FunnelAdvance(user, n)`
    * exactly once per step, the first time step n's event arrives
    * STRICTLY after step n-1 was reached (same strict-after rule as
    * `Behavior.funnel`; the state stores the reach timestamp in µs).
    * Counting advances per step downstream reproduces the batch
    * funnel's `users` column for in-order replay. */
  def funnelStream(events: Dataset[Ev],
                   steps: Seq[String] = Seq("view", "click", "purchase"))
      : Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    val stepOf = steps.zipWithIndex.toMap
    events
      .filter(e => stepOf.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Int, Long), FunnelAdvance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, it, state: GroupState[(Int, Long)]) =>
          def micros(t: java.sql.Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
          var (reached, reachedAt) = state.getOption.getOrElse((0, 0L))
          val out = scala.collection.mutable.ArrayBuffer[FunnelAdvance]()
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val s = stepOf(e.event_type) + 1
            if (s == reached + 1 &&
              (s == 1 || micros(e.ts) > reachedAt)) {
              reached = s; reachedAt = micros(e.ts)
              out += FunnelAdvance(user, s)
            }
          }
          state.update((reached, reachedAt))
          out.iterator
      }
  }

  /** Retention streaming twin — per-user cohort day + seen-day set as
    * keyed state, emitting one `RetentionHit` the FIRST time a user is
    * active on each day (Append mode, once ever per (user, day)).
    * Counting hits per (cohort_date, day_offset) downstream equals
    * `Behavior.retentionCohorts` for in-order replay. State is bounded
    * by `horizonDays` distinct day strings per user (offsets past the
    * horizon are not tracked — the standard retention-report horizon;
    * set it to the report's widest offset). */
  def retentionStream(events: Dataset[Ev],
                      horizonDays: Int = 90): Dataset[RetentionHit] = {
    import events.sparkSession.implicits._
    val zone = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(String, Set[String]), RetentionHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, it, state: GroupState[(String, Set[String])]) =>
          val df = new java.text.SimpleDateFormat("yyyy-MM-dd")
          df.setTimeZone(java.util.TimeZone.getTimeZone(zone))
          var (cohort, seen) =
            state.getOption.getOrElse((null: String, Set.empty[String]))
          val out = scala.collection.mutable.ArrayBuffer[RetentionHit]()
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val d = df.format(e.ts)
            if (cohort == null) cohort = d
            if (!seen.contains(d)) {
              val off = java.time.temporal.ChronoUnit.DAYS.between(
                java.time.LocalDate.parse(cohort),
                java.time.LocalDate.parse(d))
              if (off >= 0 && off <= horizonDays) {
                seen += d
                out += RetentionHit(user, cohort, off.toInt)
              }
            }
          }
          state.update((cohort, seen))
          out.iterator
      }
  }

  /** SCD2 streaming twin — dim history from a version stream: the open
    * version rides ValueState; each strictly-newer version CLOSES its
    * predecessor, emitting the finished [valid_from, valid_to)
    * interval (Append mode emits each closed interval exactly once;
    * the still-open versions are the state itself, flushed by the
    * batch `Scd2.scd2Build` semantics at any cutover). Version order
    * is (ts, version_id), the batch builder's tie rule. */
  def scd2Stream(versions: Dataset[(Long, Long, String, Timestamp)])
      : Dataset[Scd2Closed] = {
    import versions.sparkSession.implicits._
    versions
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String, Timestamp), Scd2Closed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[(Long, String, Timestamp)]) =>
          var open = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[Scd2Closed]()
          it.toSeq.sortBy(v => (v._4.getTime, v._2)).foreach { v =>
            open.foreach { case (vid, attr, from) =>
              out += Scd2Closed(key, vid, attr, from, v._4)
            }
            open = Some((v._2, v._3, v._4))
          }
          open.foreach(state.update)
          out.iterator
      }
  }

  /** A9/A11 streaming — per-user first-visit flags: ValueState of
    * (firstDate, lastDate) (`DwsTradeCartAddUuWindow.java:85-117`,
    * `BaseLogApp.java:76-105`). Emits one row per (user, day) with
    * `is_new` = first-ever day.
    *
    * Like the reference's single-ValueState comparison, this assumes
    * per-user event-time-ordered delivery across micro-batches (within
    * a batch events are sorted here): a day arriving EARLIER than the
    * stored last day is late data and is not re-flagged — the same rows
    * the reference's watermark would have dropped. Exact parity with
    * the batch twin (`VisitFlags.firstPerDayFlags`) therefore holds for
    * in-order replay, which is what the parity suite feeds. */
  def visitFlagsStream(events: Dataset[Ev]): Dataset[VisitFlag] = {
    import events.sparkSession.implicits._
    val fmt = "yyyy-MM-dd"
    // day-bucket in the SESSION time zone, like the batch twin's
    // date_format (a hardcoded zone would silently disagree with
    // VisitFlags/dailyUvStream whenever the session isn't UTC)
    val zone = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(String, String), VisitFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, it, state: GroupState[(String, String)]) =>
          val df = new java.text.SimpleDateFormat(fmt)
          df.setTimeZone(java.util.TimeZone.getTimeZone(zone))
          var (first, last) = state.getOption.getOrElse((null: String, null: String))
          val out = scala.collection.mutable.ArrayBuffer[VisitFlag]()
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val d = df.format(e.ts)
            if (first == null) { first = d; last = d; out += VisitFlag(user, d, 1) }
            else if (d != last && d > last) { last = d; out += VisitFlag(user, d, 0) }
          }
          state.update((first, last))
          out.iterator
      }
  }

  /** `allowedLateness` side output — the reference's
    * `sideOutputLateData` (Flink sends beyond-allowance rows to a side
    * topic instead of dropping them). Spark's stateful aggregations
    * drop late rows silently, but `flatMapGroupsWithState` receives
    * ALL rows and can observe the current watermark — so this kernel
    * tags each row `is_late` = (event time < watermark) and emits it
    * either way. Downstream routes: on-time → the windowed aggregate
    * (whose own watermark drop is now a no-op — late rows were split
    * off), late → the K7 quarantine sink, exactly the reference's
    * side-output wiring. Within-allowance updates are Spark-native:
    * the watermark delay IS the allowance (update-mode re-emission).
    * Stateless per key — no stored state, nothing to expire. */
  def lateRowSplit(events: Dataset[Ev],
                   watermark: String = "2 seconds"): Dataset[TaggedEv] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Boolean, TaggedEv](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state: GroupState[Boolean]) =>
          // no state is written, so the lazily mapped iterator can be
          // returned as-is — buffering a hot key's whole micro-batch
          // here would be pure memory pressure
          val wm = state.getCurrentWatermarkMs()
          it.map(e => TaggedEv(e.event_id, e.ts, e.user_id, e.event_type,
            e.value, e.ts.getTime < wm))
      }
  }

  /** DwdTrafficUniqueVisitorDetail streaming twin
    * (`DwdTrafficUniqueVisitorDetail.java:52-105`): ONE stateful
    * operator holding (lastTs, lastEmitDate) per user — a row is a
    * session start when it is the user's first event or arrives more
    * than `gapSec` after the previous one, and it is emitted only for
    * the first session start of its calendar day (the reference's
    * last-visit ValueState with its 1-day TTL mapped to the day
    * bucket). Batch twin: `DwdApps.uniqueVisitorDetail` (parity
    * test); same in-order-replay contract as `visitFlagsStream`. */
  def uniqueVisitorDetailStream(events: Dataset[Ev],
                                gapSec: Long = 1800L): Dataset[UvDetail] = {
    import events.sparkSession.implicits._
    val zone = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    events
      .filter(e => (e.event_type == "view" || e.event_type == "click"))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, String), UvDetail](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, it, state: GroupState[(Long, String)]) =>
          val day = new java.text.SimpleDateFormat("yyyy-MM-dd")
          day.setTimeZone(java.util.TimeZone.getTimeZone(zone))
          val full = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
          full.setTimeZone(java.util.TimeZone.getTimeZone(zone))
          // gap compare in MICROseconds: the batch twin uses
          // unix_micros and the events table carries micro precision —
          // a millisecond compare would disagree at sub-ms boundaries.
          // floorDiv keeps pre-epoch (corrupt/zeroed) rows correct.
          // NOTE: this changed the stored lastTs unit from ms to µs —
          // a checkpoint written by the previous revision must not be
          // resumed across the change (state carries no version tag).
          def micros(t: java.sql.Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
          var (lastTs, lastEmitDate) =
            state.getOption.getOrElse((Long.MinValue, null: String))
          val out = scala.collection.mutable.ArrayBuffer[UvDetail]()
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val start = lastTs == Long.MinValue ||
              micros(e.ts) - lastTs > gapSec * 1000000L
            val d = day.format(e.ts)
            if (start && d != lastEmitDate) {
              out += UvDetail(user, d, e.event_id, full.format(e.ts))
              lastEmitDate = d
            }
            lastTs = micros(e.ts)
          }
          state.update((lastTs, lastEmitDate))
          out.iterator
      }
  }

  /** DwsTradeCartAddUuWindow streaming twin
    * (`DwsTradeCartAddUuWindow.java:82-141`): per-user
    * first-cart-add-of-day via watermark-bounded dedup state (the
    * reference's `lastCartAddState` date compare, TTL = the watermark
    * horizon), chained into the watermarked 10 s unique-user window —
    * two stateful operators in one pipeline, the composition the
    * reference runs as keyBy→RichFilter→windowAll. Batch twin:
    * `DwsApps.cartAddUuWindow` (parity-tested). */
  def cartAddUuStream(events: DataFrame, watermark: String = "1 day"): DataFrame =
    dailyUvStream(events.filter(col("event_type") === "click" &&
        col("user_id").isNotNull), watermark)
      .groupBy(window(col("ts"), "10 seconds").as("w"))
      .agg(count(lit(1)).as("cart_add_uu_ct"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("cart_add_uu_ct"))

  /** Traffic union streaming twin
    * (`DwsTrafficVcChArIsNewPageViewWindow.java:119-178`): the three
    * one-hot bean streams union, take the reference's single 14 s
    * bounded-out-of-orderness watermark, and feed the SAME keyed 10 s
    * window-sum stage the batch job uses
    * (`ComposedJobs.trafficUnionWindow`). Append mode: a window emits
    * once the watermark passes its end — Flink's window firing. */
  def trafficUnionStream(uv: DataFrame, uj: DataFrame, page: DataFrame,
                         watermark: String = "14 seconds"): DataFrame =
    graft.operators.dws.ComposedJobs.trafficUnionWindow(
      uv.unionByName(uj).unionByName(page).withWatermark("ts", watermark))
}
