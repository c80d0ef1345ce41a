package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One keyed spend observation for the running-aggregate processor.
  * Spend is carried in integer cents so cross-batch accumulation is
  * exact (the same integer-contract as every oracled operator). */
case class SpendPoint(user_id: Long, ts: Timestamp, event_id: Long,
                      spend_cents: Long)

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
    val out = rows.toSeq.sortBy(p => (p.ts.getTime, p.event_id)).map { p =>
      n += 1
      tot += p.spend_cents
      SpendRunning(key, p.event_id, n, tot)
    }
    agg.update((n, tot))
    out.iterator
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
}
