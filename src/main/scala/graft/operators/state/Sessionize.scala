package graft.operators.state

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CEP bounce detection as gap-based sessionization (SURVEY §2.8 CEP).
  *
  * Reference `DwdTrafficUserJumpDetail.java:73-119`: a Flink CEP
  * pattern `begin(sessionStart).next(sessionStart).within(10 s)` whose
  * MATCH and TIMEOUT outputs are unioned — i.e. a visit is a "jump"
  * (bounce) iff no follow-up event arrives within the timeout; the
  * timeout firing and the end-of-stream case emit the same stranded
  * event.
  *
  * Batch twin (SURVEY §2.8): `lead(ts) over (partition by user order
  * by ts)` — a session starts when the gap since the previous event
  * exceeds the timeout; a session with exactly one event is a bounce.
  * This is exactly the CEP semantics including the end-of-stream
  * timeout (last event of a user is a bounce iff no successor within
  * the gap). One shuffle on user_id, then a day rollup.
  * Streaming twin: `StatefulStreams.bounceStream`
  * (flatMapGroupsWithState + event-time timeout).
  */
object Sessionize {

  /** Daily session/bounce stats with a `gapSeconds` session timeout. */
  def bounceSessions(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // millisecond gap test: matches the streaming twin (Timestamp
      // .getTime) and Flink's within(); unix_timestamp would truncate
      // to seconds and disagree on sub-second gaps
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapSeconds * 1000,
          1L).otherwise(0L))
    val sessioned = flagged.withColumn("sess_id",
      sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    sessioned
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts")).as("sess_start"), count(lit(1)).as("ev_ct"))
      .groupBy(date_format(col("sess_start"), "yyyy-MM-dd").as("cur_date"))
      .agg(count(lit(1)).as("session_ct"),
        sum(when(col("ev_ct") === 1, 1L).otherwise(0L)).as("bounce_ct"),
        sum(col("ev_ct")).as("event_ct"))
      .orderBy("cur_date")
  }
}
