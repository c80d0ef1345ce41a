package graft.operators.state

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** Per-user visit-state kernels (SURVEY §2.5 A9/A11).
  *
  * The reference keeps a per-user `ValueState<lastVisitDate>` and emits
  * daily-first / first-ever / win-back flags
  * (`DwsTradePaymentSucWindow.java:137-172`,
  * `DwsUserUserLoginWindow.java:93-129` — `backUv` when the gap since
  * the last login is ≥ 8 days; `BaseLogApp.java:76-105` — `is_new`
  * correction against the first-visit date).
  *
  * Batch twins derive the same flags with analytic windows over
  * (user, day): `min(day) over user` = first-ever day, `lag(day)` =
  * previous active day. One shuffle on user_id; day-level rollups
  * after. Streaming twin: `StatefulStreams.visitFlagsStream`.
  */
object VisitFlags {

  /** A9 — daily active users + daily NEW users (first-ever day). */
  def firstPerDayFlags(events: DataFrame): DataFrame = {
    val userDays = events
      .select(col("user_id"), TimeFns.toDateStr(col("ts")).as("cur_date"))
      .distinct()
    val withFirst = userDays.withColumn("first_date",
      min(col("cur_date")).over(Window.partitionBy(col("user_id"))))
    withFirst
      .groupBy(col("cur_date"))
      .agg(count(lit(1)).as("uu_ct"),
        sum(when(col("cur_date") === col("first_date"), 1L).otherwise(0L))
          .as("new_uu_ct"))
      .orderBy("cur_date")
  }

  /** A9 win-back — users returning after an absence of ≥ 8 days
    * (`DwsUserUserLoginWindow.java:110-121`). */
  def winBack(events: DataFrame): DataFrame = {
    val userDays = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val withPrev = userDays.withColumn("prev_d",
      lag(col("d"), 1).over(Window.partitionBy(col("user_id")).orderBy(col("d"))))
    withPrev
      .groupBy(date_format(col("d"), "yyyy-MM-dd").as("cur_date"))
      .agg(
        sum(when(col("prev_d").isNotNull &&
          datediff(col("d"), col("prev_d")) >= 8, 1L).otherwise(0L))
          .as("back_uu_ct"),
        count(lit(1)).as("active_uu_ct"))
      .orderBy("cur_date")
  }

  /** A9 dual-state — home/detail per-day unique visitors
    * (`DwsTrafficPageViewWindow.java:96-151`: TWO independent per-user
    * ValueStates, one per page kind, 1-day TTL, then a global 10 s
    * window summing both one-hot counters). In Spark the "dual state"
    * is simply a wider dedup key — first event per (user, page kind,
    * day) via one rank over a user-partitioned window; the same
    * mechanism A10's `dropDuplicatesWithinWatermark` twin streams with
    * (user_id, page_kind, cur_date) as the key. Page mapping: 'view' →
    * home, 'click' → good_detail. */
  def homeDetailUv(events: DataFrame): DataFrame = {
    val pages = events
      .filter(col("event_type").isin("view", "click"))
      .withColumn("page_kind",
        when(col("event_type") === "view", "home").otherwise("good_detail"))
    pages
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("page_kind"),
            TimeFns.toDateStr(col("ts")))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1)
      .groupBy(window(col("ts"), "10 seconds").as("w"))
      .agg(sum(when(col("page_kind") === "home", 1L).otherwise(0L))
          .as("home_uv_ct"),
        sum(when(col("page_kind") === "good_detail", 1L).otherwise(0L))
          .as("good_detail_uv_ct"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("home_uv_ct"), col("good_detail_uv_ct"))
      .orderBy("stt")
  }

  /** A11 — `is_new` flag correction: an event is "new-visitor" traffic
    * iff it falls on its user's first-ever active day
    * (`BaseLogApp.java:76-105` back-dates state for old visitors). */
  def isNewCorrection(events: DataFrame): DataFrame = {
    val withFirst = events
      .select(col("user_id"), col("ts"), TimeFns.toDateStr(col("ts")).as("cur_date"))
      .withColumn("first_date",
        min(col("cur_date")).over(Window.partitionBy(col("user_id"))))
    withFirst
      .withColumn("is_new",
        when(col("cur_date") === col("first_date"), 1).otherwise(0))
      .groupBy(col("cur_date"), col("is_new"))
      .agg(count(lit(1)).as("ev_ct"),
        countDistinct(col("user_id")).as("uu_ct"))
      .orderBy("cur_date", "is_new")
  }
}
