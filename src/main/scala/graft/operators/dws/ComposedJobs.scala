package graft.operators.dws

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TimeFns
import graft.operators.dwd.Joins
import graft.operators.state.{Dedup, VisitFlags}

/** Whole-job compositions — the reference's apps are pipelines of the
  * §2 operators; these reproduce two complete jobs end-to-end from the
  * same kernels the individual queries verify.
  */
object ComposedJobs {

  /** `DwdTradeOrderPreProcess` (§3.2): the five-way order wide table —
    * detail ⋈ info ⟕ activity ⟕ coupon + dictionary lookup, with the
    * reference's null→'' padding on the outer sides. One fact shuffle;
    * every other input broadcasts. */
  def orderPreProcess(lineitem: DataFrame, orders: DataFrame,
                      part: DataFrame, dic: DataFrame): DataFrame = {
    val activity = part.filter(col("p_retailprice") > 1500)
      .select(col("p_partkey").as("act_key"), col("p_brand").as("activity_brand"))
    val coupon = part.filter(col("p_size") > 40)
      .select(col("p_partkey").as("cpn_key"), col("p_type").as("coupon_type"))
    val statusDic = dic.select(col("dic_code"), col("dic_name").as("status_name"))
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_extendedprice"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(activity, col("l_partkey") === col("act_key"), "left_outer")
      .join(coupon, col("l_partkey") === col("cpn_key"), "left_outer")
      .join(broadcast(statusDic), col("o_orderstatus") === col("dic_code"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("status_name"),
        coalesce(col("activity_brand"), lit("")).as("activity_brand"),
        coalesce(col("coupon_type"), lit("")).as("coupon_type"),
        round(col("l_extendedprice"), 2).as("amount"))
  }

  /** `DwsTradePaymentSucWindow` (§3.3 shape): payment filter →
    * changelog dedup → per-user first-pay-of-day/first-ever flags →
    * daily totals. Composes P11 + A8 + A9 + A5 from the same kernels
    * their individual queries verify. */
  def paymentSucWindow(events: DataFrame): DataFrame = {
    val payments = events.filter(col("event_type") === "purchase")
    val deduped = Dedup.lastWins(payments, Seq("event_id"),
      Seq(col("ts").desc, col("user_id").desc))
    VisitFlags.firstPerDayFlags(deduped)
      .withColumnRenamed("uu_ct", "pay_uu_ct")
      .withColumnRenamed("new_uu_ct", "pay_new_ct")
  }

  /** `DwsTradeUserSpuOrderWindow` (§3.3, the full hybrid app,
    * `DwsTradeUserSpuOrderWindow.java:68-282`): first-wins dedup of the
    * detail changelog (A7) → pre-aggregation sku dim joins — only the
    * dims whose outputs are GROUP KEYS stay before the window — →
    * daily window keyed (user, brand, nation) with sum + exact
    * distinct (A2) → post-aggregation snowflake name enrichment
    * (nation→region), hoisted past the aggregate exactly as SURVEY
    * §3.3 notes: the reference joins 4 dims per detail ROW after its
    * window; joining them per GROUP row is the same output at a
    * fraction of the lookups. One fact shuffle for the dedup key, one
    * for the group key; every dim broadcasts. */
  def userSpuOrderJob(lineitem: DataFrame, orders: DataFrame,
                      part: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame = {
    // one fact shuffle total: hash-partitioning on l_orderkey alone
    // already co-locates every (l_orderkey, l_linenumber) group, so it
    // satisfies the dedup window's clustering AND the orders join's —
    // without this the window would exchange on (orderkey, linenumber)
    // and the join would re-exchange on orderkey, two full passes over
    // the fact table at 100 TB
    val detail = Dedup.firstWins(
      lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
        .repartition(col("l_orderkey")),
      Seq("l_orderkey", "l_linenumber"),
      // full tiebreak: the testdata re-emits detail keys with differing
      // payloads (45832 distinct of 60000 at sf0.01), so the survivor
      // must be totally ordered to be deterministic
      Seq(col("l_extendedprice").asc, col("l_partkey").asc, col("l_suppkey").asc))
    val agg = detail
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(window(col("o_orderdate"), "1 day").as("w"),
        col("o_custkey").as("user_id"), col("p_brand"), col("s_nationkey"))
      .agg(round(sum(col("l_extendedprice")), 2).as("order_amount"),
        countDistinct(col("l_orderkey")).as("order_ct"))
    agg
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("user_id"), col("p_brand"), col("n_name").as("nation_name"),
        col("r_name").as("region_name"), col("order_amount"), col("order_ct"))
      .orderBy("stt", "user_id", "p_brand", "nation_name")
  }

  /** `DwsTrafficVcChArIsNewPageViewWindow` (§3.3,
    * `DwsTrafficVcChArIsNewPageViewWindow.java:90-178`) — the traffic
    * union job end-to-end: three one-hot streams (unique-visitor,
    * user-jump/bounce, page-view with session-start flag) union into
    * one bean stream, keyed by (vc, ch, ar, is_new) into a 10 s
    * tumbling window summing the five counters. The `is_new` key is
    * the A11-corrected flag (first-ever active day), computed IN the
    * pipeline as the reference's DWD layer does upstream.
    *
    * Spark-first shape: the reference runs three DWD apps + this DWS
    * app, four keyBys total; here ONE enrichment pass computes the
    * per-user analytics (first day, prev/next gap, per-day rank) with
    * a single user_id exchange — HashPartitioning(user_id) satisfies
    * every clustering used, incl. the (user, day) rank — and the three
    * one-hot branches are projections of that shared subtree
    * (ReuseExchange dedups the exchange), so the whole job is two
    * logical shuffles: user enrichment + the windowed key agg.
    * Streaming twin: `StatefulStreams.trafficUnionStream` (14 s union
    * watermark, `StreamingParitySpec`). */
  def trafficUnionJob(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapMs = gapSeconds * 1000
    val enriched = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), TimeFns.toDateStr(col("ts")).as("cur_date"))
      .withColumn("first_date",
        min(col("cur_date")).over(Window.partitionBy(col("user_id"))))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
      .withColumn("day_rn", row_number().over(
        Window.partitionBy(col("user_id"), col("cur_date"))
          .orderBy(col("ts"), col("event_id"))))
      .withColumn("new_sess", col("prev_ts").isNull ||
        unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs)
      .withColumn("is_bounce", col("new_sess") && (col("next_ts").isNull ||
        unix_millis(col("next_ts")) - unix_millis(col("ts")) > gapMs))
      .select(col("ts"), col("value"), col("day_rn"), col("new_sess"),
        col("is_bounce"),
        concat(lit("v"), col("event_id") % 3).as("vc"),
        col("event_type").as("ch"),
        (col("user_id") % 5).cast("string").as("ar"),
        when(col("cur_date") === col("first_date"), "1").otherwise("0")
          .as("is_new"))
    val keyCols = Seq(col("vc"), col("ch"), col("ar"), col("is_new"), col("ts"))
    val uv = enriched.filter(col("day_rn") === 1)
      .select(keyCols :+ lit(1L).as("uv") :+ lit(0L).as("sv") :+
        lit(0L).as("pv") :+ lit(0.0).as("dur") :+ lit(0L).as("uj"): _*)
    val uj = enriched.filter(col("is_bounce"))
      .select(keyCols :+ lit(0L).as("uv") :+ lit(0L).as("sv") :+
        lit(0L).as("pv") :+ lit(0.0).as("dur") :+ lit(1L).as("uj"): _*)
    val page = enriched
      .select(keyCols :+ lit(0L).as("uv") :+
        when(col("new_sess"), 1L).otherwise(0L).as("sv") :+
        lit(1L).as("pv") :+ col("value").as("dur") :+ lit(0L).as("uj"): _*)
    trafficUnionWindow(uv.unionByName(uj).unionByName(page))
      .orderBy("stt", "vc", "ch", "ar", "is_new")
  }

  /** The union job's window stage — keyed 10 s tumbling sum of the
    * five one-hot counters; shared verbatim by the batch form above
    * and the streaming twin (`StatefulStreams.trafficUnionStream`). */
  private[graft] def trafficUnionWindow(unioned: DataFrame): DataFrame =
    unioned
      .groupBy(window(col("ts"), "10 seconds").as("w"),
        col("vc"), col("ch"), col("ar"), col("is_new"))
      .agg(sum(col("uv")).as("uv_ct"), sum(col("sv")).as("sv_ct"),
        sum(col("pv")).as("pv_ct"), round(sum(col("dur")), 2).as("dur_sum"),
        sum(col("uj")).as("uj_ct"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("vc"), col("ch"), col("ar"), col("is_new"),
        col("uv_ct"), col("sv_ct"), col("pv_ct"), col("dur_sum"), col("uj_ct"))

  /** `DwdTradeRefundPaySuc` (§3.2, `DwdTradeRefundPaySuc.java:120-145`)
    * — the refund-success 4-way chain, the reference's only join on a
    * COMPOSITE key: refund_payment ⋈ order_info on order_id, ⋈
    * order_refund_info on (order_id, sku_id), ⋈ base_dic lookup; plus
    * the double-aliased dictionary the sibling job uses
    * (`DwdTradeOrderRefund.java:97-123`). Mapping: refund_payment =
    * returned lines (l_returnflag='R'), order_refund_info = the per-
    * (order, sku) refund quantity rollup of the same slice, order_info
    * = refund-success orders (o_orderstatus='F').
    *
    * Scale shape: BOTH composite-key sides are pre-partitioned on
    * order_id alone — a hash on a subset of the join keys still
    * co-locates every (order_id, sku_id) group, so one exchange per
    * side feeds the rollup AND both joins (no (order_id, sku_id)
    * re-exchange; Spark accepts subset partitioning via
    * ClusteredDistribution). Dictionaries broadcast. The reference's
    * `current_row_timestamp()` column is omitted — non-deterministic
    * output has no batch twin. */
  def refundPaySucJob(lineitem: DataFrame, orders: DataFrame,
                      dic: DataFrame): DataFrame = {
    val refunded = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("order_id"), col("l_partkey").as("sku_id"),
        col("l_linenumber").as("id"), col("l_linestatus").as("payment_type"),
        col("l_shipdate").as("callback_time"), col("l_quantity"),
        col("l_extendedprice").as("total_amount"))
      .repartition(col("order_id"))
    val refundInfo = refunded
      .groupBy(col("order_id"), col("sku_id"))
      .agg(round(sum(col("l_quantity")), 2).as("refund_num"))
    val orderInfo = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey").as("user_id"),
        split_part(col("o_orderpriority"), lit("-"), lit(1)).as("province_id"),
        col("o_orderstatus"))
    val payDic = broadcast(dic.select(col("dic_code").as("pay_code"),
      col("dic_name").as("payment_type_name")))
    val statusDic = broadcast(dic.select(col("dic_code").as("status_code"),
      col("dic_name").as("order_status_name")))
    refunded
      .join(orderInfo, col("order_id") === col("o_orderkey"))
      .join(refundInfo.select(col("order_id").as("ri_order_id"),
        col("sku_id").as("ri_sku_id"), col("refund_num")),
        col("order_id") === col("ri_order_id") &&
          col("sku_id") === col("ri_sku_id"))
      .join(payDic, col("payment_type") === col("pay_code"))
      .join(statusDic, col("o_orderstatus") === col("status_code"))
      .select(col("id"), col("user_id"), col("order_id"), col("sku_id"),
        col("province_id"), col("payment_type"), col("payment_type_name"),
        col("order_status_name"),
        date_format(col("callback_time"), "yyyy-MM-dd").as("date_id"),
        col("refund_num"),
        round(col("total_amount"), 2).as("refund_amount"))
  }

  /** `BaseLogApp` (§3.1, `BaseLogApp.java:48-192`) end-to-end in batch:
    * build nested log JSON deterministically from `events` (dirty rows
    * planted every 97th id, start/err/action sections and a 0–2 element
    * `displays[]` keyed off the id), then run the REAL pipeline —
    * `LogSplit.parse` quarantine → 5-way split → `displays[]`/
    * `actions[]` explode — and emit one summary row per split
    * (row count + checksum) so the DuckDB oracle can derive the same
    * totals relationally without a JSON round-trip. The parsed batch is
    * cached once and the five projections read it — the batch twin of
    * the streaming form's cache-per-micro-batch (SURVEY §1.1). */
  def baseLogSplitJob(events: DataFrame): DataFrame = {
    import graft.streaming.LogSplit
    val tsMs = unix_millis(col("ts"))
    val displays = slice(
      array(
        struct(lit("sku_a").as("item"), lit("sku").as("item_type"),
          lit(0L).as("pos_id"), lit(0L).as("order")),
        struct(lit("sku_b").as("item"), lit("sku").as("item_type"),
          lit(1L).as("pos_id"), lit(1L).as("order"))),
      lit(1), (col("event_id") % 3).cast("int"))
    val json = to_json(struct(
      struct(concat(lit("mid_"), col("user_id")).as("mid"),
        col("user_id").cast("string").as("uid"), lit("v1").as("vc"),
        lit("ch0").as("ch"), lit("ar0").as("ar"), lit("1").as("is_new"),
        lit("ba").as("ba"), lit("md").as("md"), lit("os").as("os")).as("common"),
      struct(col("event_type").as("page_id"),
        lit(null).cast("string").as("last_page_id"),
        lit(null).cast("string").as("item"),
        lit(null).cast("string").as("item_type"),
        (col("event_id") % 1000).as("during_time")).as("page"),
      when(col("event_id") % 3 > 0, displays).as("displays"),
      when(col("event_id") % 13 === 0, array(
        struct(lit("fav").as("item"), lit("sku").as("item_type"),
          lit("a1").as("action_id"), tsMs.as("ts")))).as("actions"),
      when(col("event_id") % 11 === 0,
        struct(lit(42L).as("error_code"), lit("boom").as("msg"))).as("err"),
      when(col("event_id") % 7 === 0,
        struct(lit("icon").as("entry"), (col("event_id") % 100).as("open_ad_id"),
          lit(1000L).as("loading_time"))).as("start"),
      tsMs.as("ts")))
    val raw = events.select(
      when(col("event_id") % 97 === 0, lit("{broken")).otherwise(json).as("value"))
    val splits = LogSplit.split(LogSplit.parse(raw).cache())
    Seq(
      ("action", splits("action"), col("ts")),
      ("dirty", splits("dirty"), lit(0L)),
      ("display", splits("display"), col("pos_id")),
      ("err", splits("err"), col("ts")),
      ("page", splits("page"), col("ts")),
      ("start", splits("start"), col("ts")))
      .map { case (name, df, chk) =>
        df.agg(count(lit(1)).as("ct"), coalesce(sum(chk), lit(0L)).as("chk"))
          .select(lit(name).as("split"), col("ct"), col("chk")) }
      .reduce(_.unionByName(_))
      .orderBy("split")
  }

  /** The reference's Flink-SQL apps build plans from SQL strings
    * (§3.2); same surface here: temp views + `spark.sql`, landing in
    * the identical Catalyst plan as the DataFrame form. */
  def sqlHourlyTypeWindow(spark: SparkSession, events: DataFrame): DataFrame = {
    // unique view name, dropped after the plan is resolved: a fixed
    // name would silently clobber a caller's view of the same name and
    // leak into the session catalog (two concurrent invocations would
    // also race on it)
    val view = s"events_v_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    events.createOrReplaceTempView(view)
    try spark.sql(
      s"""SELECT date_format(timestamp_seconds(floor(unix_timestamp(ts)/3600)*3600),
         |                   'yyyy-MM-dd HH:mm:ss') AS stt,
         |       event_type,
         |       count(*) AS ev_ct,
         |       count(DISTINCT user_id) AS uu_ct,
         |       round(sum(value), 2) AS val_sum
         |FROM $view
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    finally { spark.catalog.dropTempView(view); () }
  }
}
