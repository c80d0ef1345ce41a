package graft.operators.dwd

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.JsonFns
import graft.operators.dws.ComposedJobs

/** Whole-job compositions of the reference's remaining DWD-layer apps.
  * Each reproduces one complete Flink job end-to-end from the same §2
  * kernels the individual queries verify; CDC envelopes are
  * reconstructed deterministically from the testdata tables exactly as
  * `EventFilters.stateTransition` does, so the filters exercise genuine
  * map-column access rather than constant folding.
  */
object DwdApps {

  /** `DwdTradeCancelDetail` (`DwdTradeCancelDetail.java:86-140`): the
    * order-preprocess wide table filtered to cancelled orders — rows
    * whose envelope is `type='update' AND old['order_status'] IS NOT
    * NULL AND data['order_status']='F'`. The preprocess side reuses
    * `ComposedJobs.orderPreProcess` unchanged (the reference consumes
    * the preprocess *topic*); the cancel set derives from the same
    * orders CDC envelope as P4. Cancel keys broadcast when small; the
    * fact side keeps its single preprocess shuffle. */
  def cancelDetail(lineitem: DataFrame, orders: DataFrame,
                   part: DataFrame, dic: DataFrame): DataFrame = {
    val envelope = orders.select(
      col("o_orderkey"), col("o_orderdate"),
      when(col("o_orderstatus") === "F", lit("update"))
        .otherwise(lit("insert")).as("type"),
      map(lit("order_status"), col("o_orderstatus")).as("data"),
      when(col("o_orderstatus") === "F",
        map(lit("order_status"), lit("O"))).as("old"))
    val cancelled = envelope
      .filter(col("type") === "update" &&
        col("old")("order_status").isNotNull &&
        col("data")("order_status") === "F")
      .select(col("o_orderkey").as("cancel_key"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("cancel_date"))
    ComposedJobs.orderPreProcess(lineitem, orders, part, dic)
      .join(cancelled, col("l_orderkey") === col("cancel_key"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
        col("order_date"), col("status_name"), col("activity_brand"),
        col("coupon_type"), col("amount"), col("cancel_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("coupon_type"),
        col("amount"))
  }

  /** `DwdTradeOrderDetail` (`DwdTradeOrderDetail.java:89-147`): the
    * preprocess table filtered to `type='insert'` rows — new-order
    * detail. The insert set derives from the same orders envelope as
    * `cancelDetail` (inserts = still-Open orders), completing the
    * preprocess consumer pair. */
  def orderDetail(lineitem: DataFrame, orders: DataFrame,
                  part: DataFrame, dic: DataFrame): DataFrame = {
    val envelope = orders.select(
      col("o_orderkey"),
      when(col("o_orderstatus") === "F", lit("update"))
        .otherwise(lit("insert")).as("type"))
    val inserts = envelope.filter(col("type") === "insert")
      .select(col("o_orderkey").as("ins_key"))
    ComposedJobs.orderPreProcess(lineitem, orders, part, dic)
      .join(inserts, col("l_orderkey") === col("ins_key"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
        col("order_date"), col("status_name"), col("activity_brand"),
        col("coupon_type"), col("amount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("coupon_type"),
        col("amount"))
  }

  /** `DwdTradeOrderRefund` (`DwdTradeOrderRefund.java:62-123`): the
    * refund-info insert stream joined to orders that just transitioned
    * into refund state — `type='update' AND data['order_status']='1005'
    * AND old['order_status'] IS NOT NULL`, the P4 envelope filter with
    * the reference's own status literal — then the J3 double-aliased
    * dictionary lookup (type_dic + reason_dic on one `base_dic`).
    * Refund rows derive from returned lineitem (`l_returnflag='R'`);
    * refund/reason codes key off part/supplier so the two dictionary
    * joins hit different rows. Both dictionaries broadcast (never
    * shuffle); the fact side shuffles once on order_id. */
  def orderRefund(lineitem: DataFrame, orders: DataFrame,
                  dic: DataFrame): DataFrame = {
    val refundInfo = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_linenumber").as("id"), col("l_suppkey").as("user_id"),
        col("l_orderkey").as("order_id"), col("l_partkey").as("sku_id"),
        ((col("l_partkey") % 5) + 1).cast("string").as("refund_type_code"),
        ((col("l_suppkey") % 5) + 1).cast("string").as("refund_reason_type_code"),
        round(col("l_quantity"), 2).as("refund_num"),
        round(col("l_extendedprice"), 2).as("refund_amount"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("create_time"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("date_id"))
      .withColumn("refund_reason_txt",
        concat(lit("reason-"), col("refund_reason_type_code")))
    // order side: the CDC envelope reconstructed as in P4, filtered on
    // the reference's literal refund-pending status transition
    val envelope = orders.select(
      when(col("o_orderstatus") === "F", lit("update"))
        .otherwise(lit("insert")).as("type"),
      map(lit("id"), col("o_orderkey").cast("string"),
        lit("order_status"),
        when(col("o_orderstatus") === "F", lit("1005")).otherwise(lit("1001")),
        lit("province_id"),
        split_part(col("o_orderpriority"), lit("-"), lit(1))).as("data"),
      when(col("o_orderstatus") === "F",
        map(lit("order_status"), lit("1002"))).as("old"))
    val orderRefundSide = envelope
      .filter(col("type") === "update" &&
        col("data")("order_status") === "1005" &&
        col("old")("order_status").isNotNull)
      .select(col("data")("id").cast("long").as("oi_id"),
        col("data")("province_id").as("province_id"))
    val typeDic = broadcast(dic.select(col("dic_code").as("type_code"),
      col("dic_name").as("refund_type_name")))
    val reasonDic = broadcast(dic.select(col("dic_code").as("reason_code"),
      col("dic_name").as("refund_reason_type_name")))
    refundInfo
      .join(orderRefundSide, col("order_id") === col("oi_id"))
      .join(typeDic, col("refund_type_code") === col("type_code"))
      .join(reasonDic, col("refund_reason_type_code") === col("reason_code"))
      .select(col("id"), col("user_id"), col("order_id"), col("sku_id"),
        col("province_id"), col("date_id"), col("create_time"),
        col("refund_type_code"), col("refund_type_name"),
        col("refund_reason_type_code"), col("refund_reason_type_name"),
        col("refund_reason_txt"), col("refund_num"), col("refund_amount"))
      .orderBy(col("order_id"), col("id"))
  }

  /** `DwdTradePayDetailSuc` (`DwdTradePayDetailSuc.java:43-120`):
    * pay-success rows (P11's status filter) interval-joined to order
    * detail within a bounded retention window, then
    * dictionary-enriched. The reference bounds the join state at 905 s
    * of idle retention; the synthetic stream is ~4000× sparser than a
    * production order stream, so the bound maps to 24 h here — the
    * semantics (time-bounded state, linear in the slice width) are
    * identical. The interval join shuffles both sides on `user_id`
    * once; the dictionary broadcasts. */
  def payDetailSuc(events: DataFrame, dic: DataFrame): DataFrame = {
    val k = JsonFns.jsonField(col("props"), "k").cast("int")
    val payments = events
      .filter(col("event_type") === "purchase" && (k % 16) === 2)
      .select(col("event_id").as("pay_id"), col("user_id"),
        col("ts").as("pay_ts"), round(col("value"), 2).as("pay_amount"),
        ((k % 5) + 1).cast("string").as("payment_type"))
    val details = events
      .filter(col("event_type") === "view")
      .select(col("event_id").as("detail_id"), col("user_id").as("d_user"),
        col("ts").as("d_ts"), round(col("value"), 2).as("split_total_amount"))
    val payDic = broadcast(dic.select(col("dic_code"),
      col("dic_name").as("payment_type_name")))
    payments
      .join(details,
        col("user_id") === col("d_user") &&
          col("pay_ts") >= col("d_ts") &&
          col("pay_ts") <= col("d_ts") + expr("INTERVAL 24 HOURS"))
      .join(payDic, col("payment_type") === col("dic_code"))
      .select(col("detail_id"), col("pay_id"), col("user_id"),
        col("payment_type"), col("payment_type_name"),
        date_format(col("pay_ts"), "yyyy-MM-dd HH:mm:ss").as("callback_time"),
        col("pay_amount"), col("split_total_amount"))
      .orderBy(col("pay_id"), col("detail_id"))
  }

  /** `DwdTradeCartAdd` (`DwdTradeCartAdd.java:40-90`): keep inserts and
    * genuine quantity *increases* (`update` where the new sku_num
    * exceeds `old['sku_num']`), emit the delta — insert rows contribute
    * their full quantity, update rows the difference — then enrich the
    * source type from the dictionary. Envelope reconstructed from
    * events: every third event is an insert, the rest updates whose
    * prior quantity is `k - (event_id % 7) + 3`, so both branches of
    * the increase predicate are exercised. */
  def cartAdd(events: DataFrame, dic: DataFrame): DataFrame = {
    val k = JsonFns.jsonField(col("props"), "k").cast("int")
    val envelope = events
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_id") % 3 === 0, lit("insert"))
          .otherwise(lit("update")).as("type"),
        map(lit("sku_num"), k.cast("string"),
          lit("source_type"), ((col("event_id") % 5) + 1).cast("string")).as("data"),
        when(col("event_id") % 3 =!= 0,
          map(lit("sku_num"), (k - (col("event_id") % 7) + 3).cast("string"))).as("old"))
    val newNum = col("data")("sku_num").cast("int")
    val oldNum = col("old")("sku_num").cast("int")
    val srcDic = broadcast(dic.select(col("dic_code"),
      col("dic_name").as("source_type_name")))
    envelope
      .filter(col("type") === "insert" ||
        (col("type") === "update" && oldNum.isNotNull && newNum > oldNum))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("date_id"),
        when(oldNum.isNotNull, newNum - oldNum).otherwise(newNum).as("sku_num"),
        col("data")("source_type").as("source_type"))
      .join(srcDic, col("source_type") === col("dic_code"))
      .select(col("event_id"), col("user_id"), col("date_id"),
        col("sku_num"), col("source_type"), col("source_type_name"))
      .orderBy(col("event_id"))
  }

  /** `DwdInteractionComment` (`DwdInteractionComment.java:62-111`):
    * comment rows with the appraise code dictionary-decoded — the plain
    * detail-enrichment shape (filter → derive code → broadcast lookup)
    * with no old-map logic. */
  def commentDic(events: DataFrame, dic: DataFrame): DataFrame = {
    val k = JsonFns.jsonField(col("props"), "k").cast("int")
    val appraiseDic = broadcast(dic.select(col("dic_code"),
      col("dic_name").as("appraise_name")))
    events
      .filter(col("event_type") === "click" && col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"),
        ((k % 5) + 1).cast("string").as("appraise"),
        date_format(col("ts"), "yyyy-MM-dd").as("date_id"))
      .join(appraiseDic, col("appraise") === col("dic_code"))
      .select(col("event_id"), col("user_id"), col("appraise"),
        col("appraise_name"), col("date_id"))
      .orderBy(col("event_id"))
  }

  /** `DwdUserRegister` (`DwdUserRegister.java:55-79`): project the
    * user_info insert stream to (user_id, date_id, create_time) — the
    * register detail the DWS register window consumes. */
  def userRegister(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("date_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("create_time"))
      .orderBy(col("event_id"))

  /** `DwdToolCouponGet`/`Order`/`Pay` (`DwdToolCouponGet.java:62-63`,
    * `DwdToolCouponOrder.java:65-68`, `DwdToolCouponPay.java:65-67`):
    * the three coupon_use lifecycle filters over one envelope, union'd
    * with a phase tag. Envelope derived from orders: Open→insert
    * (get), Pending→update 1401→1402 (order), Finished→update with
    * used_time (pay); each filter matches exactly one branch, so the
    * union is a disjoint 3-way split of the table. */
  def couponPhases(orders: DataFrame): DataFrame = {
    val envelope = orders.select(
      col("o_orderkey").as("coupon_use_id"), col("o_custkey").as("user_id"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_id"),
      when(col("o_orderstatus") === "O", lit("insert"))
        .otherwise(lit("update")).as("type"),
      map(lit("coupon_status"),
        when(col("o_orderstatus") === "O", lit("1401"))
          .when(col("o_orderstatus") === "P", lit("1402"))
          .otherwise(lit("1403")),
        lit("used_time"),
        when(col("o_orderstatus") === "F",
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))).as("data"),
      when(col("o_orderstatus") === "P", map(lit("coupon_status"), lit("1401")))
        .when(col("o_orderstatus") === "F", map(lit("coupon_status"), lit("1402")))
        .as("old"))
    val get = envelope.filter(col("type") === "insert")
      .withColumn("phase", lit("get"))
    val order = envelope.filter(col("type") === "update" &&
      col("data")("coupon_status") === "1402" &&
      col("old")("coupon_status") === "1401")
      .withColumn("phase", lit("order"))
    val pay = envelope.filter(col("type") === "update" &&
      col("data")("used_time").isNotNull)
      .withColumn("phase", lit("pay"))
    get.unionByName(order).unionByName(pay)
      .select(col("phase"), col("coupon_use_id"), col("user_id"), col("date_id"))
      .orderBy(col("phase"), col("coupon_use_id"))
  }

  /** `DwdTrafficUniqueVisitorDetail`
    * (`DwdTrafficUniqueVisitorDetail.java:52-105`): keep session-start
    * page views (the reference's `last_page_id IS NULL` — here the
    * first event or a >30 min gap, the same sessionization rule as
    * `Sessionize`), then per-(mid, day) first-wins dedup with the
    * 24 h-TTL state mapped to the calendar-day partition. Both window
    * functions cluster on `user_id`, so HashPartitioning(user_id)
    * satisfies the (user_id, day) clustering too — ONE exchange for
    * the whole job. */
  def uniqueVisitorDetail(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val perDay = Window
      .partitionBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd"))
      .orderBy(col("ts"), col("event_id"))
    events
      .filter(col("event_type").isin("view", "click") && col("user_id").isNotNull)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .filter(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L)
      .withColumn("rn", row_number().over(perDay))
      .filter(col("rn") === 1)
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("date_id"),
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("visit_time"))
      .orderBy(col("user_id"), col("date_id"))
  }
}
