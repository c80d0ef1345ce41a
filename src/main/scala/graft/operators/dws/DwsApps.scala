package graft.operators.dws

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeFns
import graft.operators.state.Dedup

/** Whole-job compositions of the reference's remaining DWS-layer
  * window apps. Each is the batch form of one complete Flink job:
  * per-user state flags become user-partitioned window functions, the
  * global `windowAll` becomes a parallel partial→final aggregate, and
  * post-aggregation dim lookups broadcast (the same hoist past the
  * window that `ComposedJobs.userSpuOrderJob` documents).
  */
object DwsApps {

  /** `DwsUserUserRegisterWindow` (`DwsUserUserRegisterWindow.java:77-97`):
    * count registrations per 10 s tumbling event-time window. The
    * reference's parallelism-1 `windowAll` reduce is a partial→final
    * hash aggregate here — no single-task bottleneck at scale. */
  def registerWindow(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "signup")
      .groupBy(window(col("ts"), "10 seconds").as("w"))
      .agg(count(lit(1)).as("register_ct"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("register_ct"))
      .orderBy("stt")

  /** `DwsTradeCartAddUuWindow` (`DwsTradeCartAddUuWindow.java:82-141`):
    * per-user first-cart-add-of-day (the reference's `lastCartAddState`
    * date compare) → 10 s window unique-user count. One exchange on
    * user_id for the flag, one on the window key for the count. */
  def cartAddUuWindow(events: DataFrame): DataFrame = {
    val perDay = Window
      .partitionBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd"))
      .orderBy(col("ts"), col("event_id"))
    events
      .filter(col("event_type") === "click" && col("user_id").isNotNull)
      .withColumn("rn", row_number().over(perDay))
      .filter(col("rn") === 1)
      .groupBy(window(col("ts"), "10 seconds").as("w"))
      .agg(count(lit(1)).as("cart_add_uu_ct"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("cart_add_uu_ct"))
      .orderBy("stt")
  }

  /** `DwsTradeOrderWindow` (`DwsTradeOrderWindow.java:53-196`): dedup
    * the detail changelog first-wins on detail id (5 s TTL → exact
    * first), flag each user's first order of the day and first order
    * ever from `lastOrderDtState`, then the global window summing
    * unique/new user counts and the three amounts. The per-user flags
    * and the (orderkey-clustered) dedup are computed in one pass each;
    * amounts map to the testdata price model: activity reduction =
    * price×discount, coupon reduction = price×tax, original amount =
    * the extended price. */
  def orderWindow(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val detail = Dedup.firstWins(
      lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .repartition(col("l_orderkey")),
      Seq("l_orderkey", "l_linenumber"),
      Seq(col("l_extendedprice").asc, col("l_discount").asc, col("l_tax").asc))
    val joined = detail
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .withColumn("cur_date", date_format(col("o_orderdate"), "yyyy-MM-dd"))
    val perUserDay = Window.partitionBy(col("o_custkey"), col("cur_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
    val perUser = Window.partitionBy(col("o_custkey"))
    // amounts sum in exact integer cents: price×rate products carry
    // many decimals, and a floating sum's last ulp differs between
    // engines by summation order — 2-decimal rounding of the raw sum is
    // boundary-flaky (observed 16/2399 rows flipping a cent vs DuckDB)
    def cents(c: org.apache.spark.sql.Column) =
      round(c * 100).cast("long")
    joined
      .withColumn("rn", row_number().over(perUserDay))
      .withColumn("first_date", min(col("cur_date")).over(perUser))
      .groupBy(col("cur_date"))
      .agg(
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("order_uu_ct"),
        sum(when(col("rn") === 1 && col("cur_date") === col("first_date"), 1L)
          .otherwise(0L)).as("order_new_ct"),
        round(sum(cents(col("l_extendedprice") * col("l_discount"))) / 100.0, 2)
          .as("activity_reduce_amount"),
        round(sum(cents(col("l_extendedprice") * col("l_tax"))) / 100.0, 2)
          .as("coupon_reduce_amount"),
        round(sum(cents(col("l_extendedprice"))) / 100.0, 2)
          .as("original_total_amount"))
      .orderBy("cur_date")
  }

  /** `DwsTradeTrademarkCategoryUserRefundWindow`
    * (`DwsTradeTrademarkCategoryUserRefundWindow.java:65-160`): refund
    * rows keyed (user, trademark, category) with a per-window distinct
    * order count. The reference joins DIM_SKU_INFO per ROW before the
    * window (tm_id/category3_id are group keys — that join must stay
    * pre-aggregation) and then three name dims per GROUP after it;
    * here the sku dim broadcasts pre-agg and the name dims broadcast
    * post-agg against ~|groups| rows, the same hoist userSpuOrderJob
    * documents. Daily windows (orders carry dates, not times). */
  def tmCatUserRefundWindow(lineitem: DataFrame, orders: DataFrame,
                            part: DataFrame): DataFrame = {
    val sku = broadcast(part.select(col("p_partkey"),
      col("p_brand").as("trademark_id"), col("p_type").as("category_id")))
    val agg = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(sku, col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("cur_date"),
        col("o_custkey").as("user_id"),
        col("trademark_id"), col("category_id"))
      .agg(countDistinct(col("l_orderkey")).as("refund_ct"))
    val tmDim = broadcast(part
      .select(col("p_brand").as("tm_key"),
        regexp_replace(col("p_brand"), "Brand#", "TM-").as("trademark_name"))
      .distinct())
    val catDim = broadcast(part
      .select(col("p_type").as("cat_key"),
        upper(split_part(col("p_type"), lit(" "), lit(1))).as("category_name"))
      .distinct())
    agg
      .join(tmDim, col("trademark_id") === col("tm_key"))
      .join(catDim, col("category_id") === col("cat_key"))
      .select(col("cur_date"), col("user_id"), col("trademark_id"),
        col("trademark_name"), col("category_id"), col("category_name"),
        col("refund_ct"))
      .orderBy(col("cur_date"), col("user_id"), col("trademark_id"),
        col("category_id"))
  }
}
