package graft.operators.dws

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** Dim-enriched keyed trade windows (SURVEY §2.5 A2/A4).
  *
  * Reference shape (`DwsTradeUserSpuOrderWindow.java`,
  * `DwsTradeTrademarkCategoryUserRefundWindow.java`): dedup the
  * order-detail changelog, async-join dims, then a keyed 10 s tumbling
  * window with `sum(amount)` and an exact distinct order count kept as
  * a `Set` in the agg state. Spark twin: broadcast dim join →
  * `groupBy(window, keys).agg(sum, countDistinct)`. The reference
  * joins some dims before and some after the window; in Spark only the
  * dims whose outputs are group keys must be joined before the agg
  * (SURVEY §3.3) — here `part` provides the keys, so it joins first,
  * and being broadcast it adds no shuffle anyway.
  */
object TradeWindows {

  /** A2 — per (user, brand) daily window: order amount + exact
    * distinct order count (`DwsTradeUserSpuOrderWindow.java:175-205`). */
  def userSpuOrderWindow(lineitem: DataFrame, orders: DataFrame,
                         part: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(window(col("o_orderdate"), "1 day").as("w"),
        col("o_custkey").as("user_id"), col("p_brand"))
      .agg(round(sum(col("l_extendedprice")), 2).as("order_amount"),
        countDistinct(col("l_orderkey")).as("order_ct"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("user_id"), col("p_brand"), col("order_amount"), col("order_ct"))
      .orderBy("stt", "user_id", "p_brand")

  /** A4 — refund window per (brand, category): distinct refunded
    * orders (`DwsTradeTrademarkCategoryUserRefundWindow.java:102-126`);
    * the refund stream is the returnflag='R' slice of lineitem. */
  def refundWindow(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_partkey"), col("l_shipdate"))
      .join(part.select(col("p_partkey"), col("p_brand"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(window(col("l_shipdate"), "1 day").as("w"),
        col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_orderkey")).as("refund_order_ct"),
        count(lit(1)).as("refund_line_ct"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("p_brand"), col("p_type"), col("refund_order_ct"),
        col("refund_line_ct"))
      .orderBy("stt", "p_brand", "p_type")
}
