package graft.operators.dws

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** Per-province windowed order aggregate — the flagship end-to-end slice.
  *
  * Reference: `DwsTradeProvinceOrderWindow.java` — last-wins dedup of the
  * order-detail changelog (`:86-121`), async province dim join
  * (`:171-182`), then a keyed 10 s tumbling window summing order amount
  * and exact-distinct-counting order ids (`:146-166`).
  *
  * Spark re-expression over the driver tables (FIXTURES.md §2 mapping:
  * lineitem ≈ order_detail, orders ≈ order_info, nation ≈ base_province):
  * inner join on the order key, broadcast dim join to nation, 1-day
  * tumbling window on the order date, `sum` + `count(distinct)`.
  *
  * Scale notes (100 TB posture): the lineitem⋈orders join shuffles on
  * the order key once; nation is broadcast (25 rows, bounded — the
  * only hard `broadcast()` hint). The customer side is fact-scaled, so
  * it carries NO hint: Catalyst auto-broadcasts it while it fits
  * `autoBroadcastJoinThreshold` (it does at test SFs — asserted in
  * PlanSpec) and degrades to a shuffle join beyond, instead of OOMing
  * the driver on a forced broadcast. Partial aggregation
  * (HashAggregate partial→final) halves shuffle volume before the
  * groupBy exchange; the exact distinct is per (window, province)
  * group — for a 100 TB run the documented swap is
  * `approx_count_distinct` (SURVEY §2.5 note).
  */
object ProvinceOrderWindow {

  private def build(lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, nation: DataFrame,
                    orderCount: org.apache.spark.sql.Column): DataFrame = {
    val dim =
      customer.select("c_custkey", "c_nationkey")
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("province_name"))
    lineitem
      .select("l_orderkey", "l_extendedprice")
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(window(col("o_orderdate"), "1 day").as("w"), col("province_name"))
      .agg(
        round(sum(col("l_extendedprice")), 2).as("order_amount"),
        orderCount.as("order_count"))
      .select(
        TimeFns.stt(col("w")).as("stt"),
        TimeFns.edt(col("w")).as("edt"),
        col("province_name"), col("order_amount"), col("order_count"))
      .orderBy("stt", "province_name")
  }

  /** lineitem ⋈ orders ⋈ broadcast(customer ⋈ nation) → windowed agg. */
  def apply(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
            nation: DataFrame): DataFrame =
    build(lineitem, orders, customer, nation,
      countDistinct(col("l_orderkey")))

  /** The 100 TB variant (SURVEY §2.5 note): the same plan with
    * `approx_count_distinct` (HyperLogLog++) replacing the exact
    * distinct — the documented swap once per-group distinct sets stop
    * fitting in agg state. `rsd` buys accuracy with sketch WIDTH, and
    * the width is the whole cost: measured at sf0.1, rsd 1.5% (8k
    * registers/group) ran 3.55 s vs the exact form's 1.81 s, while
    * rsd 5% (the Spark default, 512 registers) ran 1.64 s — FASTER
    * than exact. Accuracy bound asserted in `DwsJobSpec`. */
  def approx(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
             nation: DataFrame, rsd: Double = 0.05): DataFrame =
    build(lineitem, orders, customer, nation,
      approx_count_distinct(col("l_orderkey"), rsd))

  /** DuckDB oracle twin (driver runs this on the same parquet dir). */
  val oracle: String =
    """SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d %H:%M:%S') AS stt,
      |       strftime(date_trunc('day', o_orderdate) + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS edt,
      |       n_name AS province_name,
      |       round(sum(l_extendedprice), 2) AS order_amount,
      |       count(DISTINCT l_orderkey) AS order_count
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 3""".stripMargin
}
