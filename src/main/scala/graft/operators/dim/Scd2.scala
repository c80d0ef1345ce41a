package graft.operators.dim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension builder: turn a stream of per-key versioned
  * change rows into validity intervals — every version gets
  * [valid_from, valid_to) with the successor's timestamp as its
  * exclusive end, and the latest version stays open (valid_to NULL,
  * is_current=1). This is the batch materialization of what the
  * reference's DIM layer keeps implicitly (Phoenix upserts retain
  * only the latest row — `DimSinkFunction.java`); an SCD2 table is
  * the auditable history a warehouse replacement should offer.
  *
  * One exchange on the business key + a per-key sort; `lead` is an
  * O(1)-state offset frame. Version order is (ts, version_id) — fully
  * tie-broken so equal-timestamp versions chain deterministically.
  *
  * The flagship query versions customer order state: business key =
  * o_custkey, version id = o_orderkey, tracked attributes = status
  * and priority. */
object Scd2 {

  /** Point-in-time (temporal) lookup against the SCD2 history: each
    * event joins the dim version VALID AT its timestamp — semantically
    * `valid_from <= ts < valid_to` with the open interval unbounded.
    * Implemented as the as-of kernel over the interval STARTS (the
    * interval end is redundant under gapless chaining — the r4 SCD2
    * builder's invariant, spec-pinned in BehaviorSpec), so the lookup
    * pays ONE key exchange and no range join, and inherits the as-of
    * tie rules for same-instant versions. Events before a key's first
    * version get NULLs (left outer). */
  def pointInTimeLookup(events: DataFrame, scd2: DataFrame): DataFrame = {
    val dim = scd2.select(col("o_custkey").as("k"),
      to_timestamp(col("valid_from"), "yyyy-MM-dd").as("vt"),
      col("o_orderkey"), col("o_orderstatus"))
    val left = events.select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.dwd.AsofJoin.asofJoin(left, dim,
        leftKey = "user_id", leftTs = "ts",
        rightKey = "k", rightTs = "vt",
        rightPayload = Seq("o_orderkey", "o_orderstatus"),
        rightTieBreak = "o_orderkey")
      .select(col("event_id"), col("user_id"),
        col("asof_o_orderkey").as("version_key"),
        col("asof_o_orderstatus").as("status_at_ts"))
  }

  def scd2Build(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_orderdate"))
      .withColumn("next_from", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderstatus"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        date_format(col("next_from"), "yyyy-MM-dd").as("valid_to"),
        when(col("next_from").isNull, 1).otherwise(0).as("is_current"))
  }
}
