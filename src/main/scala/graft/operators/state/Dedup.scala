package graft.operators.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog dedup kernels (SURVEY §2.5 A7/A8).
  *
  * The reference dedups re-emitted changelog rows with keyed
  * `ValueState`: first-wins keeps the first row per key (TTL 5 s,
  * `DwsTradeOrderWindow.java:84-108`); last-wins keeps the row with the
  * max `row_op_ts`, flushed by a 5 s timer
  * (`DwsTradePaymentSucWindow.java:85-121`).
  *
  * Batch twin: `row_number()` over a key partition with a TOTAL order
  * (the caller must supply a tie-breaking order) — deterministic,
  * unlike `dropDuplicates`, whose survivor depends on partitioning.
  * The analytic window shuffles once on the key — the same exchange
  * the streaming form pays for `keyBy`, so the plan scales identically.
  * Streaming twin: `graft.streaming.StatefulStreams.firstWinsStream`
  * (flatMapGroupsWithState).
  */
object Dedup {

  /** A7 — keep the FIRST row per key under `order` (ascending). */
  def firstWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    pick(df, keys, order)

  /** A8 — keep the LAST row per key: pass descending order columns
    * (the `row_op_ts` max + tie-break). */
  def lastWins(df: DataFrame, keys: Seq[String], orderDesc: Seq[Column]): DataFrame =
    pick(df, keys, orderDesc)

  private def pick(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")
}
