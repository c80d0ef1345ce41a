package graft.operators.dwd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** AS-OF join: for every left row, attach the single most recent right
  * row with `right.ts <= left.ts` on the same key (left-outer; rows
  * with no preceding match keep nulls).
  *
  * Beyond-reference relational completeness: the reference's Flink
  * topologies approximate this with TTL'd keyed state (latest dim
  * version per key); in a batch engine the naive formulations are a
  * range join (`l.key = r.key AND r.ts <= l.ts` then max-per-row —
  * O(|L|·|matches|) blow-up before the aggregate) or a per-row sorted
  * probe. Neither survives 100 TB.
  *
  * The scalable idiom used here is union-tag + running carry-forward:
  * tag both inputs, union them, sort each key's timeline once inside a
  * single hash-partitioned window, and carry the last non-null right
  * payload forward onto every left row. Cost is ONE shuffle on the key
  * (the same exchange any keyed join would pay) plus a per-key sort —
  * no pair explosion, no per-row probes, and the window is
  * `rowsBetween(unboundedPreceding, currentRow)` so Spark streams it
  * with O(1) state per key (a running `last`, not a buffered frame).
  *
  * Tie rules, pinned so results are deterministic and oracle-able:
  *  - a right row at exactly `left.ts` matches (inclusive as-of): right
  *    rows sort BEFORE left rows at equal ts via the tag;
  *  - among right rows with equal ts, the greatest `rightTieBreak`
  *    wins (they sort ascending; the running `last` keeps the latest).
  *
  * Right payload columns are returned as `asof_<name>`.
  *
  * Nulls contract: keys and timestamps are assumed NON-NULL (the
  * events/orders tables guarantee it). A null key would group with
  * other null keys inside the window — equi-JOIN semantics would drop
  * it instead — and a null right timestamp sorts first (acting as
  * -infinity). Callers with nullable keys/timestamps must filter them
  * ahead of the join, same as they would for any keyed-state kernel.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, leftTs: String,
               rightKey: String, rightTs: String,
               rightPayload: Seq[String],
               rightTieBreak: String): DataFrame = {
    val lCols = left.columns.toSeq
    val lRowT = StructType(lCols.map(left.schema(_)))
    val payT = StructType(rightPayload.map(right.schema(_)))
    val tieT = right.schema(rightTieBreak).dataType

    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"), lit(1).as("__tag"),
      lit(null).cast(tieT).as("__tie"),
      struct(lCols.map(col): _*).as("__lrow"),
      lit(null).cast(payT).as("__pay"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__t"), lit(0).as("__tag"),
      col(rightTieBreak).as("__tie"),
      lit(null).cast(lRowT).as("__lrow"),
      struct(rightPayload.map(col): _*).as("__pay"))

    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__tag").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(lCols.map(c => col(s"__lrow.$c").as(c)) ++
        rightPayload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Last-touch attribution over the events stream: every purchase is
    * attributed to the user's most recent preceding (or simultaneous)
    * click. Emits the attribution edge plus the exact microsecond gap.
    * This is the as-of join's flagship query — time-interleaved rows of
    * the SAME table on both sides, so carry-forward ordering and tie
    * rules are genuinely exercised. */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    asofJoin(purchases, clicks,
      leftKey = "user_id", leftTs = "ts",
      rightKey = "user_id", rightTs = "ts",
      rightPayload = Seq("event_id", "ts", "value"),
      rightTieBreak = "event_id")
      .select(col("event_id"), col("user_id"),
        col("asof_event_id").as("asof_click_id"),
        round(col("asof_value"), 4).as("click_value"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
  }

  /** Reference (test-only) formulation: range join + keep-latest
    * aggregate. Quadratic in matches per key — exists solely so specs
    * can prove the scalable path computes identical rows. */
  private[graft] def asofViaRangeJoin(left: DataFrame, right: DataFrame,
                                      leftKey: String, leftTs: String,
                                      rightKey: String, rightTs: String,
                                      rightPayload: Seq[String],
                                      rightTieBreak: String): DataFrame = {
    val lCols = left.columns.toSeq
    val r = right.select(
      col(rightKey).as("__rk"), col(rightTs).as("__rt"),
      col(rightTieBreak).as("__tie"),
      struct(rightPayload.map(col): _*).as("__pay"))
    // partition by a per-ROW id, not the left columns: two identical
    // left rows must each keep their own match (the production path
    // preserves row multiplicity; partitioning by value would collapse
    // duplicates and fail parity against a correct result)
    val withId = left.withColumn("__rowid", monotonically_increasing_id())
    val w = Window.partitionBy(col("__rowid"))
      .orderBy(col("__rt").desc_nulls_last, col("__tie").desc_nulls_last)
    withId.join(r, col(leftKey) === col("__rk") &&
        col("__rt") <= col(leftTs), "left")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(lCols.map(col) ++
        rightPayload.map(c => col(s"__pay.$c").as(s"asof_$c")): _*)
  }
}
