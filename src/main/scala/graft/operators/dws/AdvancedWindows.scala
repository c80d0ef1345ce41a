package graft.operators.dws

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** Windowing capabilities beyond the reference's fixed 10 s tumble
  * (the reference has no sliding/session windows or rollups —
  * SURVEY §2.6/§2.8 — but an engine replacing it should): native
  * `session_window`, sliding `window`, and `rollup` aggregates.
  */
object AdvancedWindows {

  /** Gap-based session windows (native `session_window`, 30 min gap):
    * per-user sessions with bounds and event counts — the declarative
    * form of the CEP sessionization kernel. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("ev_ct"),
        round(sum(col("value")), 2).as("val_sum"))
      .select(
        TimeFns.stt(col("w")).as("stt"),
        TimeFns.edt(col("w")).as("edt"),
        col("user_id"), col("ev_ct"), col("val_sum"))

  /** Sliding (hopping) windows: 1 h length, 30 min slide — each event
    * lands in exactly two windows. */
  def slidingWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("ev_ct"),
        countDistinct(col("user_id")).as("uu_ct"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("ev_ct"), col("uu_ct"))
      .orderBy("stt")

  /** ROLLUP over the snowflake dims: (region, brand) → region → grand
    * total; subtotal rows labeled via `grouping()` so genuine NULL
    * group values can never collide with rollup totals. */
  def regionBrandRollup(lineitem: DataFrame, part: DataFrame,
                        supplier: DataFrame, nation: DataFrame,
                        region: DataFrame): DataFrame =
    graft.operators.dwd.Joins
      .snowflakeBase(lineitem, part, supplier, nation, region)
      .rollup(col("r_name"), col("p_brand"))
      .agg(count(lit(1)).as("line_ct"),
        round(sum(col("l_extendedprice")), 2).as("amount_sum"),
        grouping(col("r_name")).as("__gr"),
        grouping(col("p_brand")).as("__gb"))
      .select(
        when(col("__gr") === 1, lit("ALL"))
          .otherwise(coalesce(col("r_name"), lit("NULL"))).as("r_name"),
        when(col("__gb") === 1, lit("ALL"))
          .otherwise(coalesce(col("p_brand"), lit("NULL"))).as("p_brand"),
        col("line_ct"), col("amount_sum"))
      .orderBy("r_name", "p_brand")

  /** Trailing event-time RANGE window: per-customer rolling 7-day order
    * count and spend attached to every order row — the "rolling
    * retention/LTV" shape that tumbling windows can't express (each
    * row's frame is anchored at its OWN timestamp, not a grid).
    *
    * Spark evaluates this as one hash exchange on the key + per-key
    * sort; the frame is `rangeBetween` on epoch seconds so the
    * 7-day bound is exact arithmetic (UTC, no DST ambiguity). Frames
    * are re-accumulated left-to-right as bounds advance — no
    * retract-subtraction drift. At 100 TB this is the same shape as
    * any keyed window: scales with key cardinality, hot keys bounded
    * by their 7-day row count. */
  def trailingOrderWindow(orders: DataFrame, days: Int = 7): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-days.toLong * 86400L, 0L)
    orders.select(col("o_orderkey"), col("o_custkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
      count(lit(1)).over(w).as("trailing_ct"),
      round(sum(col("o_totalprice")).over(w), 2).as("trailing_sum"))
  }

  /** Trailing DISTINCT count over an event-time RANGE frame — Spark
    * has no COUNT(DISTINCT) window function, so the frame's values are
    * collected and deduplicated per row (`collect_list` →
    * `array_distinct` → `size`): identical semantics to the native
    * DISTINCT window aggregate the oracle engine runs. Frame size
    * bounds the per-row array (7 days of one customer's orders), so
    * the buffered frame stays small; a wide-frame variant would switch
    * to an HLL sketch column (the documented approx swap family). The
    * frame also carries min(o_orderkey) — NOT first_value, whose
    * result depends on intra-tie row order inside a RANGE frame and
    * would be nondeterministic across engines. */
  def trailingDistinctWindow(orders: DataFrame, days: Int = 7): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-days.toLong * 86400L, 0L)
    orders.select(col("o_orderkey"), col("o_custkey"),
      size(array_distinct(collect_list(col("o_orderpriority")).over(w)))
        .as("distinct_prio"),
      min(col("o_orderkey")).over(w).as("min_key_in_window"))
  }

  /** The statistical-aggregate surface per group: exact interpolated
    * median, sample stddev, and Pearson correlation — rounded where
    * float accumulation order can differ between engines (stddev to
    * 2 dp at ~1e5 magnitude, corr to 6 dp on [-1,1]; median of an
    * explicitly rounded input is exact). */
  def statsAggregates(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("ct"),
        round(expr("percentile(round(o_totalprice, 2), 0.5)"), 2)
          .as("median_price"),
        round(stddev_samp(col("o_totalprice")), 2).as("stddev_price"),
        round(corr(col("o_totalprice"), col("o_custkey")), 6)
          .as("corr_price_cust"))
      .orderBy("o_orderstatus")

  /** PIVOT: order counts and spend by month × status, one output row
    * per month with a column pair per status. `Dataset.pivot` with an
    * EXPLICIT value list — the implicit form runs a distinct-values
    * job first and makes the schema data-dependent; pinning the list
    * keeps the plan one pass and the schema stable (and is the only
    * scalable form: a pivot over unbounded distinct values is a
    * schema explosion, not a plan). */
  def statusPivot(orders: DataFrame): DataFrame =
    orders
      .groupBy(month(col("o_orderdate")).as("month"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)).as("ct"),
        round(sum(round(col("o_totalprice"), 2)), 2).as("sum"))
      // Dataset.pivot leaves an EMPTY cell's count NULL (the cell's
      // aggregate never ran), unlike a FILTER aggregate's 0 — pin the
      // count-of-nothing-is-zero semantics explicitly so a fixture
      // with a vacant month×status cell can't diverge from the oracle
      .select(col("month"),
        coalesce(col("O_ct"), lit(0L)).as("O_ct"), col("O_sum"),
        coalesce(col("F_ct"), lit(0L)).as("F_ct"), col("F_sum"),
        coalesce(col("P_ct"), lit(0L)).as("P_ct"), col("P_sum"))
      .orderBy("month")

  /** The analytic-window-function surface in one query: rank family,
    * offsets, distribution functions and ntile over a per-customer
    * order timeline — the coverage query proving each function's
    * tie/frame/precision semantics match the oracle engine's.
    * percent_rank/cume_dist are rounded to 6 dp (exact rationals —
    * the division is the only float op). */
  def analyticFunctions(orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(
      col("o_custkey"), col("o_orderkey"),
      row_number().over(w).as("rn"),
      rank().over(w.orderBy(col("o_orderpriority"), col("o_orderkey")))
        .as("prio_rank"),
      dense_rank().over(w.orderBy(col("o_orderpriority"))).as("prio_dense"),
      lag(col("o_orderkey"), 1).over(w).as("prev_key"),
      lead(col("o_orderkey"), 1).over(w).as("next_key"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  /** Explicit GROUPING SETS — the general form under CUBE/ROLLUP:
    * {(status, priority), (status), (month)} in ONE aggregate pass
    * (Expand, not three scans), subtotal rows labeled via grouping()
    * so genuine NULLs can't collide with set markers. */
  def orderGroupingSets(orders: DataFrame): DataFrame =
    // month must be a NAMED column before grouping: an expression in
    // the sets list doesn't unify with an aliased grouping column, so
    // the set silently groups without projecting the value
    orders.withColumn("month", month(col("o_orderdate")))
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")),
          Seq(col("month"))),
        col("o_orderstatus"), col("o_orderpriority"), col("month"))
      .agg(count(lit(1)).as("ct"),
        round(sum(round(col("o_totalprice"), 2)), 2).as("total"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        grouping(col("month")).cast("int").as("g_month"))

  /** UNPIVOT (melt): wide measure columns → (measure, value) rows —
    * the inverse of pivot, and the narrow-format feed for
    * measure-generic downstream aggregates. `Dataset.unpivot` is a
    * single Expand pass (rows × |measures|, no shuffle); values are
    * rounded to 2 dp AFTER the melt so the oracle's UNION ALL replay
    * is bit-identical. */
  def lineitemUnpivot(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "measure",
        valueColumnName = "v")
      .select(col("l_orderkey"), col("l_linenumber"), col("measure"),
        round(col("v"), 2).as("value"))

  /** Time-series resampling with forward fill: per user, an hourly
    * boundary grid spanning [floor_hour(min ts), floor_hour(max ts)],
    * each boundary carrying the last event value at-or-before it
    * (null only at a leading boundary with no prior event).
    *
    * Built by COMPOSITION: grid generation (sequence + explode — a
    * narrow, per-key expression) feeding the as-of join's union-tag
    * carry-forward, so filling pays exactly one key exchange and
    * inherits the as-of tie rules. This is the standard gap-filling /
    * downsampling primitive for feature pipelines ("value of every
    * signal at every hour"). */
  def resampleFfill(events: DataFrame): DataFrame = {
    val grid = events.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("mn"),
        date_trunc("hour", max(col("ts"))).as("mx"))
      .select(col("user_id"), explode(
        sequence(col("mn"), col("mx"),
          org.apache.spark.sql.functions.expr("interval 1 hour"))).as("h"))
    val obs = events.select(col("event_id"), col("user_id"), col("ts"),
      col("value"))
    graft.operators.dwd.AsofJoin.asofJoin(grid, obs,
        leftKey = "user_id", leftTs = "h",
        rightKey = "user_id", rightTs = "ts",
        rightPayload = Seq("event_id", "value"),
        rightTieBreak = "event_id")
      .select(col("user_id"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("asof_event_id").as("src_event_id"),
        round(col("asof_value"), 4).as("ffill_value"))
  }

  /** Truncated exponentially-weighted moving average over a keyed,
    * ordered series: ewma_t ≈ Σ_{j<k} (1−α)^j·x_{t−j} normalized by
    * the present weights (so leading rows with < k history are exact,
    * not damped toward zero). The truncation makes the recursive
    * definition a FIXED lag chain — one window pass, k `lag` reads in
    * a single frame, no recursion and no per-row variable-length
    * state, so at 100 TB it costs exactly one exchange on the
    * partition keys like any other analytic window. The dropped tail
    * carries weight (1−α)^k (< 0.4 % at α=0.5, k=8). α defaults to
    * 0.5: the weights are exact binary fractions, so the arithmetic
    * is bit-stable across engines before the final rounding. */
  def ewma(df: DataFrame, partCols: Seq[String], orderCol: String,
           valueCol: String, alpha: Double = 0.5, k: Int = 8): DataFrame = {
    require(k >= 1 && alpha > 0 && alpha <= 1, "ewma: need k>=1, 0<alpha<=1")
    val w0 = Window.orderBy(col(orderCol))
    val w = if (partCols.isEmpty) w0
      else Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
    val lags = (1 until k).foldLeft(df.withColumn("lag_0", col(valueCol))) {
      (d, j) => d.withColumn(s"lag_$j", lag(col(valueCol), j).over(w))
    }
    val terms = (0 until k).map(j =>
      when(col(s"lag_$j").isNotNull,
        col(s"lag_$j") * lit(math.pow(1 - alpha, j))).otherwise(lit(0.0)))
    val weights = (0 until k).map(j =>
      when(col(s"lag_$j").isNotNull, lit(math.pow(1 - alpha, j)))
        .otherwise(lit(0.0)))
    lags.withColumn("ewma",
        round(terms.reduce(_ + _) / weights.reduce(_ + _), 4))
      .drop((0 until k).map(j => s"lag_$j"): _*)
  }

  /** Rolling z-score anomaly detection: each point scored against the
    * TRAILING window's mean/stddev EXCLUDING itself (ROWS n PRECEDING
    * TO 1 PRECEDING — scoring a point against a window containing it
    * dilutes exactly the anomalies being hunted). z is null until the
    * window holds ≥ 2 points (stddev undefined); `is_anomaly` flags
    * |z| > threshold. One window pass, one exchange on the keys. */
  def rollingZscore(df: DataFrame, partCols: Seq[String], orderCol: String,
                    valueCol: String, n: Int = 8,
                    threshold: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(orderCol)).rowsBetween(-n, -1)
    // zero-variance guard (ANSI mode: x/0 throws, and an infinite z
    // would be ill-defined anyway): z is null when the baseline is
    // flat, and the flag has its own clause for that regime — a point
    // that DEVIATES from a constant baseline is the clearest anomaly
    // there is, it must not slip through as "z undefined"
    df.withColumn("roll_mean", avg(col(valueCol)).over(w))
      .withColumn("roll_std", stddev_samp(col(valueCol)).over(w))
      .withColumn("z", round(
        when(col("roll_std") > 0,
          (col(valueCol) - col("roll_mean")) / col("roll_std")), 4))
      .withColumn("is_anomaly",
        coalesce(col("z").isNotNull && abs(col("z")) > lit(threshold),
          lit(false)) ||
          coalesce(col("roll_std") === 0 &&
            col(valueCol) =!= col("roll_mean"), lit(false)))
      .drop("roll_mean", "roll_std")
  }
}
