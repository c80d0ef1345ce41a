package graft.operators.dws

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series diagnostics over daily aggregates of the fact tables —
  * seasonality, autocorrelation and changepoint detection. All three
  * run on a DAILY series derived from the fact scan, which makes the
  * 100 TB posture uniform: the heavy work is ONE map-side-combined
  * aggregate over the fact (days × keys output, tiny), and the series
  * math that follows runs on a frame bounded by calendar days
  * (365/year — a few thousand rows regardless of fact size), so the
  * single-task analytic windows on the series are a bounded contract,
  * not a scalability hole. Every kernel keeps sums in BIGINT until
  * the final division, so the results are bit-stable across engines
  * (integer sufficient statistics — the same trick as the fixed-point
  * PageRank, `graph/PageRank.scala`).
  */
object TimeSeries {

  /** Day-of-week seasonality index of daily revenue: for each of the
    * 7 weekday slots, the ratio of that slot's mean daily revenue to
    * the overall mean daily revenue (index 1.0 = no seasonal effect).
    * The weekday is computed as `datediff(day, 1970-01-01) % 7` —
    * pure integer arithmetic (slot 0 = Thursday), immune to engine
    * locale/week-start conventions. One fact aggregate, then a 7-row
    * frame; the over-() totals are derived from the 7 per-slot sums,
    * not a second scan. */
  def seasonalityIndex(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("bigint")).as("rev"))
    val perDow = daily
      .withColumn("dow", (datediff(col("day"), lit("1970-01-01")) % 7)
        .cast("int"))
      .groupBy("dow")
      .agg(count(lit(1)).as("day_ct"), sum("rev").as("rev_sum"))
    val wAll = Window.partitionBy() // 7 rows — bounded by the calendar
    perDow
      .withColumn("tot_sum", sum("rev_sum").over(wAll))
      .withColumn("tot_ct", sum("day_ct").over(wAll))
      .select(
        col("dow"), col("day_ct"),
        round(col("rev_sum").cast("double") / col("day_ct"), 2)
          .as("avg_rev"),
        round((col("rev_sum").cast("double") / col("day_ct")) /
              (col("tot_sum").cast("double") / col("tot_ct")), 6)
          .as("seasonal_idx"))
      .orderBy("dow")
  }

  /** Lag-1..maxLag autocorrelation of the daily shipped-quantity
    * series. Pairs (x_t, x_{t-j}) are materialized with one window
    * pass (j lag columns) and reshaped to long form with one explode,
    * so all lags share a single aggregate. Pearson r is computed from
    * six integer sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy² —
    * all BIGINT-exact, summation-order-free, each under 2^53 so
    * exactly representable as a double); the PRODUCTS in the final
    * formula are taken in DOUBLE — n·Σy² overflows BIGINT well before
    * the sums do (the same audit as `ml/Regression`) — and the oracle
    * replays the identical double expression tree, so the value is
    * bit-stable before the 6-dp rounding. */
  def autocorrelation(lineitem: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "autocorrelation: need maxLag >= 1")
    val daily = lineitem
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(col("l_quantity").cast("bigint")).as("x"))
    val w = Window.orderBy("day") // the daily series — bounded frame
    val lagged = (1 to maxLag).foldLeft(daily) { (d, j) =>
      d.withColumn(s"y_$j", lag(col("x"), j).over(w))
    }
    val pairs = lagged
      .select(col("x"), explode(array((1 to maxLag).map(j =>
        struct(lit(j).as("lg"), col(s"y_$j").as("y"))): _*)).as("p"))
      .select(col("p.lg").as("lag"), col("x"), col("p.y").as("y"))
      .filter(col("y").isNotNull)
    val stats = pairs.groupBy("lag").agg(
      count(lit(1)).as("n_pairs"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    def d(c: String) = col(c).cast("double")
    stats.select(
        col("lag"), col("n_pairs"),
        round(
          (d("n_pairs") * d("sxy") - d("sx") * d("sy")) /
          sqrt((d("n_pairs") * d("sxx") - d("sx") * d("sx")) *
               (d("n_pairs") * d("syy") - d("sy") * d("sy"))), 6)
          .as("autocorr"))
      .orderBy("lag")
  }

  /** Holt linear-trend (double-exponential) smoothing and forecast of
    * the daily revenue series per order priority — the trend-aware
    * step beyond [[ewma]]'s single smoothing. The recurrence
    * (Holt 1957; Hyndman & Athanasopoulos, "Forecasting" §8.2)
    *
    *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},  l_1 = y_1, b_1 = 0
    *
    * is inherently sequential, so it runs as ONE ordered fold per key
    * over the day-sorted series (`aggregate` HOF on the collected
    * daily array — bounded by calendar days, the module's uniform
    * contract; the heavy fact scan is the daily aggregate feeding
    * it). α = 1/2 and β = 1/4 are exactly-representable dyadics and
    * the inputs are integer cents, so every intermediate is a dyadic
    * rational both engines compute bit-identically — the oracle
    * replays the fold as a per-key recursive CTE with the SAME
    * parenthesization and matches before rounding. Emits final state
    * + 1/7-step forecasts (ŷ_{n+h} = l_n + h·b_n) per key. */
  def holtForecast(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(col("o_orderpriority").as("grp"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("bigint"))
        .as("cents"))
    val series = daily
      .groupBy("grp")
      .agg(sort_array(collect_list(struct(col("day"), col("cents"))))
        .as("pts"))
    val folded = series.select(col("grp"), size(col("pts")).as("n_days"),
      aggregate(col("pts"),
        struct(lit(0L).as("n"), lit(0.0).as("l"), lit(0.0).as("b")),
        (acc, e) => {
          val y = e.getField("cents").cast("double")
          val lt = lit(0.5) * y + lit(0.5) *
            (acc.getField("l") + acc.getField("b"))
          struct(
            (acc.getField("n") + 1).as("n"),
            when(acc.getField("n") === 0, y).otherwise(lt).as("l"),
            when(acc.getField("n") === 0, lit(0.0))
              .otherwise(lit(0.25) * (lt - acc.getField("l")) +
                lit(0.75) * acc.getField("b")).as("b"))
        }).as("st"))
    folded.select(col("grp"), col("n_days"),
        round(col("st.l"), 4).as("level_4"),
        round(col("st.b"), 4).as("trend_4"),
        round(col("st.l") + col("st.b"), 4).as("fc_1"),
        round(col("st.l") + lit(7.0) * col("st.b"), 4).as("fc_7"))
      .orderBy("grp")
  }

  /** Additive Holt–Winters (triple exponential smoothing, Winters
    * 1960) per order priority over the daily revenue series, weekly
    * seasonality (p = 7):
    *
    *   l_t = α·(y_t − s_{c_t}) + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   s_{c_t} ← γ·(y_t − l_t) + (1−γ)·s_{c_t},   c_t = slot(day) mod 7
    *
    * with l_1 = y_1, b_1 = 0, s ≡ 0 — the t = 1 seasonal update is
    * vacuous (y_1 − l_1 = 0), so the uniform recurrence applies from
    * t = 2. α = 1/2, β = γ = 1/4 are exactly-representable dyadics
    * over integer-cent inputs, so every intermediate is a dyadic
    * rational both engines compute bit-identically — the oracle
    * replays the fold as a recursive CTE carrying the 7 seasonal
    * slots as columns, SAME parenthesization. The slot is
    * `datediff(day, epoch) % 7` (pure integer, locale-free — the
    * `seasonalityIndex` convention). Like `holtForecast`, the fold is
    * inherently sequential and runs per key over the collected daily
    * array — bounded by calendar days, the module's uniform contract.
    * Emits final state + the h = 1 and h = 7 forecasts
    * ŷ_{n+h} = l_n + h·b_n + s_{slot(n+h)} (h = 7 reuses day-n's
    * slot; h = 1 uses the next day's). */
  def holtWintersForecast(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(col("o_orderpriority").as("grp"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("bigint"))
        .as("cents"))
      .withColumn("slot",
        (datediff(col("day"), lit("1970-01-01")) % 7).cast("int"))
    val series = daily
      .groupBy("grp")
      .agg(sort_array(collect_list(
        struct(col("day"), col("slot"), col("cents")))).as("pts"))
    val zeros7 = array(Seq.fill(7)(lit(0.0)): _*)
    val folded = series.select(col("grp"), size(col("pts")).as("n_days"),
      element_at(col("pts"), -1).getField("slot").as("last_slot"),
      aggregate(col("pts"),
        struct(lit(0L).as("n"), lit(0.0).as("l"), lit(0.0).as("b"),
          zeros7.as("s")),
        (acc, e) => {
          val y = e.getField("cents").cast("double")
          val c = e.getField("slot")
          val sc = element_at(acc.getField("s"), c + 1)
          val lt = when(acc.getField("n") === 0, y)
            .otherwise(lit(0.5) * (y - sc) +
              lit(0.5) * (acc.getField("l") + acc.getField("b")))
          val bt = when(acc.getField("n") === 0, lit(0.0))
            .otherwise(lit(0.25) * (lt - acc.getField("l")) +
              lit(0.75) * acc.getField("b"))
          val st = lit(0.25) * (y - lt) + lit(0.75) * sc
          struct(
            (acc.getField("n") + 1).as("n"),
            lt.as("l"), bt.as("b"),
            transform(acc.getField("s"),
              (v, idx) => when(idx === c, st).otherwise(v)).as("s"))
        }).as("st"))
    folded.select(col("grp"), col("n_days"),
        round(col("st.l"), 4).as("level_4"),
        round(col("st.b"), 4).as("trend_4"),
        round(element_at(col("st.s"),
          (col("last_slot") + 1) % 7 + 1), 4).as("s_next_4"),
        round(col("st.l") + col("st.b") +
          element_at(col("st.s"), (col("last_slot") + 1) % 7 + 1), 4)
          .as("fc_1"),
        round(col("st.l") + lit(7.0) * col("st.b") +
          element_at(col("st.s"), col("last_slot") + 1), 4).as("fc_7"))
      .orderBy("grp")
  }

  /** Clamped (saturating) cumulative sum — the inventory-balance
    * recurrence inv_t = clamp(inv_{t−1} + net_t, 0, cap) — per order
    * priority over the daily order-count series, with the net flow
    * centered on the series' own LOWER MEDIAN daily count (exact rank
    * selection, so the flow oscillates around zero and both clamps
    * bind). A clamped running sum is NOT expressible with SQL window
    * frames (the clamp makes each prefix depend on the clamped
    * previous prefix — it needs recursion), which is exactly why it
    * earns an operator: Spark runs it as the module's sequential
    * per-key fold over the calendar-bounded daily array, and the
    * oracle replays it as a per-key recursive CTE. ALL-INTEGER
    * arithmetic (counts, median, clamp bounds), so the match is exact
    * with no rounding discipline. Emits per key: days, median, final
    * balance, and how many days each clamp bound fired. */
  def clampedInventory(orders: DataFrame, cap: Long = 25L): DataFrame = {
    val daily = orders
      .groupBy(col("o_orderpriority").as("grp"),
        to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    // lower-median daily count per key: rank selection over the
    // (cnt, day) total order, the multiplicative (n vs n+1) predicate
    val wMed = Window.partitionBy("grp").orderBy(col("cnt"), col("day"))
    val med = daily
      .withColumn("rn", row_number().over(wMed).cast("long"))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy("grp")))
      .filter(col("rn") * 2 === col("nd") ||
        col("rn") * 2 === col("nd") + 1)
      .select(col("grp"), col("cnt").as("med"))
    val series = daily.join(med, "grp")
      .groupBy(col("grp"), col("med"))
      .agg(sort_array(collect_list(struct(col("day"), col("cnt"))))
        .as("pts"))
    val folded = series.select(col("grp"), col("med"),
      size(col("pts")).as("n_days"),
      aggregate(col("pts"),
        struct(lit(0L).as("inv"), lit(0L).as("lo"), lit(0L).as("hi")),
        (acc, e) => {
          val raw = acc.getField("inv") + e.getField("cnt") - col("med")
          struct(
            greatest(lit(0L), least(lit(cap), raw)).as("inv"),
            (acc.getField("lo") + when(raw < 0, 1L).otherwise(0L))
              .as("lo"),
            (acc.getField("hi") + when(raw > cap, 1L).otherwise(0L))
              .as("hi"))
        }).as("st"))
    folded.select(col("grp"), col("n_days"), col("med"),
        col("st.inv").as("final_balance"),
        col("st.lo").as("floor_clamps"), col("st.hi").as("cap_clamps"))
      .orderBy("grp")
  }

  /** Classical additive decomposition of the daily revenue series
    * (trend + weekly seasonal + residual — the moving-average
    * decomposition STL refines), kept EXACT by scaling through 7:
    * the 7-day centered moving average times 7 is a BIGINT window
    * sum (`trend7`), the detrended series times 7 is
    * `detr7 = 7·cents − trend7` (BIGINT, order-free), and the
    * per-weekday seasonal component is Σ detr7 / (7·count) — ONE
    * correctly-rounded division of exact integers per slot, never a
    * float sum. The residual assembles from those pieces with a
    * fixed op sequence, so both engines agree bitwise before the
    * 4-dp round. One fact aggregate + one bounded-frame window +
    * one 7-row join; interior days only (the centered window needs
    * 3 days each side).
    *
    * FRAME SEMANTICS: the "7-day" centered average is a 7-ROW window
    * over the daily frame. On a calendar with gap days (dates with no
    * orders emit NO row) the frame spans MORE than 7 calendar days
    * and the day-of-week seasonal alignment drifts; the oracle
    * shares the row-frame reading, so engines agree either way. For
    * gapped series, gap-fill the daily frame first (the
    * `cte_month_spine_gapfill` spine pattern) so rows ≡ days. The
    * driver's orders table is dense at every SF, where the two
    * readings coincide. */
  def classicalDecompose(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("bigint"))
        .as("cents"))
    val wCma = Window.orderBy("day").rowsBetween(-3, 3)
    val wAll = Window.orderBy("day")
    val trended = daily
      .withColumn("trend7", sum(col("cents")).over(wCma))
      .withColumn("pos", row_number().over(wAll).cast("long"))
      .withColumn("n_days", count(lit(1)).over(
        Window.partitionBy()))
      // interior only: the centered frame is 7 FULL days
      .filter(col("pos") > 3 && col("pos") <= col("n_days") - 3)
      .withColumn("detr7", lit(7L) * col("cents") - col("trend7"))
      .withColumn("dow", (datediff(col("day"), lit("1970-01-01")) % 7)
        .cast("int"))
      // cached (one pooled slot — see OpCache): the seasonal
      // aggregate (broadcast side) and the final assembly both
      // consume this frame — uncached, each re-runs the fact
      // aggregate + windows (2× the orders scan; PlanSpec pins the
      // single-scan shape). Days-sized cache; the slot bounds
      // repeated-call footprint to one entry.
      .transform(graft.core.OpCache.shared("ts_decompose_trended", _))
    val seasonal = trended.groupBy("dow")
      .agg((sum(col("detr7")).cast("double") /
        (lit(7.0) * count(lit(1)).cast("double"))).as("seasonal"))
    trended.join(seasonal, "dow")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day_s"),
        col("cents"), col("trend7"),
        round(col("seasonal"), 4).as("seasonal_4"),
        round(col("cents").cast("double") -
          col("trend7").cast("double") / lit(7.0) -
          col("seasonal"), 4).as("resid_4"))
      .orderBy("day_s")
  }

  /** CUSUM changepoint detection on the daily shipped-quantity
    * series, in scaled integer arithmetic: with n days and total T,
    * the running statistic is cusum_i = Σ_{j≤i} (n·x_j − T) — the
    * classic Σ(x_j − mean) scaled by n so it stays BIGINT-exact (no
    * float accumulation order to disagree on). The flagged
    * changepoint is the EARLIEST day attaining max |cusum| (CUSUM's
    * estimate of where the mean shifts). Emits the full scored
    * series; one fact aggregate + three window passes over the
    * bounded daily frame. */
  def cusumChangepoint(lineitem: DataFrame): DataFrame = {
    val daily = lineitem
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(col("l_quantity").cast("bigint")).as("qty"))
    val wAll = Window.partitionBy() // the daily series — bounded
    val wRun = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum("qty").over(wAll))
      .withColumn("cusum_fp",
        sum(col("qty") * col("n") - col("tot")).over(wRun))
      .withColumn("mx", max(abs(col("cusum_fp"))).over(wAll))
      .withColumn("d0",
        min(when(abs(col("cusum_fp")) === col("mx"), col("day")))
          .over(wAll))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day_s"),
        col("qty"), col("cusum_fp"),
        (col("day") === col("d0")).as("is_changepoint"))
      .orderBy("day_s")
  }
}
