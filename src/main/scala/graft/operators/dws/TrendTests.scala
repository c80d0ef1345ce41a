package graft.operators.dws

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Non-parametric trend tests over MONTHLY aggregates of the order
  * fact — Mann–Kendall (Mann 1945, Kendall 1975) and the Theil–Sen
  * slope estimator (Theil 1950, Sen 1968). Both are pairwise
  * statistics, O(n²) in the series length, so the scale contract is
  * the same as `TimeSeries`: the heavy work is ONE map-side-combined
  * fact aggregate to a calendar-bounded series (≤ ~84 months per key
  * on the 7-year TPC-H date span), and the per-key pair self-join
  * that follows is bounded by (months choose 2) per key REGARDLESS
  * of fact size — a few thousand pair rows at 100 TB exactly as at
  * sf0.001.
  *
  * Determinism: the Mann–Kendall S statistic and its tie-corrected
  * variance are computed ENTIRELY in BIGINT (the classic Var formula
  * is scaled by 18 so no division appears until the final Z), and
  * the Theil–Sen median is a rank SELECTION over single-division
  * slopes (each slope is one correctly-rounded IEEE division of two
  * exact integers — bit-identical across engines), never an average
  * of floats. Significance at α = 0.05 is decided by the exact
  * integer cross-multiplication 180000·(S∓1)² > 38416·var18
  * (⟺ Z² > 1.96², since Var = var18/18 and 1.96² = 38416/10⁴), so
  * the trend verdict involves NO floating point at all. */
object TrendTests {

  /** grp → (month-index i, monthly order count) series, one fact
    * aggregate + a per-key row_number over the bounded month frame. */
  private def monthlySeries(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(col("o_orderpriority").as("grp"),
        date_trunc("month", to_date(col("o_orderdate"))).as("mon"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("grp").orderBy("mon")
    monthly.withColumn("i", row_number().over(w).cast("long"))
      .select("grp", "i", "cnt")
  }

  /** Mann–Kendall trend test per order priority:
    * S = Σ_{i<j} sign(y_j − y_i), tie-corrected variance×18
    * var18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5), normal-approximation
    * Z with the ±1 continuity correction, and the exact-integer
    * significance verdict at α = 0.05. */
  def mannKendall(orders: DataFrame): DataFrame = {
    val ser = monthlySeries(orders)
    val pairs = ser.as("a").join(ser.as("b"),
        col("a.grp") === col("b.grp") && col("a.i") < col("b.i"))
      .groupBy(col("a.grp").as("grp"))
      .agg(sum(when(col("b.cnt") > col("a.cnt"), 1L)
        .when(col("b.cnt") < col("a.cnt"), -1L)
        .otherwise(0L)).as("s_stat"))
    val ties = ser.groupBy(col("grp"), col("cnt"))
      .agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .groupBy("grp")
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
        .as("tie18"))
    val n = ser.groupBy("grp").agg(count(lit(1)).as("n_months"))
    val base = n
      .join(pairs, Seq("grp"))
      .join(ties, Seq("grp"), "left")
      .withColumn("var18",
        col("n_months") * (col("n_months") - 1) *
          (lit(2) * col("n_months") + 5) -
          coalesce(col("tie18"), lit(0L)))
    // continuity-corrected |S|∓1; Z in double (sqrt and / are each
    // correctly rounded), verdict in exact integers only
    val sAdj = when(col("s_stat") > 0, col("s_stat") - 1)
      .when(col("s_stat") < 0, col("s_stat") + 1)
      .otherwise(lit(0L))
    base
      .withColumn("z_6",
        when(col("s_stat") === 0 || col("var18") === 0, lit(0.0))
          .otherwise(round(sAdj.cast("double") /
            sqrt(col("var18").cast("double") / lit(18.0)), 6)))
      .withColumn("sig",
        lit(180000L) * sAdj * sAdj > lit(38416L) * col("var18"))
      .select(col("grp"), col("n_months"), col("s_stat"), col("var18"),
        col("z_6"),
        when(col("s_stat") > 0 && col("sig"), lit("increasing"))
          .when(col("s_stat") < 0 && col("sig"), lit("decreasing"))
          .otherwise(lit("no_trend")).as("trend"))
      .orderBy("grp")
  }

  /** Theil–Sen slope per order priority: the LOWER MEDIAN (exact
    * rank selection, ties broken by the pair index — a total order)
    * of all pairwise slopes (y_j − y_i)/(j − i) over the monthly
    * series. Robust to outliers where OLS (`ml/Regression`) is not;
    * the two estimators bracket each other on clean series. */
  def theilSen(orders: DataFrame): DataFrame = {
    val ser = monthlySeries(orders)
    val slopes = ser.as("a").join(ser.as("b"),
        col("a.grp") === col("b.grp") && col("a.i") < col("b.i"))
      .select(col("a.grp").as("grp"), col("a.i").as("i"),
        col("b.i").as("j"),
        ((col("b.cnt") - col("a.cnt")).cast("double") /
          (col("b.i") - col("a.i")).cast("double")).as("slope"))
    val w = Window.partitionBy("grp")
      .orderBy(col("slope"), col("i"), col("j"))
    slopes
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n_pairs", count(lit(1))
        .over(Window.partitionBy("grp")))
      // lower-median rank (n+1) div 2, phrased multiplicatively so no
      // engine's `/`-on-integers convention (float vs floor) is in play:
      // exactly one of 2·rn = n (n even) or 2·rn = n+1 (n odd) matches
      .filter(col("rn") * 2 === col("n_pairs") ||
        col("rn") * 2 === col("n_pairs") + 1)
      .select(col("grp"), col("n_pairs"),
        round(col("slope"), 6).as("slope_med6"))
      .orderBy("grp")
  }
}
