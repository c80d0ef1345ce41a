package graft.operators.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shift diagnostics — robust per-group statistics and a
  * population-stability (PSI) report, the "did my data change under
  * me" checks a continuously-loaded warehouse runs next to the
  * expectation suite (`Expectations`). All heavy work is fact-scan
  * aggregates with map-side combine; the statistics frames are
  * group- or bin-sized and ride broadcasts. Medians use Spark's exact
  * interpolated `percentile` — the same arithmetic as DuckDB's
  * `quantile_cont`, which keeps the oracle exact (the
  * `w_stats_aggregates` precedent).
  */
object Drift {

  /** Robust per-group location/spread: exact median, MAD (median
    * absolute deviation), and the count of |x − median| > 3·1.4826·MAD
    * outliers (1.4826 scales MAD to σ under normality — the standard
    * robust z-score). Three aggregates over the fact, each joined back
    * through a group-sized broadcast; the outlier threshold uses the
    * UNROUNDED mad (rounding only at the output edge), mirrored
    * exactly by the oracle. Zero-MAD groups (>50% identical values)
    * flag every deviating row — the z-score's zero-variance clause. */
  def robustStats(orders: DataFrame): DataFrame = {
    val base = orders.select(col("o_orderpriority").as("grp"),
      col("o_totalprice").cast("bigint").as("x"))
    val med = base.groupBy("grp")
      .agg(expr("percentile(x, 0.5)").as("med"))
    val withAd = base.join(broadcast(med), "grp")
      .withColumn("ad", abs(col("x") - col("med")))
    val mad = withAd.groupBy("grp")
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    withAd.join(broadcast(mad), "grp")
      .groupBy(col("grp"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ad") > lit(3 * 1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("outlier_ct"))
      .select(col("grp"), col("n"), round(col("med"), 4).as("med"),
        round(col("mad"), 4).as("mad"), col("outlier_ct"))
      .orderBy("grp")
  }

  /** Population Stability Index between two date regimes of the order
    * total: fixed equal-width bins (clamped at the edges, the
    * `Profile.histogram` convention), Laplace-smoothed shares
    * p = (ct+1)/(n+bins) so empty bins never hit ln(0), per-bin
    * contribution (p−q)·ln(p/q) and the summed PSI on every row.
    * One fact scan: both regimes aggregate in the same pass
    * (conditional counts), the bin frame is `bins`-sized.
    * PSI < 0.1 is conventionally "no shift"; the flagship splits
    * TPC-H-ish orders at 1995-01-01, a stationary generator, so the
    * expected report is near-zero — the operator's job is the
    * machinery, the fixture pins the math. */
  def psiReport(orders: DataFrame, pivotDate: String = "1995-01-01",
                lo: Double = 0.0, hi: Double = 600000.0,
                bins: Int = 10): DataFrame = {
    require(bins >= 2 && hi > lo, "psiReport: need bins >= 2, hi > lo")
    val width = (hi - lo) / bins
    val base = orders.select(
      (to_date(col("o_orderdate")) < lit(pivotDate)).as("is_a"),
      least(greatest(
        floor((col("o_totalprice") - lo) / width), lit(0.0)),
        lit((bins - 1).toDouble)).cast("int").as("bin"))
    val counts = base.groupBy("bin").agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("ct_a"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("ct_b"))
    // densify: every bin appears even if empty in both regimes
    val allBins = orders.sparkSession.range(0, bins)
      .select(col("id").cast("int").as("bin"))
    val wAll = Window.partitionBy()
    allBins.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ct_a"), lit(0L)).as("ct_a"),
        coalesce(col("ct_b"), lit(0L)).as("ct_b"))
      .withColumn("n_a", sum("ct_a").over(wAll))
      .withColumn("n_b", sum("ct_b").over(wAll))
      .withColumn("p", (col("ct_a") + 1).cast("double") /
        (col("n_a") + bins).cast("double"))
      .withColumn("q", (col("ct_b") + 1).cast("double") /
        (col("n_b") + bins).cast("double"))
      // contributions in integer MICROS so the summed PSI is an
      // integer sum — no float-accumulation order to disagree on
      // (the NaiveBayes micro-log contract)
      .withColumn("c_micro",
        round((col("p") - col("q")) * log(col("p") / col("q")) * 1e6)
          .cast("bigint"))
      .withColumn("psi_micro", sum("c_micro").over(wAll))
      .select(col("bin"), col("ct_a"), col("ct_b"),
        round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        (col("c_micro").cast("double") / 1e6).as("contrib"),
        (col("psi_micro").cast("double") / 1e6).as("psi"))
      .orderBy("bin")
  }

  /** Benford first-digit audit (Benford 1938; the classic fraud /
    * data-generation-defect screen): observed share of each leading
    * significant digit of a positive measure vs the Benford
    * expectation log10(1 + 1/d), both in floored/rounded micros.
    * One scan + a 9-row aggregate; digit extraction is pure double
    * arithmetic (floor(x / 10^floor(log10 x))) with IEEE-identical
    * results in both engines. */
  def benfordAudit(orders: DataFrame, valueCol: String = "o_totalprice")
      : DataFrame = {
    val x = col(valueCol).cast("double")
    val digit = floor(x / pow(lit(10.0), floor(log10(x)))).cast("int")
    val counts = orders.filter(x >= lit(1.0))
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = broadcast(counts.agg(sum(col("n")).as("total")))
    counts.crossJoin(total)
      .select(col("digit"), col("n"),
        floor(lit(1000000L) * col("n") / col("total"))
          .cast("bigint").as("share_micro"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")) * 1e6)
          .cast("bigint").as("benford_micro"))
      .withColumn("dev_micro",
        abs(col("share_micro") - col("benford_micro")))
      .orderBy("digit")
  }
}
