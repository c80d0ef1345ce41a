package graft.operators.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine model fitting from sufficient statistics — the "train a
  * simple model over 100 TB without leaving the warehouse" surface.
  * OLS needs only six per-group sums, so the fit costs exactly one
  * map-side-combined aggregate over the fact (the same shape as any
  * groupBy-sum), never an iterative pass. The sums stay BIGINT-exact
  * (order-free); every product in the closed-form solution is then
  * taken in DOUBLE on those exact sums, because n·Σy² overflows
  * BIGINT at scale (measured: 2e20 at sf0.1) while every SUM itself
  * stays under 2^53 and is therefore exactly representable — the
  * formula is bit-stable across engines as long as both sides take
  * the same double products, which the oracle mirrors literally.
  */
object Regression {

  /** Per-group simple OLS y = intercept + slope·x with r², fit from
    * sufficient statistics in one aggregate. x and y are truncated to
    * BIGINT on the way in (the engine-portable integer contract). The
    * intercept uses the UNROUNDED slope; rounding happens only at the
    * output edge (slope 6 dp, intercept 2 dp, r² 6 dp). Groups with
    * zero x-variance yield null slope/intercept/r² rather than a
    * division error. */
  def olsPerGroup(df: DataFrame, grpCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val base = df.select(col(grpCol).as("grp"),
      col(xCol).cast("bigint").as("x"), col(yCol).cast("bigint").as("y"))
    val stats = base.groupBy("grp").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    // every operand below is an exact integer < 2^53 cast to double;
    // the PRODUCTS are where precision is spent, identically on both
    // engines (the oracle replays this exact expression tree)
    def d(c: String) = col(c).cast("double")
    val num  = d("n") * d("sxy") - d("sx") * d("sy")
    val denx = d("n") * d("sxx") - d("sx") * d("sx")
    val deny = d("n") * d("syy") - d("sy") * d("sy")
    val slope = num / denx
    stats.select(
        col("grp"), col("n"),
        round(when(denx > 0, slope), 6).as("slope"),
        round(when(denx > 0,
          (d("sy") - slope * d("sx")) / d("n")), 2).as("intercept"),
        round(when(denx > 0 && deny > 0,
          (num * num) / (denx * deny)), 6).as("r2"))
      .orderBy("grp")
  }
}
