package graft.operators.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table profiling — the "describe my 100 TB table" utility: per-column
  * null counts, exact distinct cardinalities, min/max, and fixed-bound
  * histograms, each as ONE full-scan aggregate (never a pass per
  * column).
  *
  * Shape at 100 TB: `profile` is a single global aggregate. Multiple
  * exact `count(DISTINCT col)` in one aggregate compile to Catalyst's
  * Expand-based plan — the scan is replayed k-fold into the first
  * exchange (k = #columns), which is the exact-answer price; when a
  * profile only needs cardinality ESTIMATES, `profileApprox` swaps in
  * `approx_count_distinct` (HLL++) and the whole profile collapses to
  * one partial+final aggregate pair with no Expand — that is the
  * default posture at scale, the exact form is the oracle-checkable
  * twin. min/max/count are trivially mergeable either way.
  *
  * `histogram` is one scan (floor-arithmetic bucket id, clamped to the
  * edge buckets) plus a broadcast-range zero-pad so empty buckets
  * appear — no per-bucket pass, no sort until the bounded output. */
object Profile {

  /** One row per column: (col_name, n_rows, null_ct, distinct_ct,
    * min_s, max_s). min/max are CAST to string — callers pick columns
    * whose string form is engine-portable (integers, strings, dates;
    * raw doubles are format-unstable across engines and belong in
    * `histogram`/numeric stats instead). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // single-row unpivot: explode an array of per-column structs built
    // from the aggregate's columns (driver-free, stays one job)
    val entries = array(cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"${c}__nulls").as("null_ct"),
      col(s"${c}__distinct").as("distinct_ct"),
      col(s"${c}__min").as("min_s"),
      col(s"${c}__max").as("max_s"))): _*)
    one.select(col("n_rows"), explode(entries).as("e"))
      .select(col("e.col_name").as("col_name"), col("n_rows"),
        col("e.null_ct").as("null_ct"),
        col("e.distinct_ct").as("distinct_ct"),
        col("e.min_s").as("min_s"), col("e.max_s").as("max_s"))
      .orderBy("col_name")
  }

  /** The at-scale variant: HLL++ cardinalities, no Expand. Rows-only
    * checkable (estimates are engine-specific); its exact twin above
    * is the oracled form. */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.05): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        approx_count_distinct(col(c), rsd).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"${c}__nulls").as("null_ct"),
      col(s"${c}__distinct").as("distinct_ct"),
      col(s"${c}__min").as("min_s"),
      col(s"${c}__max").as("max_s"))): _*)
    one.select(col("n_rows"), explode(entries).as("e"))
      .select(col("e.col_name").as("col_name"), col("n_rows"),
        col("e.null_ct").as("null_ct"),
        col("e.distinct_ct").as("distinct_ct"),
        col("e.min_s").as("min_s"), col("e.max_s").as("max_s"))
      .orderBy("col_name")
  }

  /** Fixed-bound equi-width histogram: bucket i covers
    * [lo + i·step, lo + (i+1)·step); values outside [lo, hi) clamp to
    * the edge buckets (so mass is never dropped). Zero-padded to all
    * `buckets` rows; bounds rounded to 2 dp for a portable output.
    * Floor arithmetic only — no engine-specific width_bucket. */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
                buckets: Int): DataFrame = {
    require(buckets > 0 && hi > lo, "histogram: need hi > lo, buckets > 0")
    val spark = df.sparkSession
    val step = (hi - lo) / buckets
    val bucket = least(greatest(
      floor((col(c) - lit(lo)) / lit(step)), lit(0L)),
      lit(buckets - 1L)).as("bucket")
    val counts = df.filter(col(c).isNotNull)
      .select(bucket).groupBy("bucket")
      .agg(count(lit(1)).as("ct"))
    spark.range(buckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        round(lit(lo) + col("bucket") * lit(step), 2).as("lo"),
        round(lit(lo) + (col("bucket") + 1) * lit(step), 2).as("hi"),
        coalesce(col("ct"), lit(0L)).as("ct"))
      .orderBy("bucket")
  }

  /** EXACT global percentiles of the order totals (integer cents) by
    * rank selection: the pct-th percentile is the row at rank
    * ⌈pct·n/100⌉ of the (cents, key) total order. Spark's exact
    * `percentile` aggregate buffers the whole column per group and a
    * bare `Window.orderBy` runs on ONE task — this instead rides
    * [[graft.core.Ranking.withGlobalRowNumber]] (range exchange +
    * parallel per-partition windows), so the only per-task state is a
    * partition's own rows. n and the target ranks are driver scalars
    * (⌈·⌉ in double — exact far past any real n). Output: (pct,
    * cents, n_rows) per requested percentile. */
  def globalQuantiles(orders: DataFrame,
                      pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "globalQuantiles: pcts must be in 1..100")
    val spark = orders.sparkSession
    import spark.implicits._
    val vals = orders.select(
      round(col("o_totalprice") * 100).cast("bigint").as("cents"),
      col("o_orderkey"))
    val n = vals.count() // bounded scalar
    val ranks = pcts.map(p => (p.toLong, math.ceil(p * n / 100.0).toLong))
    val rankDf = ranks.toDF("pct", "rn")
    graft.core.Ranking.withGlobalRowNumber(vals,
        Seq(col("cents").asc, col("o_orderkey").asc), "__rn")
      .join(broadcast(rankDf), col("__rn") === col("rn"))
      .select(col("pct"), col("cents"), lit(n).as("n_rows"))
      .orderBy("pct")
  }

  /** Exact PER-GROUP percentiles by rank selection — the grouped
    * sibling of [[globalQuantiles]]. Where the global form needs the
    * range-exchange row-number machinery (`core/Ranking`), the
    * grouped form is one KEYED window (partitionBy group): the hash
    * exchange spreads work across DISTINCT group keys, but each
    * group's whole slice still sorts in a single task — fine for
    * many-groups profiles, NOT for a handful of giant groups (here
    * o_orderpriority has 5 values, so at 100 TB each task sorts a
    * fifth of the table; `q_grouped_quantiles_approx` — one pass of
    * mergeable t-digest-style sketches — is the scale path for
    * low-cardinality/high-volume group keys). rank = ceil(p·n/100)
    * with the multiplication taken exactly in double (p·n < 2^53) —
    * identical arithmetic on both engines. */
  def groupedQuantiles(orders: DataFrame,
                       pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "groupedQuantiles: pcts must be in 1..100")
    val spark = orders.sparkSession
    import spark.implicits._
    val vals = orders.select(col("o_orderpriority").as("grp"),
      round(col("o_totalprice") * 100).cast("bigint").as("cents"),
      col("o_orderkey"))
    val w = Window.partitionBy("grp")
      .orderBy(col("cents").asc, col("o_orderkey").asc)
    val ranked = vals
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n_rows",
        count(lit(1)).over(Window.partitionBy("grp")))
    val pctDf = pcts.map(_.toLong).toDF("pct")
    ranked.join(broadcast(pctDf),
        col("rn") === ceil((col("pct") * col("n_rows")).cast("double") /
          lit(100.0)).cast("bigint"))
      .select(col("grp"), col("pct"), col("cents"), col("n_rows"))
      .orderBy("grp", "pct")
  }

  /** The sketch swap for [[groupedQuantiles]] at 100 TB: Spark's
    * `approx_percentile` (Greenwald–Khanna, mergeable partial state —
    * accuracy 10⁴ ⇒ rank error ≤ n/10⁴ per group) in ONE map-side-
    * combined aggregate, no window, no per-group sort. Rows-only in
    * the gate (sketch internals are engine-specific); `ProfileSpec`
    * bounds the rank drift against the exact twin, which is the same
    * pairing contract as `a3_province_order_window_approx`. */
  def groupedQuantilesApprox(orders: DataFrame,
                             pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val vals = orders.select(col("o_orderpriority").as("grp"),
      round(col("o_totalprice") * 100).cast("bigint").as("cents"))
    val pctArr = pcts.map(_.toDouble / 100.0)
    vals.groupBy("grp")
      .agg(count(lit(1)).as("n_rows"),
        percentile_approx(col("cents"),
          array(pctArr.map(lit): _*), lit(10000)).as("qs"))
      .select(col("grp"), col("n_rows"),
        explode(arrays_zip(
          array(pcts.map(p => lit(p.toLong)): _*).as("pct"),
          col("qs").as("cents_approx"))).as("z"))
      .select(col("grp"), col("z.pct").as("pct"),
        col("z.cents_approx").as("cents_approx"), col("n_rows"))
      .orderBy("grp", "pct")
  }

  /** Key-skew report — "find the hot keys before they melt a join":
    * ONE map-side-combined count per key, then summary statistics
    * over the key-count frame INCLUDING the exact Gini coefficient
    *   G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)
    * over counts ranked ascending. The global rank rides
    * `core/Ranking.withGlobalRowNumber` (range exchange + offset
    * join — never a single-partition window), so the report scales
    * with the KEY frame, not the fact. Integer numerator/denominator
    * (exact, order-free); bound: Σ i·xᵢ ≤ n·Σx must stay under 2^63
    * — at n·total beyond ~4·10^18 sample the key frame first (ANSI
    * overflow fails loudly, never silently). */
  def keySkewReport(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(col(key).as("k"))
      .agg(count(lit(1)).as("ct"))
    val ranked = graft.core.Ranking.withGlobalRowNumber(
      counts, Seq(col("ct").asc, col("k").asc), "i")
    ranked.agg(
        count(lit(1)).as("n_keys"),
        sum(col("ct")).as("total_rows"),
        max(col("ct")).as("max_key_rows"),
        sum(col("i") * col("ct")).as("rank_weighted"))
      .select(col("n_keys"), col("total_rows"), col("max_key_rows"),
        round((lit(2.0) * col("rank_weighted").cast("double") -
          (col("n_keys") + 1).cast("double") *
            col("total_rows").cast("double")) /
          (col("n_keys").cast("double") *
            col("total_rows").cast("double")), 6).as("gini_6"))
  }
}
