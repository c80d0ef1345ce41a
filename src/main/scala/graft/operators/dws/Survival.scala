package graft.operators.dws

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier product-limit survival estimation (Kaplan & Meier
  * 1958) over customer REPURCHASE intervals — the churn question
  * "what fraction of customers go t days without ordering again":
  * each consecutive order pair contributes an EVENT duration (the
  * gap), and each customer's span from their last order to the
  * corpus horizon contributes a CENSORED duration (they have not
  * repurchased *yet* — dropping these would bias survival down,
  * which is the whole point of K–M over a plain histogram).
  *
  * Scale contract: the heavy work is ONE fact pass (a per-customer
  * lag window, keyed exchange on custkey) down to an observation set,
  * then everything is keyed on duration — bounded by DISTINCT GAP
  * DAYS (≤ the calendar span, a few thousand regardless of fact
  * size). d_i (deaths) and n_i (at-risk) are exact integers from one
  * aggregate + one cumulative window over that bounded frame; the
  * survival product S_i = Π_{j≤i} (1 − d_j/n_j) is the module's
  * sequential fold over the collected (t, d, n) array, each step
  * division/subtraction/multiplication — three correctly-rounded
  * IEEE ops the oracle's recursive CTE replays with the SAME
  * parenthesization, so the pre-round doubles match bitwise. */
object Survival {

  /** One row per distinct event duration: t_days, d (events), c
    * (censored at t), n (at risk), surv_6 (K–M estimate).
    *
    * t = 0 CONVENTION: same-day repeat orders are t = 0 events, and
    * a customer whose only order falls on the horizon day is a t = 0
    * censor — so S can step below 1 at t = 0, a deliberate deviation
    * from the textbook K–M convention of strictly positive durations
    * (which would silently DROP same-day repurchase signal, the
    * dominant behavior in burst-buying corpora). Deterministic and
    * oracle-matched; filter `t > 0` upstream for the classical
    * reading. */
  def kaplanMeierRepurchase(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    val byCust = orders.select(col("o_custkey").as("cust"),
      to_date(col("o_orderdate")).as("day"), col("o_orderkey"))
    val w = Window.partitionBy("cust").orderBy(col("day"), col("o_orderkey"))
    val nextDay = lead(col("day"), 1).over(w)
    // horizon = max order date in the corpus (1-row broadcast)
    val horizon = byCust.agg(max(col("day")).as("hday"))
    val obs = byCust
      .withColumn("next_day", nextDay)
      .crossJoin(broadcast(horizon))
      .select(
        when(col("next_day").isNotNull,
          datediff(col("next_day"), col("day")))
          .otherwise(datediff(col("hday"), col("day")))
          .cast("long").as("t"),
        when(col("next_day").isNotNull, 1L).otherwise(0L).as("ev"))
    // per-duration event/censor counts, then at-risk by suffix sum:
    // n(t) = Σ_{u ≥ t} (d_u + c_u) — a cumulative window DESCENDING
    // over the duration-bounded frame
    val perT = obs.groupBy("t")
      .agg(sum(col("ev")).as("d"),
        sum(lit(1L) - col("ev")).as("c"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cached (one pooled slot — see OpCache): BOTH the curve fold
    // (broadcast side) and the final join consume this frame —
    // uncached, Catalyst re-derives the whole orders scan +
    // lead-window pipeline per consumer (2× the fact work; PlanSpec
    // pins the single-scan shape). The frame is
    // distinct-durations-sized (≤ corpus day span), a few KB at any
    // SF; the slot bounds repeated-call footprint to one entry.
    val risk = graft.core.OpCache.shared("survival_km_risk",
      perT.withColumn("n", sum(col("d") + col("c")).over(wDesc)))
    // survival product over EVENT times only (the K–M convention:
    // censor-only times change n but not S), ordered ascending —
    // the sequential fold, bounded by distinct durations
    val eventRows = risk.filter(col("d") > 0)
    val packed = eventRows
      .agg(sort_array(collect_list(struct(col("t"), col("d"), col("n"))))
        .as("pts"))
    val folded = packed.select(
      aggregate(col("pts"),
        struct(lit(1.0).as("s"),
          array().cast("array<struct<t:bigint,surv:double>>").as("out")),
        (acc, e) => {
          val s2 = acc.getField("s") *
            (lit(1.0) - e.getField("d").cast("double") /
              e.getField("n").cast("double"))
          struct(s2.as("s"),
            concat(acc.getField("out"),
              array(struct(e.getField("t").as("t"), s2.as("surv"))))
              .as("out"))
        }).getField("out").as("curve"))
    val curve = folded.select(explode(col("curve")).as("p"))
      .select(col("p.t").as("t"), col("p.surv").as("surv"))
    eventRows.join(curve, Seq("t"))
      .select(col("t").as("t_days"), col("d"), col("c"), col("n"),
        round(col("surv"), 6).as("surv_6"))
      .orderBy("t_days")
  }
}
