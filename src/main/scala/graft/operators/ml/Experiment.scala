package graft.operators.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experiment analysis — the two-proportion z-test an A/B platform
  * runs over a conversion metric. Arms are a deterministic hash of
  * the unit (user_id parity — the assignment an experimentation
  * system would persist); conversion is a MEDIAN SPLIT of per-user
  * purchase counts ("bought more than the typical user"), which
  * keeps both proportions interior at every data scale — a fixed
  * absolute threshold degenerates to all-or-none converted on tiny
  * or huge corpora and zeroes the pooled variance. The median is an
  * exact rank selection over the user frame via
  * `core/Ranking.withGlobalRowNumber` (range exchange — scales with
  * users, no single-partition sort).
  *
  * The statistic's entire input is FOUR exact integers
  * (n₁, x₁, n₂, x₂); pooled z² = N·(x₁n₂ − x₂n₁)² /
  * (n₁·n₂·X·(N−X)) is then one fixed IEEE expression over them —
  * both engines evaluate the identical op sequence, so the α = 0.05
  * verdict (z² > 1.96²) is deterministic cross-engine even at the
  * boundary. Degenerate cases — X = 0 or X = N (zero pooled
  * variance), or EVERY user in one parity arm (n₁ or n₂ = 0, the
  * tiny/id-skewed-corpus case) — yield NULL statistics and a false
  * verdict rather than a division error or a silently empty result:
  * the arm counts come from one conditional aggregate, so the output
  * is ALWAYS exactly one row. */
object Experiment {

  def abTestConversion(events: DataFrame): DataFrame = {
    // cached (one pooled slot — see OpCache): the median ranking AND
    // the arm split both consume this frame — uncached, each re-runs
    // the fact aggregate (2× the events scan; PlanSpec pins the
    // shared shape). The cache is users-sized, orders of magnitude
    // below the fact; the slot bounds repeated-call footprint to one
    // entry.
    val perUser = graft.core.OpCache.shared("abtest_per_user", events
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("pc")))
    // lower median of per-user purchase counts: the multiplicative
    // rank predicate (2·rn = n or n+1) over a (pc, user_id) total order
    val ranked = graft.core.Ranking.withGlobalRowNumber(
      perUser, Seq(col("pc").asc, col("user_id").asc), "rn")
    // total user count rides a 1-row broadcast (a global window here
    // would drag the whole user frame through one task)
    val nUsers = perUser.agg(count(lit(1)).as("nu"))
    val medDf = ranked.crossJoin(broadcast(nUsers))
      .filter(col("rn") * 2 === col("nu") ||
        col("rn") * 2 === col("nu") + 1)
      .select(col("pc").as("med"))
    // ONE conditional aggregate builds both arms' (n, x): always
    // exactly one output row, so a degenerate split (every user in
    // one parity arm on a tiny or id-skewed corpus) surfaces as
    // n=0 / NULL statistics instead of silently emptying an
    // arm-filtered cross join — and it's one pass where the filtered
    // self-cross was two
    val armed = perUser.crossJoin(broadcast(medDf))
      .withColumn("arm", (col("user_id") % 2).cast("int"))
      .withColumn("converted",
        when(col("pc") > col("med"), 1L).otherwise(0L))
    val wide = armed.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("x1"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
      sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("x2"))
    val bigN = col("n1") + col("n2")
    val bigX = col("x1") + col("x2")
    val diff = col("x1") * col("n2") - col("x2") * col("n1")
    val z2 = when(bigX === 0 || bigX === bigN ||
        col("n1") === 0 || col("n2") === 0, lit(null).cast("double"))
      .otherwise(bigN.cast("double") *
        (diff.cast("double") * diff.cast("double")) /
        (col("n1").cast("double") * col("n2").cast("double") *
          bigX.cast("double") * (bigN - bigX).cast("double")))
    wide.select(col("n1"), col("x1"), col("n2"), col("x2"),
      when(col("n1") === 0, lit(null).cast("double")).otherwise(
        round(col("x1").cast("double") / col("n1").cast("double"), 6))
        .as("p1_6"),
      when(col("n2") === 0, lit(null).cast("double")).otherwise(
        round(col("x2").cast("double") / col("n2").cast("double"), 6))
        .as("p2_6"),
      round(z2, 6).as("z2_6"),
      coalesce(z2 > lit(3.8416), lit(false)).as("significant"))
  }
}
