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
  * boundary. Degenerate splits (X = 0 or X = N — zero pooled
  * variance) yield NULL z² and a false verdict rather than a
  * division error. Output is ONE row. */
object Experiment {

  def abTestConversion(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("pc"))
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
    val arms = perUser.crossJoin(broadcast(medDf))
      .withColumn("arm", (col("user_id") % 2).cast("int"))
      .withColumn("converted",
        when(col("pc") > col("med"), 1L).otherwise(0L))
      .groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("x"))
    val wide = arms.filter(col("arm") === 0)
      .select(col("n").as("n1"), col("x").as("x1"))
      .crossJoin(arms.filter(col("arm") === 1)
        .select(col("n").as("n2"), col("x").as("x2")))
    val bigN = col("n1") + col("n2")
    val bigX = col("x1") + col("x2")
    val diff = col("x1") * col("n2") - col("x2") * col("n1")
    val z2 = when(bigX === 0 || bigX === bigN, lit(null).cast("double"))
      .otherwise(bigN.cast("double") *
        (diff.cast("double") * diff.cast("double")) /
        (col("n1").cast("double") * col("n2").cast("double") *
          bigX.cast("double") * (bigN - bigX).cast("double")))
    wide.select(col("n1"), col("x1"), col("n2"), col("x2"),
      round(col("x1").cast("double") / col("n1").cast("double"), 6)
        .as("p1_6"),
      round(col("x2").cast("double") / col("n2").cast("double"), 6)
        .as("p2_6"),
      round(z2, 6).as("z2_6"),
      coalesce(z2 > lit(3.8416), lit(false)).as("significant"))
  }
}
