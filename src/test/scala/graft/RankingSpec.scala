package graft

import org.apache.spark.sql.functions._
import graft.core.Ranking

/** Distributed global row numbering: correctness against the
  * single-partition window truth, and the plan property that motivates
  * it (no one-partition window over the full input). */
class RankingSpec extends SparkTestBase {

  import spark.implicits._

  test("global row numbers match the single-window truth across partitions") {
    // 1000 rows, shuffled key order, spread over several partitions
    val df = (0 until 1000).map(i => ((i * 617) % 1000, i))
      .toDF("k", "id").repartition(7)
    val out = Ranking.withGlobalRowNumber(df, Seq(col("k").asc), "rn")
      .select("k", "rn").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == (1L to 1000L), "rn must be 1..n in k order")
    // descending + tiebreak total order
    val desc = Ranking.withGlobalRowNumber(df,
        Seq(col("k").desc, col("id").asc), "rn")
      .select("k", "rn").as[(Int, Long)].collect()
    assert(desc.maxBy(_._2)._1 == 0 && desc.minBy(_._2)._1 == 999)
  }

  test("global quantiles: rank selection on a known distribution") {
    import graft.operators.quality.Profile
    // cents 100..1000: p50 → rank 5 (500), p90 → rank 9 (900),
    // p99 → rank ceil(9.9)=10 (1000)
    val orders = (1 to 10).map(i => (i.toLong, i * 1.0))
      .toDF("o_orderkey", "o_totalprice")
    val out = Profile.globalQuantiles(orders).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(50L -> ((500L, 10L)), 90L -> ((900L, 10L)),
      99L -> ((1000L, 10L))), out.toString)
  }

  test("ranking runs on parallel range partitions, not one window task") {
    val df = (0 until 1000).map(i => ((i * 31) % 997, i)).toDF("k", "id")
    val ranked = Ranking.withGlobalRowNumber(df,
      Seq(col("k").asc, col("id").asc), "rn")
    val plan = ranked.queryExecution.executedPlan.toString
    // the sort must arrive via a range exchange; the window partitions
    // on the pid column rather than running unpartitioned
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.matches("(?s).*Window.*SinglePartition.*"),
      s"global ranking must not collapse to one partition:\n$plan")
  }
}
