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
