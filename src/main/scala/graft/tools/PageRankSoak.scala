package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.graph.PageRank

/** Measures the round-5 PageRank iteration variants on the co-purchase
  * flagship and verifies every variant lands on the identical
  * fixed-point ranks (integer arithmetic makes bit-equality the
  * correct assertion, not tolerance):
  *
  *   1. padded rounds (nodes LEFT JOIN contrib — the general-graph
  *      form: SMJ + exchange + sort per round), chain depth 2
  *      (the shipped r4 shape);
  *   2. symmetric no-pad rounds (in-degree ≥ 1 ⇒ contrib covers all
  *      nodes), chain depth 2;
  *   3. symmetric no-pad, chain depth 5 (the shipped r5 shape);
  *   4. dst-bucketed edgesDeg + no-pad depth 5: BroadcastHashJoin
  *      preserves the bucketed HashPartitioning(dst) so the round
  *      aggregation is EXCHANGE-FREE — the 100 TB shape when rank
  *      tables outgrow broadcast — measured here honestly even though
  *      the bucket-pinned 32-file scan loses locally.
  *
  * usage: runMain graft.tools.PageRankSoak [sfDir] [iters]
  */
object PageRankSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.core.Sessions.local("32")
    val scratch = "/tmp/pagerank-soak"

    // shared setup: edges, degrees, nodes — identical for all variants
    PageRank.customerPartGraph(
        Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir))
      .write.mode("overwrite").parquet(s"$scratch/edges")
    val edges = spark.read.parquet(s"$scratch/edges")
    val deg0 = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    edges.join(deg0, "src")
      .write.mode("overwrite").parquet(s"$scratch/edgesdeg")
    val edgesDegPlain = spark.read.parquet(s"$scratch/edgesdeg")
    spark.sql("DROP TABLE IF EXISTS graft_pr_soak_bucketed")
    edges.join(deg0, "src").repartition(32, col("dst"))
      .write.mode("overwrite").format("parquet").bucketBy(32, "dst")
      .option("path", s"$scratch/edgesdeg_bucketed")
      .saveAsTable("graft_pr_soak_bucketed")
    val edgesDegBucketed = spark.table("graft_pr_soak_bucketed")
    edgesDegPlain.select(col("src").as("node")).distinct()
      .write.mode("overwrite").parquet(s"$scratch/nodes")
    val nodes = spark.read.parquet(s"$scratch/nodes")
    val n = nodes.count()
    val init = PageRank.Scale / n

    def contrib(edgesDeg: DataFrame, r0: DataFrame): DataFrame =
      edgesDeg.join(r0.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r DIV deg")).as("s"))
    def padded(edgesDeg: DataFrame)(r0: DataFrame): DataFrame =
      nodes.join(contrib(edgesDeg, r0), Seq("node"), "left")
        .select(col("node"), expr(s"(15 * CAST($init AS BIGINT) + " +
          "85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100").as("r"))
    def nopad(edgesDeg: DataFrame)(r0: DataFrame): DataFrame =
      contrib(edgesDeg, r0).select(col("node"),
        expr(s"(15 * CAST($init AS BIGINT) + 85 * s) DIV 100").as("r"))

    def run(tag: String, depth: Int, round: DataFrame => DataFrame): String = {
      var ranks = nodes.select(col("node"), lit(init).as("r"))
      val t0 = System.nanoTime()
      var done = 0
      while (done < iters) {
        val step = math.min(depth, iters - done)
        val next = (1 to step).foldLeft(ranks)((r, _) => round(r))
        done += step
        next.write.mode("overwrite").parquet(s"$scratch/round-$tag-$done")
        ranks = spark.read.parquet(s"$scratch/round-$tag-$done")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val fp = ranks.orderBy("node")
        .agg(sum(expr("r * (node % 997 + 1)"))).head().getLong(0)
      println(f"[soak] $tag%-28s $sec%6.2f s  fingerprint=$fp")
      fp.toString + "/" + ranks.count()
    }

    Seq(false, true).foreach { record => // pass 1 warms JIT + page cache
      if (record) println(s"[soak] === recorded pass (warm), $iters rounds, n=$n ===")
      val a = run("padded_depth2", 2, padded(edgesDegPlain))
      val b = run("nopad_depth2", 2, nopad(edgesDegPlain))
      val c = run("nopad_depth5", 5, nopad(edgesDegPlain))
      val d = run("nopad_depth5_bucketed", 5, nopad(edgesDegBucketed))
      if (record)
        println(s"[soak] identical=${a == b && b == c && c == d}")
    }
    spark.stop()
  }
}
