package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Brin & Page '98) in FIXED-POINT integer
  * arithmetic — the iterative-graph-algorithm capability (the
  * dedup spine's connected components is the other), implemented so
  * that every iteration is EXACTLY replayable by the SQL oracle:
  * ranks are BIGINT micros-of-mass (SCALE=10^12), per-edge
  * contribution is integer division `rank DIV out_degree`, and the
  * damping update is `(15·init + 85·Σcontrib) DIV 100`. Integer sums
  * are order-independent, so unlike float PageRank the result is
  * bit-identical regardless of aggregation order, partitioning, or
  * engine — no rounding discipline needed, the oracle unrolls the
  * same ten iterations as chained CTEs and the hashes must match
  * exactly.
  *
  * The flagship graph is the customer↔part co-purchase bipartite
  * graph (edges both directions, so no dangling-mass redistribution
  * term is needed — every node has out-degree ≥ 1). Node ids are
  * parity-encoded (customer → 2k, part → 2k+1) to keep one BIGINT key
  * space.
  *
  * Shape at 100 TB: each iteration is one keyed join (edges ⋈ ranks
  * on src — the big exchange, amortizable by pre-partitioning both on
  * src) + a map-side-combined sum keyed on dst + a left join back to
  * the node set. Degree and node tables are computed once. Iterations
  * build one linear lineage chain; for graphs where 10 chained plans
  * stress the optimizer, cut lineage with the same parquet round
  * files the CC kernel uses (`Components.connectedComponents`) — the
  * arithmetic is unaffected, which is the point of fixed-point. */
object PageRank {

  val Scale = 1000000000000L

  /** Symmetric customer↔part co-purchase edges, parity-encoded. */
  def customerPartGraph(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val e = lineitem.select(col("l_orderkey"), col("l_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  def pageRank(edges: DataFrame, iters: Int = 10): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val n = nodes.count() // one scalar job, same contract as kmeans k
    val init = Scale / n
    var ranks = nodes.withColumn("r", lit(init))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r DIV deg")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          // init fits int32 for graphs over ~500 nodes, so the literal
          // MUST be anchored to BIGINT or ANSI mode overflows on 15·init
          expr(s"(15 * CAST($init AS BIGINT) + " +
            "85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100").as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_fp"))
  }

  def copurchasePageRank(lineitem: DataFrame, orders: DataFrame,
                         iters: Int = 10): DataFrame =
    pageRank(customerPartGraph(lineitem, orders), iters)
}
