package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.graph.Triangles

/** Measures the triangle adjacency-intersect close in BOTH regimes
  * (`Triangles.scala`): the default shape where AQE converts the two
  * adjacency-attach joins to broadcasts off parquet stats (the
  * local[32]/sf0.1 regime) and the forced-shuffle fallback (broadcast
  * thresholds pinned off — the 100 TB regime where the node-sized
  * adjacency frame outgrows executor memory and both attaches run as
  * O(m)-row shuffle joins). Asserts the two plans produce
  * fingerprint-identical counts; integer arithmetic makes bit-equality
  * the correct check.
  *
  * usage: runMain graft.tools.TriangleSoak [sfDir]
  */
object TriangleSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("32")
    val li = Tables.lineitem(spark, sfDir)

    def run(tag: String, forceShuffle: Boolean): (String, Double) = {
      // dropping hints is not enough at sf0.1: the materialized
      // adjacency file sits under the 10 MB stats threshold, so AQE
      // quietly converts the attach joins back to broadcast — pin
      // both thresholds off so the shuffle run IS the shuffle shape
      val thr = if (forceShuffle) "-1" else "10485760"
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", thr)
      val t0 = System.nanoTime()
      val counts = Triangles.copurchaseTriangles(li)
      val agg = counts.agg(
        sum(expr("triangles * (node % 997 + 1)")).as("fp"),
        sum(col("triangles")).as("tot"), count(lit(1)).as("n")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val fp = s"${agg.getLong(0)}/${agg.getLong(1)}/${agg.getLong(2)}"
      println(f"[soak] $tag%-24s $sec%6.2f s  fingerprint=$fp")
      (fp, sec)
    }

    Seq(false, true).foreach { record => // pass 1 warms JIT + page cache
      if (record) println("[soak] === recorded pass (warm) ===")
      val (fpB, _) = run("broadcast_attach", forceShuffle = false)
      val (fpS, _) = run("shuffle_attach_forced", forceShuffle = true)
      if (record) {
        println(s"[soak] identical=${fpB == fpS}")
        require(fpB == fpS,
          s"attach-join shapes diverged: $fpB / $fpS")
      }
    }
    spark.stop()
  }
}
