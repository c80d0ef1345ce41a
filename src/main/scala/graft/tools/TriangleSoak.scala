package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.graph.Triangles

/** Measures the triangle closing-join in BOTH regimes the count-gated
  * broadcast hint covers (`Triangles.scala`): the default broadcast
  * close (edge side ≤ maxBroadcastEdges — the local[32]/sf0.1 shape)
  * and the forced shuffle fallback (`maxBroadcastEdges=0` — the
  * 100 TB shape where the edge side outgrows executor memory and the
  * Σ outdeg² wedge stream must exchange on (v, w)). Asserts the two
  * plans produce fingerprint-identical counts; integer arithmetic
  * makes bit-equality the correct check.
  *
  * usage: runMain graft.tools.TriangleSoak [sfDir]
  */
object TriangleSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("32")
    val li = Tables.lineitem(spark, sfDir)

    def run(tag: String, maxBroadcastEdges: Long,
            forceShuffle: Boolean = false): (String, Double) = {
      spark.conf.set("spark.graft.triangles.maxBroadcastEdges",
        maxBroadcastEdges.toString)
      // min gate 0 so the broadcast run exercises the explicit hint
      // path even though sf0.1's edge count sits below the default
      spark.conf.set("spark.graft.triangles.minHintEdges", "0")
      // dropping the hint is not enough at sf0.1: the materialized
      // oriented file sits under the 10 MB stats threshold, so AQE
      // quietly converts the unhinted join back to broadcast — pin
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
      val (fpB, _) = run("broadcast_close", 5000000L)
      // gate off but thresholds default: AQE sees the sub-10MB
      // oriented file and recovers the broadcast on its own — the
      // resilience claim in Triangles.scala, measured
      val (fpA, _) = run("gate_off_aqe_recovers", 0L)
      val (fpS, _) = run("shuffle_close_forced", 0L, forceShuffle = true)
      if (record) {
        println(s"[soak] identical=${fpB == fpA && fpA == fpS}")
        require(fpB == fpA && fpA == fpS,
          s"closing-join shapes diverged: $fpB / $fpA / $fpS")
      }
    }
    spark.stop()
  }
}
