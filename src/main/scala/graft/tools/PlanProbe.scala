package graft.tools

/** Executed-plan probe for driver-contract queries: runs each named
  * query at the given SF and prints scan / ReusedExchange / query-
  * stage counts from the FINAL adaptive plan (the plan must be
  * executed through its own QueryExecution — a `.write` would spawn a
  * fresh one whose adaptive plan never finalizes).
  *
  *   sbt "runMain graft.tools.PlanProbe q1 q2 ..." [SPARK_GRAFT_SF_DIR]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("8")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
                else Seq("llm_bm25_topk", "llm_retrieval_ndcg")
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(p).length
      val reused = "ReusedExchange".r.findAllIn(p).length
      val stages = "ShuffleQueryStage [0-9]+".r.findAllIn(p).length
      val bcast = "BroadcastQueryStage [0-9]+".r.findAllIn(p).length
      println(s"[probe] $q scans=$scans reused=$reused " +
        s"shuffleStages=$stages broadcastStages=$bcast")
    }
    spark.stop()
  }
}
