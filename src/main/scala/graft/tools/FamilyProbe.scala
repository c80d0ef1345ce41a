package graft.tools

/** Ad-hoc timing probe for the dedup-family queries (not driver
  * contract): min of 2 noop-sink runs each from cleared state. */
object FamilyProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = Seq("llm_dedup_minhash", "llm_dedup_ngram_jaccard",
      "llm_dedup_simhash", "llm_dedup_cc", "llm_dedup_canonical",
      "llm_dedup_cluster_stats", "llm_twin_minhash_est", "llm_corpus_build")
    // full warm pass first: the bench context has 90 queries of JIT
    // warmup before this family; measure steady state, not class load
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, d)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[family] warm $n failed: $e") }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    names.foreach { n =>
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, d)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[family] $n%-28s min=${times.min}%.2f s (${times.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
