package graft.tools

/** Ad-hoc winnow-kernel timing probe (not driver contract): min of 3
  * noop-sink runs from cleared state, Bench's policy, one query. */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val times = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("llm_winnow_fingerprint")(spark, d)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[winnow] runs=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f")
    spark.stop()
  }
}
