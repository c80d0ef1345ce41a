package graft.tools

/** Run one SparkEntry query to parquet for ad-hoc oracle comparison
  * (not part of the driver contract).
  * usage: runMain graft.tools.OneQuery <name> <sfDir> <outDir>
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = graft.core.Sessions.local("32")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
