package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` of named SparkEntry queries to files —
  * the r10 optimization round's before/after plan artifact
  * (`plans/r10/<query>_<suffix>.txt`). Planning only (no execution),
  * under the SAME session config as Bench/Verify so join strategies
  * and partition counts match what the bench actually runs.
  *
  * usage: runMain graft.tools.PlanDump <outDir> <suffix> <name1,name2,...>
  * env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS (default 32)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, names) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Files.createDirectories(Paths.get(outDir))
    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df =
        try graft.SparkEntry.queries(name)(spark, sfDir)
        catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed to build: ${e.getMessage}")
            null
        }
      if (df != null) {
        // queryExecution.explainString == df.explain("formatted"), but
        // returned instead of printed so it can land in a file
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
