package graft.core

import org.apache.spark.sql.SparkSession

/** Shared scratch-directory plumbing for operators that materialize
  * iteration rounds to parquet (the CC/PageRank round-file contract).
  * ONE JVM-scoped temp root with ONE shutdown hook — callers get a
  * per-call unique subdir, so repeated invocations never accumulate
  * hooks and concurrent runs never collide. A caller-facing conf key
  * redirects the parent to cluster storage; stale call dirs under a
  * configured parent are the caller's periodic cleanup (the staging
  * contract `Components.connectedComponents` documents). */
object Scratch {

  private lazy val tempRoot: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-scratch-")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(d.toFile)
    }
    d.toString
  }

  /** A fresh per-call directory `<parent>/<tag>-<uuid8>` where parent
    * is `confKey`'s value if set, else the JVM temp root. */
  def dir(spark: SparkSession, confKey: String, tag: String): String =
    spark.conf.getOption(confKey).getOrElse(tempRoot) +
      s"/$tag-${java.util.UUID.randomUUID().toString.take(8)}"
}
