package graft.core

import org.apache.spark.sql.SparkSession

/** One shared local-session builder for the driver-contract mains —
  * Verify (correctness) and Bench (timing) must run under IDENTICAL
  * session config, or a tuning flag applied to one but not the other
  * silently diverges what was verified from what was measured. */
object Sessions {
  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
