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
      // events.parquet carries TIMESTAMP(NANOS), which the vectorized
      // reader rejects; read nanos as Long session-wide (set ONCE here,
      // not per-read — a conf flipped inside a reader is a hidden side
      // effect on unrelated readers in the same session)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local-mode accommodation: the driver's test parquet is a single
      // row group per table, so narrow CPU-heavy pipelines run as ONE
      // task without a spreading shuffle. Default is OFF (Tables.spread
      // is an identity then) — at production scale inputs are already
      // multi-partition and the extra exchange is pure cost.
      .config("spark.graft.spread.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
