package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `sfDir` (e.g.
  * `/root/testdata/sf0.01`) and reads one parquet file per table. Plain
  * `spark.read.parquet` keeps the scan declarative so Catalyst pushes
  * filters/column pruning into the parquet reader (verified via
  * `.explain("formatted")`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a (small-file) input across the cluster before CPU-heavy
    * narrow work — gated on `spark.graft.spread.enabled`, DEFAULT OFF
    * (identity). The driver's test parquet has a single row group, so
    * a scan is ONE task and everything narrow after it runs serially;
    * `Sessions.local` enables the gate so one cheap round-robin shuffle
    * restores local parallelism. At production scale inputs are already
    * multi-partition and the extra exchange would be a full re-shuffle
    * of the corpus in front of every document operator — so the shipped
    * default keeps the plan exchange-free (PlanSpec asserts this). */
  def spread(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("spark.graft.spread.enabled", "false") == "true")
      df.repartition()
    else df

  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) — which Spark's vectorized reader
    * rejects, so `Sessions.local` sets
    * `spark.sql.legacy.parquet.nanosAsLong` and the nanos Long is
    * truncated to micros here, matching DuckDB's nanos→micros
    * truncation bit-for-bit (`ts div 1000` floors; all values are
    * positive) — and plain TIMESTAMP(MICROS), which arrives as
    * TIMESTAMP_NTZ and only needs a cast to the session-local type
    * (identical instants under the UTC session TZ, same values DuckDB
    * reads). Dispatch on the scanned type so both generations read to
    * the same column. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // a LongType scan is only nanos under the nanosAsLong flag; a
        // future generation encoding MICROS as plain INT64 would land
        // here too and be scaled 1000× wrong. Guard on magnitude:
        // nanos for any date past 1973 exceed 1e17, micros stay below
        // it until year ~5138 — raise per-row instead of mis-scaling.
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(if(ts is null or ts >= 100000000000000000, " +
            "ts div 1000, " +
            "raise_error(concat('events.ts INT64 magnitude is not nanos " +
            "(got ', cast(ts as string), '); testdata encoding changed')))"
            + ")"))
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType => // micros encoding
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case other => sys.error(
        s"events.ts scanned as unsupported type $other — inspect the " +
          "new testdata generation rather than casting blindly")
    }
  }
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
