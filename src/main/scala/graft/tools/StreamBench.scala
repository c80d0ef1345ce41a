package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{Ev, StatefulStreams}

/** Streaming-throughput benchmark: drives the stateful kernels with the
  * built-in `rate` source at an offered load high enough to saturate
  * them, and reports the sustained rows/sec each kernel actually
  * processes (from `StreamingQueryProgress`).
  *
  * This is the streaming counterpart of `graft.Bench`: the reference is
  * a parallelism-1 Flink deployment consuming Kafka topics
  * (`BaseLogApp.java:34`), so its ceiling is one task's consumption
  * rate; these numbers show the same kernels sustaining millions of
  * rows/sec on one node — and they scale out by key, since every kernel
  * is keyed state behind a hash exchange.
  *
  * Env knobs: SPARK_GRAFT_STREAM_RPS (offered rows/sec, default 2M),
  * SPARK_GRAFT_STREAM_SECS (measure window per kernel, default 20),
  * SPARK_GRAFT_CPUS (default 32).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rps = sys.env.getOrElse("SPARK_GRAFT_STREAM_RPS", "2000000").toLong
    val secs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "20").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // rate rows → the events-table shape the kernels expect
    def events: DataFrame = spark.readStream.format("rate")
      .option("rowsPerSecond", rps)
      .option("numPartitions", 8)
      .load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(100000L)).as("user_id"),
        element_at(
          array(lit("view"), lit("cart"), lit("purchase"), lit("login")),
          (pmod(col("value"), lit(4L)) + 1).cast("int")).as("event_type"),
        (pmod(col("value"), lit(1000L)) / lit(10.0)).as("value"))

    val kernels: Seq[(String, DataFrame => DataFrame)] = Seq(
      "windowed_agg" -> (df => StatefulStreams.windowedAgg(df)),
      "daily_uv_dedup" -> (df => StatefulStreams.dailyUvStream(df)),
      "first_wins_dedup" -> (df => StatefulStreams.firstWinsStream(df.as[Ev]).toDF),
      "last_wins_dedup" -> (df => StatefulStreams.lastWinsStream(df.as[Ev]).toDF),
      "bounce_sessions" -> (df => StatefulStreams.bounceStream(df.as[Ev]).toDF))

    val results = kernels.map { case (name, k) =>
      val q = k(events).writeStream.format("noop").outputMode("append").start()
      Thread.sleep(secs * 1000L)
      // sustained throughput = input rows / trigger time, skipping the
      // first batches (source ramp-up + state-store cold start) — but a
      // saturated kernel may finish few big batches in the window, so
      // always keep at least the last one
      val all = q.recentProgress.filter(_.numInputRows > 0)
      val progs = all.drop(math.min(2, math.max(all.length - 1, 0)))
      q.stop()
      val rows = progs.map(_.numInputRows).sum
      val ms = progs.map(_.durationMs.get("triggerExecution").longValue()).sum
      val rowsPerSec = if (ms > 0) rows * 1000.0 / ms else 0.0
      System.err.println(f"[stream-bench] $name%-18s ${rowsPerSec / 1e6}%.2f M rows/s over ${progs.length} batches")
      name -> rowsPerSec
    }
    val ks = results.map { case (k, v) => s""""$k":${v.round}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"stream_throughput","unit":"rows_per_sec","kernels":$ks,"offered_rps":$rps,"measure_secs":$secs}""")
    spark.stop()
  }
}
