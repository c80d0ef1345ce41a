package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.Sinks

/** A complete DWS job shell — the full reference chain (§3.3) in
  * streaming form: source stream → watermarked windowed aggregate →
  * keyed upsert store, via `foreachBatch`. `LogSplit` covers the DWD
  * entry point and `CdcRouter` the DIM one; this completes the triad.
  *
  * The sink is the K3/K4 pattern: each emitted window row upserts by
  * its composite key, so replays are idempotent (the exactly-once
  * posture: checkpoint + idempotent sink).
  */
object DwsJob {

  /** events stream → 10 s windows per event_type → upsert parquet store
    * keyed by (stt, event_type). */
  def run(spark: SparkSession, events: DataFrame, storePath: String,
          watermark: String = "2 seconds"): Unit = {
    val agg = StatefulStreams.windowedAgg(events, watermark)
      .withColumn("pk", concat_ws("|", col("stt"), col("event_type")))
      .withColumn("ver", lit(1L))
    val q = agg.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Sinks.upsertParquet(batch, storePath, "pk", "ver")
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
