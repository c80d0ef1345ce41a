package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.Sinks

/** A complete DWS job shell — the full reference chain (§3.3) in
  * streaming form: source stream → watermarked windowed aggregate →
  * keyed upsert store, via `foreachBatch`. `LogSplit` covers the DWD
  * entry point and `CdcRouter` the DIM one; this completes the triad.
  *
  * Exactly-once posture = checkpoint + idempotent keyed sink: pass
  * `checkpoint` so a restarted query resumes window state and offsets
  * (without it, windows not yet past the watermark die with the query —
  * standard append-mode semantics), and each emitted row upserts by its
  * composite key with a write-time version, so replayed batches
  * deterministically overwrite rather than duplicate and reprocessing
  * runs supersede stale rows.
  */
object DwsJob {

  /** events stream → 10 s windows per event_type → upsert parquet store
    * keyed by (stt, event_type). */
  def run(spark: SparkSession, events: DataFrame, storePath: String,
          checkpoint: Option[String] = None,
          watermark: String = "2 seconds"): Unit = {
    val agg = StatefulStreams.windowedAgg(events, watermark)
      .withColumn("pk", concat_ws("|", col("stt"), col("event_type")))
    val writer = agg.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // version = write-time millis, NOT batchId: a reprocessing run
        // with a fresh checkpoint restarts batchIds at 0, so corrected
        // rows would permanently lose to stale store rows with higher
        // versions. Wall-clock always moves forward across runs; a
        // same-checkpoint replay re-writes identical content, so the
        // later version is still idempotent in effect.
        if (!batch.isEmpty)
          Sinks.upsertParquet(
            batch.withColumn("ver", lit(System.currentTimeMillis())),
            storePath, "pk", "ver")
      }
    val q = checkpoint
      .fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
