package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TimeFns
import graft.sinks.{Sinks, TxLog}

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

  /** The full reference chain as ONE transform: raw log JSON →
    * `LogSplit` parse/quarantine → page-split DWD filter → watermarked
    * 10 s windowed aggregate per app version. Shared by the streaming
    * soak and its batch twin — in batch Catalyst eliminates the
    * watermark node, so the SAME definition is the correctness oracle
    * for the streaming run (`DwsJobSpec`). */
  def logPageWindowAgg(raw: DataFrame): DataFrame =
    LogSplit.parse(raw)
      .filter(!col("is_dirty")).select(col("parsed.*"))
      .filter(col("start").isNull && col("page").isNotNull)
      .select(col("common")("vc").as("vc"),
        col("page")("during_time").as("during_time"),
        timestamp_millis(col("ts")).as("ets"))
      .withWatermark("ets", "2 seconds")
      .groupBy(window(col("ets"), "10 seconds").as("w"), col("vc"))
      .agg(count(lit(1)).as("pv_ct"), sum(col("during_time")).as("dur_sum"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("vc"), col("pv_ct"), col("dur_sum"))

  /** Streaming shell for `logPageWindowAgg` ending in the ACID store:
    * source stream → parse/split/filter/window → `TxLog.commitUpsert`
    * keyed by (stt, vc), through `foreachBatch` with a checkpoint.
    * Exactly-once posture: offsets + window state resume from the
    * checkpoint, and any replayed batch re-upserts identical rows by
    * key (the write-time version supersedes, content is unchanged), so
    * stop/restart anywhere in the middle never duplicates or loses a
    * window. */
  def runLogPipeline(spark: SparkSession, rawStream: DataFrame,
                     table: String, checkpoint: String): Unit = {
    val agg = logPageWindowAgg(rawStream)
      .withColumn("pk", concat_ws("|", col("stt"), col("vc")))
    val q = agg.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          TxLog.commitUpsert(
            batch.withColumn("ver", lit(System.currentTimeMillis())),
            table, "pk", "ver")
          ()
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
