package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.llm.DedupOps
import graft.sinks.TxLog

/** A CONTINUOUSLY-UPDATED near-dup index: the write half of the
  * ingest-dedup story.
  *
  * `StreamingDedup.nearDupProbe` proved the read half (probe a static
  * index ≡ batch detector); this closes the loop for a production
  * ingest pipeline where the corpus grows forever: each accepted batch
  * APPENDS its LSH signatures to a TxLog-backed index table as one
  * ACID commit, so the next batch probes everything ingested before
  * it. The invariant (`StreamingDedupSpec`): after K incremental
  * commits, `loadIndex` is row-identical to `StreamingDedup.bandIndex`
  * rebuilt from scratch over the union of the K batches — incremental
  * maintenance never drifts from the rebuild.
  *
  * Design points for 100 TB:
  *  - Rows are keyed `(doc_id, band)` (one `row_key` string — the
  *    TxLog merge key is single-column), so RE-INGESTING a document
  *    replaces its rows idempotently instead of duplicating them:
  *    at-least-once delivery upstream is safe.
  *  - Bucket capping happens at LOAD, not at write: a bucket's size is
  *    a property of the WHOLE corpus, and capping per-batch would
  *    diverge from the rebuild (a bucket can cross the cap only once
  *    the union does).
  *  - The TxLog merge is file-level pruned: only index files whose
  *    row_key-hash range holds a batch key are rewritten, the rest
  *    carry by reference — commit cost tracks the batch, not the
  *    accumulated index. `optimize` compaction re-levels file sizes
  *    when incremental commits fragment the layout.
  */
object DedupIndex {

  /** One ingest batch's index rows, keyed for the ACID merge:
    * (row_key = doc_id:band, doc_id, band, band_hash, sig). */
  def indexRows(batch: DataFrame, bands: Int = 16,
                rowsPerBand: Int = 4): DataFrame =
    DedupOps.bandRows(DedupOps.signaturesNative(batch), bands, rowsPerBand)
      .select(
        concat_ws(":", col("doc_id"), col("band")).as("row_key"),
        col("doc_id"), col("band"), col("band_hash"), col("sig"))

  /** MERGE one accepted batch into the index table as one TxLog
    * commit (OCC: concurrent ingest workers serialize safely).
    * `ingestVersion` is the batch's position in the ingest order —
    * last-wins on re-ingest of the same doc. Returns the committed
    * table version. */
  def appendBatch(batch: DataFrame, table: String, ingestVersion: Long,
                  bands: Int = 16, rowsPerBand: Int = 4): Long =
    TxLog.commitUpsert(
      indexRows(batch, bands, rowsPerBand)
        .withColumn("ingest_ver", lit(ingestVersion)),
      table, pk = "row_key", versionCol = "ingest_ver")

  /** Load the probe-ready index at the latest committed version —
    * same shape and same bucket-cap policy as
    * `StreamingDedup.bandIndex`, so `nearDupProbe` consumes either
    * interchangeably. None for a never-written table. */
  def loadIndex(spark: SparkSession, table: String,
                maxBucketSize: Int = 10000): Option[DataFrame] =
    TxLog.read(spark, table).map(df =>
      DedupOps.capBuckets(df, Seq("band", "band_hash"), maxBucketSize)
        .select(col("band"), col("band_hash"),
          col("doc_id").as("idx_doc_id"), col("sig").as("idx_sig")))
}
