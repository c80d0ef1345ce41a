package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import graft.operators.dim.Scd2

/** The streaming half of incremental SCD2 maintenance: attach the
  * TxLog merge to a changelog stream so each micro-batch lands as one
  * ACID commit on the dimension history — the `DedupIndex.appendBatch`
  * pattern applied to the dim layer.
  *
  * `scd2Stream` (StatefulStreams) is the STATE-BASED twin: it emits
  * closed intervals from flatMapGroupsWithState but leaves the open
  * versions in stream state. This writer instead maintains the WHOLE
  * queryable SCD2 table (open + closed versions) outside the stream,
  * which is what downstream point-in-time lookups join against.
  *
  * Correctness rides entirely on `Scd2.mergeVersions`' rebuild
  * equivalence (Scd2MergeSpec): per-key partial rebuild makes each
  * batch idempotent under at-least-once re-delivery — exactly the
  * foreachBatch replay contract after a restart — and correct under
  * out-of-order versions that splice mid-chain. `mergeVersion` is the
  * micro-batch id (monotonic by the Structured Streaming contract).
  * Empty batches are skipped: a no-row merge would still rewrite the
  * COW snapshot for nothing.
  */
object Scd2Maintenance {

  /** Build the writer; caller sets checkpointLocation/trigger and
    * calls `.start()`. `versions` must carry `Scd2.VersionCols`. */
  def writer(versions: DataFrame, table: String): DataStreamWriter[Row] =
    versions.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Scd2.mergeVersions(batch, table, mergeVersion = batchId + 1)
          ()
        }
      }
}
