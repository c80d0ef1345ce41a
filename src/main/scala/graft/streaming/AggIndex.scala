package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.TxLog

/** Incremental AGGREGATE maintenance on the TxLog ACID store — the
  * third leg of the incremental-view-maintenance trio (DedupIndex
  * maintains a near-dup index, Scd2.mergeVersions maintains dimension
  * history; this maintains a per-key aggregate rollup that downstream
  * queries read instead of re-scanning the fact table).
  *
  * Classic distributive IVM: for count/sum/min/max (insert-only
  * facts), `agg(old ∪ batch) = combine(agg_old, agg(batch))`, so one
  * micro-batch costs a batch-sized partial aggregate, a semi-join read
  * of the AFFECTED keys only, and an ACID upsert of the combined rows
  * — never a fact-table rescan. Sums are taken over BIGINT-cast
  * columns so the incremental result is bit-identical to a from-
  * scratch rebuild regardless of batch order (float sums would differ
  * by summation order — callers round at read, or keep integer
  * measures, the repo-wide discipline).
  *
  * Replay safety: Structured Streaming's foreachBatch re-delivers a
  * batch after restart, and double-applying an aggregate delta is NOT
  * idempotent (unlike last-wins rows). Each merge therefore stamps its
  * rows with the batch id and SKIPS any batch at or below the table's
  * high-water mark — monotonic batch ids are the streaming contract,
  * so replays no-op and the invariant survives at-least-once delivery.
  *
  * Shape at 100 TB: the partial aggregate is map-side combined (one
  * keyed exchange over the batch, not the table); the affected-keys
  * read is a semi join that TxLog file-stats skipping can prune; the
  * commit rides TxLog's file-level pruned merge — only files whose
  * pk-hash range holds an affected key are rewritten, the rest carry
  * by reference, so commit cost tracks the batch's key count, not
  * the rollup's. */
object AggIndex {

  private val Ver = "agg_ver"

  /** Per-key partial aggregate of one fact batch: (key, ct,
    * sum_<c>.., min_<c>.., max_<c>.., sumsq_<c>..). `sumCols` and
    * `sumSqCols` are cast to BIGINT (exact, order-independent);
    * `minMaxCols` keep their type.
    *
    * `sumSqCols` extends the rollup from distributive to ALGEBRAIC
    * aggregates: with (ct, sum, sumsq) maintained exactly, variance /
    * stddev derive at READ time — var_pop·ct² = ct·sumsq − sum² is
    * pure BIGINT arithmetic, so the incremental path stays
    * bit-identical to a rebuild for any batch order. Range contract:
    * the DERIVATION needs |ct·sumsq| < 2^63 (the partials themselves
    * overflow only past Σx² ≈ 9.2e18); beyond that a reader derives
    * in DOUBLE from the still-exact integer partials. */
  def partial(batch: DataFrame, key: String, sumCols: Seq[String],
              minMaxCols: Seq[String],
              sumSqCols: Seq[String] = Nil): DataFrame = {
    val aggs: Seq[Column] =
      sumCols.map(c => sum(col(c).cast("bigint")).as(s"sum_$c")) ++
        minMaxCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))) ++
        sumSqCols.map(c => sum(col(c).cast("bigint") *
          col(c).cast("bigint")).as(s"sumsq_$c"))
    batch.groupBy(col(key))
      .agg(count(lit(1)).as("ct"), aggs: _*)
  }

  /** Combine two partial-aggregate row sets (same schema, both keyed
    * on `key`): the distributive merge (sums of squares combine like
    * any sum — that is what makes the variance family algebraic). */
  private def combine(a: DataFrame, b: DataFrame, key: String,
                      sumCols: Seq[String],
                      minMaxCols: Seq[String],
                      sumSqCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        minMaxCols.flatMap(c => Seq(min(col(s"min_$c")).as(s"min_$c"),
          max(col(s"max_$c")).as(s"max_$c"))) ++
        sumSqCols.map(c => sum(col(s"sumsq_$c")).as(s"sumsq_$c"))
    a.unionByName(b).groupBy(col(key))
      .agg(sum(col("ct")).as("ct"), aggs: _*)
  }

  /** MERGE one insert-only fact batch into the rollup table as one
    * ACID commit. Returns the committed TxLog version, or the current
    * version unchanged when `batchId` is at or below the table's
    * high-water mark (a replayed batch — applied exactly once). */
  def mergeBatch(batch: DataFrame, table: String, key: String,
                 sumCols: Seq[String], minMaxCols: Seq[String],
                 batchId: Long, sumSqCols: Seq[String] = Nil): Long = {
    val spark = batch.sparkSession
    val snap = TxLog.latest(spark, table)
    // the applied-batch mark rides the manifest props — atomic with
    // the commit it describes and O(1) to read; pre-props tables fall
    // back to the view scan once, and the next commit stamps the prop
    val highWater = snap.map(s =>
      s.props.get(TxLog.HighWaterProp).map(_.toLong).getOrElse(
        TxLog.readVersion(spark, table, s.version).map(
          _.agg(max(col(Ver))).head().getLong(0))
          .getOrElse(Long.MinValue))).getOrElse(Long.MinValue)
    if (batchId <= highWater)
      return snap.map(_.version).getOrElse(0L)
    val cur = TxLog.read(spark, table)
    val p = partial(batch, key, sumCols, minMaxCols, sumSqCols)
    val merged = cur match {
      case Some(t) =>
        // only the AFFECTED keys' current rows enter the combine; the
        // untouched rest of the table rides through the upsert as-is
        val affected = t.drop(Ver)
          .join(p.select(col(key)), Seq(key), "left_semi")
        combine(affected, p, key, sumCols, minMaxCols, sumSqCols)
      case None => p
    }
    // update-heavy: hot grouping keys recur batch over batch, so the
    // affected keys' combined rows mostly REPLACE stored rows —
    // classic probe-then-merge beats stage-first's eager batch write
    TxLog.commitUpsert(merged.withColumn(Ver, lit(batchId)),
      table, pk = key, versionCol = Ver,
      props = Map(TxLog.HighWaterProp -> batchId.toString),
      updateHeavy = true)
  }

  /** The queryable rollup at the latest committed version (maintenance
    * column dropped). None for a never-written table. */
  def load(spark: SparkSession, table: String): Option[DataFrame] =
    TxLog.read(spark, table).map(_.drop(Ver))

  /** Streaming attachment: foreachBatch writer that applies each
    * micro-batch through `mergeBatch` (batch ids are monotonic, so
    * restarts replay harmlessly). Caller sets checkpoint/trigger. */
  def writer(facts: DataFrame, table: String, key: String,
             sumCols: Seq[String], minMaxCols: Seq[String])
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    facts.writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) {
          mergeBatch(b, table, key, sumCols, minMaxCols, batchId = id + 1)
          ()
        }
      }
}
