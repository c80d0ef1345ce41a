package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.TxLog

/** Incremental JOIN maintenance on the TxLog ACID store — the fourth
  * leg of the incremental-view-maintenance family (AggIndex maintains
  * aggregates, Scd2.mergeVersions dimension history, DedupIndex a
  * near-dup index; this maintains an equi-join view fed by
  * insert-only batches on BOTH sides).
  *
  * Classic delta-join IVM: with L' = L ∪ ΔL and R' = R ∪ ΔR,
  *   L' ⋈ R' = (L ⋈ R) ∪ (ΔL ⋈ R) ∪ (L ⋈ ΔR) ∪ (ΔL ⋈ ΔR)
  * so one micro-batch costs two delta-sized joins against the
  * accumulated other side plus the delta×delta join — never a rescan
  * of the view. A row whose two sides arrive in different batches
  * materializes exactly when its LAST side lands; sides are
  * symmetric, so arrival order is free.
  *
  * Replay safety: the high-water check rides the WIDE table (the last
  * table committed), so a replay after a partial failure re-runs the
  * whole batch — and every commit in the sequence is a last-wins
  * upsert of identical rows, i.e. idempotent. A re-run against
  * accumulators that already absorbed the delta can only produce
  * duplicate wide rows ACROSS the union's branches, and the pk upsert
  * folds those.
  *
  * Shape at 100 TB: the delta joins shuffle delta-sized inputs keyed
  * on the join key (the accumulated side is read through TxLog, where
  * file stats prune non-overlapping key ranges); the wide commit is
  * copy-on-write over the affected pks only. Past dim scale, the
  * documented trade is key-range partitioning of the accumulators so
  * a batch touches only overlapping partitions — same contract as
  * AggIndex. */
object JoinIndex {

  private val Ver = "join_ver"

  /** MERGE one insert-only batch pair into the join view as one ACID
    * commit sequence. Both frames must carry `key`; wide-row identity
    * is `pkCols` — the DECLARED uniqueness contract for right-side
    * rows (left must be unique on `key`). A pk collision would make
    * the upsert silently FOLD genuine bag-join rows, so each delta
    * batch is checked eagerly (one delta-sized aggregate — the
    * maintenance path buys correctness-for-cost here) and a violation
    * fails loudly. Returns the committed wide version, or the current
    * one when `batchId` is at or below the high-water mark. */
  def mergeBatch(dLeft: DataFrame, dRight: DataFrame, table: String,
                 key: String, pkCols: Seq[String], batchId: Long): Long = {
    val spark = dLeft.sparkSession
    require(dRight.groupBy(pkCols.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).isEmpty,
      s"JoinIndex.mergeBatch: pkCols ${pkCols.mkString(",")} do not " +
        "uniquely identify right-side rows in this batch — the upsert " +
        "would fold genuine join rows")
    // coalesce guards the empty-view case: a batch pair whose delta
    // joined to nothing still commits an (empty) wide version, and
    // max over no rows is NULL
    val highWater = TxLog.read(spark, s"$table/wide").map(
      _.agg(coalesce(max(col(Ver)), lit(Long.MinValue)))
        .head().getLong(0)).getOrElse(Long.MinValue)
    if (batchId <= highWater)
      return TxLog.latest(spark, s"$table/wide").map(_.version).getOrElse(0L)
    // snapshots BEFORE any commit — the delta algebra needs L and R,
    // not L' and R' (after a partial-failure replay they may already
    // contain the delta; the pk upsert folds the resulting dups)
    val leftPrev = TxLog.read(spark, s"$table/left").map(_.drop(Ver))
    val rightPrev = TxLog.read(spark, s"$table/right")
      .map(_.drop(Ver, "w_pk"))
    val pk = concat_ws("|", pkCols.map(c => col(c).cast("string")): _*)
    val deltaWide = Seq(
      rightPrev.map(r => dLeft.join(r, key)),
      leftPrev.map(l => l.join(dRight, key)),
      Some(dLeft.join(dRight, key))
    ).flatten.reduce(_ unionByName _)
      .withColumn("w_pk", pk).withColumn(Ver, lit(batchId))
    // one-sided micro-batches are normal under the side-tagged stream
    // shape: skip the empty side's commit — an empty upsert would be
    // a full copy-on-write rewrite of an unchanged accumulator
    if (!dLeft.isEmpty)
      TxLog.commitUpsert(dLeft.withColumn(Ver, lit(batchId)),
        s"$table/left", pk = key, versionCol = Ver)
    if (!dRight.isEmpty)
      TxLog.commitUpsert(
        dRight.withColumn("w_pk", pk).withColumn(Ver, lit(batchId)),
        s"$table/right", pk = "w_pk", versionCol = Ver)
    TxLog.commitUpsert(deltaWide, s"$table/wide", pk = "w_pk",
      versionCol = Ver)
  }

  /** The queryable join view at the latest committed version
    * (maintenance columns dropped). None for a never-written table. */
  def load(spark: SparkSession, table: String): Option[DataFrame] =
    TxLog.read(spark, s"$table/wide").map(_.drop(Ver, "w_pk"))

  /** Streaming attachment: ONE side-tagged stream (a `sideCol` of
    * 'L'/'R' — the single-topic CDC shape both sides usually arrive
    * on) split per micro-batch and applied through [[mergeBatch]].
    * `leftCols`/`rightCols` project each side's payload out of the
    * unioned row; monotonic foreachBatch ids make restarts replay
    * harmlessly. Caller sets checkpoint/trigger. */
  def writer(tagged: DataFrame, table: String, key: String,
             pkCols: Seq[String], sideCol: String,
             leftCols: Seq[String], rightCols: Seq[String])
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    tagged.writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) {
          mergeBatch(
            b.filter(col(sideCol) === "L").select(leftCols.map(col): _*),
            b.filter(col(sideCol) === "R").select(rightCols.map(col): _*),
            table, key, pkCols, batchId = id + 1)
          ()
        }
      }
}
