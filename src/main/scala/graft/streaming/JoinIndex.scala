package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
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
  * file stats prune non-overlapping key ranges); each commit rides
  * TxLog's file-level pruned merge, so its copy-on-write rewrites
  * ONLY the files whose pk-hash range holds a delta key and carries
  * every other file by reference — commit cost O(delta + overlapping
  * files), not O(view). The applied-batch high-water mark is a
  * manifest prop (atomic with the commit, O(1) to read), so replay
  * detection never scans the view either. */
object JoinIndex {

  private val Ver = "join_ver"

  /** Driver-side cap on the per-batch distinct-key harvest that feeds
    * the accumulated-side file pruning; a delta with more distinct
    * keys is view-scale and reads the full accumulated sides. */
  private val ProbeMaxKeys = 100000

  /** Minimum file count of an accumulated side before the delta-join
    * read bothers probing it — below this, uniformly-hashed delta
    * keys touch every file anyway and the probe clears nothing. */
  private val MinPruneFiles = 32

  /** Test-only crash injection for the commit sequence's three fault
    * windows (IvmScheduleProps crash schedules): a hook that throws
    * simulates the process dying at that point — before the left
    * accumulator commit, before the right accumulator commit, or in
    * the widest window the concurrent overlap creates: AFTER both
    * accumulator commits landed but BEFORE the mark-carrying wide
    * manifest publishes. Production never touches these. */
  private[graft] object faults {
    @volatile var beforeLeftCommit: () => Unit = () => ()
    @volatile var beforeRightCommit: () => Unit = () => ()
    @volatile var beforeWidePublish: () => Unit = () => ()
    def reset(): Unit = {
      beforeLeftCommit = () => ()
      beforeRightCommit = () => ()
      beforeWidePublish = () => ()
    }
  }

  /** Collision-safe wide-row key over `pkCols`: JSON-encode the pk
    * struct with nulls kept explicit. A plain delimiter concat would
    * fold distinct tuples — ("a|b","c") vs ("a","b|c"), and
    * concat_ws silently SKIPS nulls so ("a",null) ≡ ("a") — and the
    * upsert would then silently merge genuinely distinct wide rows.
    * JSON escaping keeps the encoding injective on distinct tuples
    * (field order is the struct's, fixed by `pkCols`). */
  private def widePk(pkCols: Seq[String]) =
    to_json(struct(pkCols.map(col): _*),
      Map("ignoreNullFields" -> "false"))

  /** MERGE one insert-only batch pair into the join view as one ACID
    * commit sequence. Both frames must carry `key`; wide-row identity
    * is `pkCols` — the DECLARED uniqueness contract for right-side
    * rows (left must be unique on `key`). A pk collision would make
    * the upsert silently FOLD genuine bag-join rows, so BOTH
    * accumulator commits declare `failOnDupPk`: the contract is
    * proven for free by the pruned merge's hash probe (after the
    * replay early-return so skipped batches don't pay it) and a
    * violation fails loudly. Returns the committed wide version, or
    * the current one when `batchId` is at or below the high-water
    * mark. An empty batch pair still commits the (empty) wide delta,
    * advancing the high-water prop — with the pruned merge that is a
    * metadata-only commit, so restarts never re-replay it. */
  def mergeBatch(dLeft: DataFrame, dRight: DataFrame, table: String,
                 key: String, pkCols: Seq[String], batchId: Long): Long = {
    import TxLog.timed
    val spark = dLeft.sparkSession
    val wideSnap = TxLog.latest(spark, s"$table/wide")
    val highWater = wideSnap.map(s =>
      s.props.get(TxLog.HighWaterProp).map(_.toLong).getOrElse {
        // legacy tables (pre-props): fall back to the view scan once;
        // the next commit stamps the prop
        TxLog.readVersion(spark, s"$table/wide", s.version).map(
          _.agg(coalesce(max(col(Ver)), lit(Long.MinValue)))
            .head().getLong(0)).getOrElse(Long.MinValue)
      }).getOrElse(Long.MinValue)
    if (batchId <= highWater)
      return wideSnap.map(_.version).getOrElse(0L)
    // key the right delta ONCE and cache it — the uniqueness check,
    // the right commit (probe + write) and two deltaWide branches all
    // consume it
    val rightKeyed = dRight.withColumn("w_pk", widePk(pkCols)).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the delta sides' DISTINCT join keys, driver-bounded: one
    // delta-sized job each, harvesting the raw key (to probe the
    // right accumulator's key-column blooms) and its xxhash64 (to
    // probe the left accumulator's pk-hash blooms — left pk IS the
    // join key). Past the cap the delta is view-scale anyway and the
    // probe would buy nothing: fall back to the full read. The probe
    // is also GATED on the pruned side's file count — with only a
    // handful of files (local SFs) uniformly-hashed delta keys land
    // in every file, so the probe can clear nothing and is pure
    // overhead; at warehouse scale (thousands of files) a small delta
    // clears all but O(delta) of them, which is where this pays.
    def keyProbe(df: DataFrame): Option[Array[org.apache.spark.sql.Row]] = {
      val rows = timed("jx:key-probe")(df
        .select(col(key).as("__k"), xxhash64(col(key)).as("__h"))
        .distinct().limit(ProbeMaxKeys + 1).collect())
      if (rows.length > ProbeMaxKeys) None else Some(rows)
    }
    def fileCount(side: String): Int =
      TxLog.latest(spark, s"$table/$side").map(_.files.length).getOrElse(0)
    // The pruning probes hash by PHYSICAL type: the left accumulator's
    // pk-hash blooms were built from xxhash64 of ITS stored key dtype,
    // and the right accumulator's raw-key blooms from the parquet
    // encoding of ITS stored dtype. The SAME numeric value hashes
    // differently as int vs long, so a dtype-mismatched probe would
    // falsely CLEAR holder files — silently dropped join rows where a
    // plain join would have type-coerced and matched. Enforce dtype
    // agreement loudly up front (deltas against each other AND against
    // what the accumulators already store) instead of debugging
    // missing rows later.
    val keyType = dLeft.schema(key).dataType
    require(dRight.schema(key).dataType == keyType,
      s"JoinIndex.mergeBatch($table): join-key '$key' dtype mismatch " +
        s"between deltas ($keyType vs ${dRight.schema(key).dataType}) " +
        "— the file-pruning probes hash by physical type; cast both " +
        "sides to one dtype")
    Seq("left", "right").foreach { side =>
      TxLog.read(spark, s"$table/$side")
        .flatMap(_.schema.find(_.name == key).map(_.dataType))
        .foreach(t => require(t == keyType,
          s"JoinIndex.mergeBatch($table): join-key '$key' delta dtype " +
            s"$keyType does not match the $side accumulator's stored " +
            s"$t — mismatched probes would falsely clear holder files; " +
            "cast the delta to the stored dtype"))
    }
    // raw-key bloom probes (the right accumulator's indexCols blooms)
    // support integral/string/float/binary values only; any other key
    // dtype (decimal, timestamp, ...) skips that probe and reads the
    // side whole — correct, just unpruned. The LEFT probe always
    // hashes to xxhash64 longs, so it is dtype-safe once the equality
    // above holds.
    val rawKeyProbeable = keyType match {
      case IntegerType | LongType | StringType |
           DoubleType | FloatType | BinaryType => true
      case _ => false
    }
    val leftKeys =
      if (rawKeyProbeable && fileCount("right") >= MinPruneFiles)
        keyProbe(dLeft)
      else None
    val rightKeys =
      if (fileCount("left") >= MinPruneFiles) keyProbe(rightKeyed) else None
    // snapshots BEFORE any commit — the delta algebra needs L and R,
    // not L' and R' (after a partial-failure replay they may already
    // contain the delta; the pk upsert folds the resulting dups).
    // Each accumulated side is read PRUNED to the files that may hold
    // the OTHER side's delta keys (pk-hash blooms on the left, raw
    // key-column blooms on the right — committed via `indexCols`), so
    // a small-delta batch reads O(delta + overlapping files) of the
    // view, never all of it.
    val leftPrev = (rightKeys match {
      case Some(ks) => TxLog.readMayContain(spark, s"$table/left",
        TxLog.PkHashCol, ks.map(_.getLong(1): Any))
      case None => TxLog.read(spark, s"$table/left")
    }).map(_.drop(Ver))
    // keep the STORED w_pk: every wide row's key rides its right side,
    // so no branch recomputes the JSON encoding
    val rightPrev = (leftKeys match {
      case Some(ks) => TxLog.readMayContain(spark, s"$table/right",
        key, ks.map(_.get(0)))
      case None => TxLog.read(spark, s"$table/right")
    }).map(_.drop(Ver))
    val deltaWide = Seq(
      rightPrev.map(r => dLeft.join(r, key)),
      leftPrev.map(l => l.join(rightKeyed, key)),
      Some(dLeft.join(rightKeyed, key))
    ).flatten.reduce(_ unionByName _)
      .withColumn(Ver, lit(batchId))
    // all THREE commits run CONCURRENTLY on the data plane — the
    // tables are independent and deltaWide's inputs were
    // snapshot-resolved above — but the wide MANIFEST publish (which
    // carries the high-water prop) awaits both accumulator commits
    // through `publishGate`, so it still lands strictly last: a crash
    // anywhere replays the whole batch and the exactly-once mark only
    // advances once all three landed. A failed accumulator commit
    // aborts the wide publish through the gate (its staged files are
    // dropped).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fLeft = Future {
      faults.beforeLeftCommit()
      // no isEmpty pre-check: commitUpsert's probe detects an empty
      // batch for free and turns the commit into a no-op
      timed("jx:left-commit")(
        TxLog.commitUpsert(dLeft.withColumn(Ver, lit(batchId)),
          s"$table/left", pk = key, versionCol = Ver,
          failOnDupPk = true))
    }
    val fRight = Future {
      faults.beforeRightCommit()
      // the right-side uniqueness contract (pkCols unique per batch —
      // w_pk is injective on the pk tuple, so w_pk-unique ⟺
      // pkCols-unique) is enforced INSIDE the commit: the stage-first
      // probe already harvests the batch pk hashes, so the proof is
      // free instead of a second delta-sized aggregate. A violation
      // still aborts before the right/wide commits land, and an
      // already-landed left commit replays idempotently.
      // `indexCols = key`: the right accumulator's files carry blooms
      // + stats on the raw JOIN key too, so later batches' ΔL ⋈ R
      // prunes right-side files by their delta keys
      timed("jx:right-commit")(TxLog.commitUpsert(
        rightKeyed.withColumn(Ver, lit(batchId)),
        s"$table/right", pk = "w_pk", versionCol = Ver,
        failOnDupPk = true, indexCols = Seq(key)))
    }
    try
      timed("jx:wide-commit")(
        TxLog.commitUpsert(deltaWide, s"$table/wide", pk = "w_pk",
          versionCol = Ver,
          props = Map(TxLog.HighWaterProp -> batchId.toString),
          publishGate = () => {
            Await.result(fLeft.zip(fRight), Duration.Inf)
            // both accumulators have landed; the wide manifest has
            // not — the exact window the commit overlap widened
            faults.beforeWidePublish()
          }))
    finally { rightKeyed.unpersist(false); () }
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
