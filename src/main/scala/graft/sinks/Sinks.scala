package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sink operators (SURVEY §2.2, K1–K7).
  *
  * The reference writes Kafka topics (at-least-once + transactional),
  * an upsert-Kafka changelog, batched ClickHouse JDBC (reflection
  * binder + `@TransientSink` column skipping), Phoenix dim upserts with
  * on-the-fly DDL, and print/side-output debug sinks. Spark twins:
  * `foreachBatch` writers over any DataFrame writer; upsert = last-wins
  * merge by PK; "dynamic DDL" = schema-carrying parquet/table creation.
  */
object Sinks {

  /** K4 — ClickHouse-style batch sink (`MyClickHouseUtil.java:23-63`):
    * drop `@TransientSink` columns (`TransientSink.java:10-16`), then
    * hand the batch to a pluggable writer (JDBC in production, parquet
    * in tests). The reflection row-binder disappears: encoders bind
    * columns natively. */
  def batchSink(transientCols: Seq[String])(writer: DataFrame => Unit)
               (batch: DataFrame, batchId: Long): Unit =
    writer(batch.drop(transientCols: _*))

  /** K3/K5 — upsert sink (upsert-Kafka / Phoenix dim): last-wins merge
    * by `pk` ordered by `version` desc, overwriting the keyed store.
    * The Spark twin of a changelog topic with PK + downstream last-wins
    * dedup (`MyKafkaUtil.java:112-121`, `DimSinkFunction.java:17-51`).
    * Version ties break on a content hash of the full row — without a
    * total order the tie survivor depends on partitioning, and a
    * replayed batch could persist a different row than the original
    * run (same rule `Dedup` states: the order must be total). */
  def upsert(batch: DataFrame, existing: Option[DataFrame], pk: String,
             version: String): DataFrame = {
    val all = existing.fold(batch)(e => e.unionByName(batch))
    val contentHash = xxhash64(all.columns.sorted.map(col): _*)
    all.withColumn("__rn", row_number().over(
        Window.partitionBy(col(pk)).orderBy(col(version).desc,
          contentHash.desc)))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** K3/K5 — parquet-backed upsert writer: read-modify-write of a keyed
    * store directory (Delta MERGE stand-in for this offline build).
    * The merge is written to a temp dir and swapped in — overwriting
    * the directory still being read would silently lose the existing
    * rows (Spark plans are lazy; a cache miss would re-read a deleted
    * path). */
  def upsertParquet(batch: DataFrame, path: String, pk: String,
                    version: String): Unit = {
    val spark = batch.sparkSession
    val store = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".__bak")
    val tmp = new org.apache.hadoop.fs.Path(path + ".__tmp")
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery: a previous run may have died between the two
    // renames, leaving the only copy at .__bak
    if (!fs.exists(store) && fs.exists(bak) && !fs.rename(bak, store))
      sys.error(s"upsertParquet: failed to recover $bak -> $store")
    // only an empty/markers-only directory counts as "fresh"; a genuine
    // read error on real data files must propagate (treating it as fresh
    // would let the swap below delete the only good copy)
    val existing =
      if (fs.exists(store) && fs.listStatus(store).exists { st =>
        val n = st.getPath.getName
        n.startsWith("part-") && n.contains(".parquet")
      }) Some(spark.read.parquet(path))
      else None
    upsert(batch, existing, pk, version)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: store -> bak, tmp -> store, drop bak; every FS call checked
    // (Hadoop FileSystem signals failure via `false`, not exceptions)
    if (fs.exists(bak) && !fs.delete(bak, true))
      sys.error(s"upsertParquet: failed to delete stale $bak")
    if (fs.exists(store) && !fs.rename(store, bak))
      sys.error(s"upsertParquet: failed to move $store aside")
    if (!fs.rename(tmp, store))
      sys.error(s"upsertParquet: failed to publish $tmp -> $store")
    fs.delete(bak, true)
    ()
  }

  /** Read a CDC-maintained dim store (written by
    * `CdcRouter.fanOutEnvelope`): the last-wins winners minus delete
    * tombstones. Tombstones stay IN the store — a stale pre-delete
    * update replayed in a later batch must still lose the version
    * race to the delete (`CdcRouterSpec` proves the out-of-order
    * case) — so the filter lives here on the read path, mirroring
    * the reference's cache-invalidation-on-delete
    * (`DimSinkFunction.java:17-51`). */
  def readDim(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .filter(!col("__deleted")).drop("__deleted")

  /** K1/K2 — Kafka producer shells (`MyKafkaUtil.java:55-73`): Spark's
    * kafka sink is at-least-once; exactly-once ≈ checkpoint + idempotent
    * (upsert) downstream, which is exactly what `upsertParquet` gives.
    * Requires spark-sql-kafka at deploy. */
  def toKafka(df: DataFrame, bootstrap: String, topic: String,
              checkpoint: String) =
    df.selectExpr("CAST(null AS STRING) AS key", "to_json(struct(*)) AS value")
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** K7 — quarantine sink for corrupt rows (`BaseLogApp.java:68-69`
    * dirty side output → here a parquet quarantine path). */
  def quarantine(dirty: DataFrame, path: String): Unit =
    dirty.write.mode("append").parquet(path)
}
