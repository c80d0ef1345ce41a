package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Tokenize
import graft.operators.llm.{Components, DedupOps}

/** Scale soak for the full dedup spine (ad hoc, not driver contract):
  * shingle → MinHash/LSH candidates → exact n-gram-Jaccard verify →
  * connected components → canonicalize, run as ONE pipeline on a
  * synthetically inflated corpus (default 10× sf0.1 with a 10% planted
  * near-dup cluster rate), with per-stage wall-clock and total/peak
  * shuffle bytes from a stage listener. Results are recorded in
  * SCALE.md §"Dedup / LSH family".
  *
  * usage: runMain graft.tools.DedupSoak [sfDir] [copies]
  */
object DedupSoak {

  /** Inflate `documents` by `copies`: every 10th doc's replicas are
    * true near-duplicates (every 15th token dropped, shingle Jaccard
    * ≈ 0.7 — clusters of size `copies`); all other docs' replicas are
    * salted with replica-unique hash tokens in every second position,
    * pushing shingle overlap far below any detection band (distinct
    * content at 10× volume, not accidental dups). */
  def inflate(documents: DataFrame, copies: Int): DataFrame = {
    val ws = Tokenize.tokens(col("text"))
    val reps = (1 until copies).map { r =>
      val nearDup = concat_ws(" ",
        filter(zip_with(ws, sequence(lit(0), size(ws) - 1), (w, i) =>
          when(i % (14 + r) === 0, lit(null)).otherwise(w)), w => w.isNotNull))
      val salted = concat_ws(" ",
        zip_with(ws, sequence(lit(0), size(ws) - 1), (w, i) =>
          when(i % 2 === 0,
            conv(abs(xxhash64(col("doc_id"), lit(r), i)), 10, 36)).otherwise(w)))
      documents.select(
        (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
        when(col("doc_id") % 10 === 0, nearDup).otherwise(salted).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    reps.foldLeft(documents.select("doc_id", "text", "lang", "source", "n_chars"))(
      _.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.core.Sessions.local("32")
    val shuffleTotal = new java.util.concurrent.atomic.AtomicLong
    val shufflePeak = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val w = s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shuffleTotal.addAndGet(w)
        shufflePeak.getAndUpdate(p => math.max(p, w))
        ()
      }
    })
    def mb(b: Long): String = f"${b / 1048576.0}%.0f MB"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[soak] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(shuffle total=${mb(shuffleTotal.get)} peakStage=${mb(shufflePeak.get)})")
      r
    }

    val corpus = inflate(Tables.documents(spark, sfDir), copies)
    val t0 = System.nanoTime()
    val nDocs = time("inflate+count")(corpus.count())

    // stage 1+2: LSH candidates + exact verify (one pipeline — the
    // shared shingle exchange is reused by signature and gram sides)
    val verified = DedupOps.ngramJaccardPairs(corpus)
    val scratch = java.nio.file.Files.createTempDirectory("soak-").toString
    time("lsh+jaccard verify -> parquet") {
      verified.write.mode("overwrite").parquet(s"$scratch/pairs")
    }
    val pairs = spark.read.parquet(s"$scratch/pairs")
    val nPairs = pairs.count()

    // stage 3: cluster the verified pairs
    val cc = time("connected components") {
      val c = Components.connectedComponents(
        pairs.select(col("doc_a"), col("doc_b")))
      c.write.mode("overwrite").parquet(s"$scratch/cc"); spark.read.parquet(s"$scratch/cc")
    }
    // stage 4: one canonical doc per cluster
    val kept = time("canonicalize") {
      Components.canonicalize(corpus, pairs).count()
    }
    val totalSec = (System.nanoTime() - t0) / 1e9

    // planted-structure validation: every 10th base doc forms a
    // cluster of `copies`. The replica offset (10^7) is a multiple of
    // 10, so `doc_id % 10 == 0` identifies planted docs across base
    // AND replicas. The rest of cc splits into organic base-corpus
    // near-dups (ids < 10^7 — real duplicates the generator planted in
    // the source table; benign) and clustered SALTED replicas — those
    // are distinct by construction, so any of them in cc is a false
    // positive the soak must surface, never fold into recall.
    val planted = cc.filter(col("doc_id") % 10 === 0)
    val organic = cc.filter(col("doc_id") % 10 =!= 0 &&
      col("doc_id") < 10000000L)
    val saltedFp = cc.filter(col("doc_id") % 10 =!= 0 &&
      col("doc_id") >= 10000000L)
    val clusters = cc.groupBy("component_id").count()
    println(s"[soak] docs=$nDocs verifiedPairs=$nPairs " +
      s"clusters=${clusters.count()} clusteredDocs=${cc.count()} " +
      s"plantedClustered=${planted.count()} organicClustered=${organic.count()} " +
      s"saltedFalsePos=${saltedFp.count()} kept=$kept")
    println(f"[soak] TOTAL ${totalSec}%.1f s = ${nDocs / totalSec}%.0f docs/s " +
      s"(shuffle total=${mb(shuffleTotal.get)} peak stage=${mb(shufflePeak.get)})")
    spark.stop()
  }
}
