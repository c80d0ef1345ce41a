package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.llm.{Sampling, TextAnalysis}

/** Scale soak for the curation chain (ad hoc, not driver contract):
  * quality gate → DSIR scoring → LM perplexity → combined keep
  * verdict → mixture rebalance → sequence packing, run as ONE
  * pipeline on the synthetically inflated corpus (`DedupSoak.inflate`
  * — default 10× sf0.1), with per-stage wall-clock and shuffle bytes.
  * Results are recorded in SCALE.md §"Text analysis".
  *
  * usage: runMain graft.tools.CurationSoak [sfDir] [copies]
  */
object CurationSoak {

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

    val corpus = DedupSoak.inflate(Tables.documents(spark, sfDir), copies)
    val t0 = System.nanoTime()
    val nDocs = time("inflate+count")(corpus.count())

    // stage 1–3: the three scoring kernels, materialized through
    // parquet like a real build would stage them (lineage cut; each
    // score table is reused downstream)
    val scratch = java.nio.file.Files.createTempDirectory("curation-").toString
    time("quality gate -> parquet") {
      TextAnalysis.qualityGate(corpus)
        .write.mode("overwrite").parquet(s"$scratch/gate")
    }
    time("dsir scores -> parquet") {
      TextAnalysis.importanceScores(corpus)
        .write.mode("overwrite").parquet(s"$scratch/dsir")
    }
    time("lm perplexity -> parquet") {
      TextAnalysis.lmPerplexity(corpus)
        .write.mode("overwrite").parquet(s"$scratch/ppl")
    }

    // stage 4: combined verdict — gate pass AND target-like AND
    // sub-threshold perplexity (doc_id-keyed joins, one exchange class)
    val gate = spark.read.parquet(s"$scratch/gate")
    val dsir = spark.read.parquet(s"$scratch/dsir")
    val ppl = spark.read.parquet(s"$scratch/ppl")
    val survivors = time("combined verdict") {
      val s = corpus.join(gate.filter(col("keep")).select("doc_id"), "doc_id")
        .join(dsir.filter(col("dsir_score") > -0.5).select("doc_id"), "doc_id")
        .join(ppl.filter(col("ppl") < 5000).select("doc_id"), "doc_id")
      s.write.mode("overwrite").parquet(s"$scratch/survivors")
      spark.read.parquet(s"$scratch/survivors")
    }
    val nSurvivors = survivors.count()

    // stage 5+6: rebalance the surviving mixture, pack for training
    val nRebalanced = time("mixture rebalance")(
      Sampling.mixtureRebalance(survivors).count())
    val nPacks = time("sequence packing")(
      Sampling.sequencePacking(survivors)
        .agg(countDistinct(col("lang"), col("source"), col("pack_id")))
        .collect()(0).getLong(0))

    // capstone A: the corpusBuild COMPOSED chain (gate → exact-dedup
    // canonical → pack) as ONE uncut pipeline — the thing the staged
    // run above deliberately isn't: no parquet lineage cuts, every
    // exchange planned together, proving the composition (not just
    // its stages) holds at this scale
    val nBuilt = time("corpusBuild composed chain") {
      TextAnalysis.corpusBuild(corpus).count()
    }

    // capstone A2 (r4): the curationV2 COMPOSED chain (gopher gate →
    // PII scrub → per-host cap → exact dedup on scrubbed text →
    // per-host packing) as ONE uncut plan
    val nBuiltV2 = time("curationV2 composed chain") {
      graft.operators.llm.Scrub.curationV2(corpus).count()
    }

    // capstone B: semanticDedup at 64 cells over a 16×-amplified
    // embedding corpus (32k vectors) — kmeans + cell-bounded pair scan
    // + connected components + canonical selection as one pipeline
    val twins = graft.operators.llm.Similarity.withVectorTwins(
      AnnSoak.amplified(Tables.embeddings(spark, sfDir), 16))
    val nVecs = twins.count()
    val nCanonical = time(s"semanticDedup (64 cells, $nVecs vecs)") {
      graft.operators.llm.Similarity
        .semanticDedup(twins, nCentroids = 64)
        .filter(col("is_canonical") === 1).count()
    }

    def peakHeapMb: Long =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans
        .asInstanceOf[java.util.List[java.lang.management.MemoryPoolMXBean]]
        .toArray(Array.empty[java.lang.management.MemoryPoolMXBean])
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
        .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L))
        .sum / 1048576
    val totalSec = (System.nanoTime() - t0) / 1e9
    println(s"[soak] docs=$nDocs survivors=$nSurvivors " +
      s"rebalanced=$nRebalanced packs=$nPacks built=$nBuilt " +
      s"builtV2=$nBuiltV2 vecs=$nVecs canonical=$nCanonical")
    println(f"[soak] TOTAL ${totalSec}%.1f s = ${nDocs / totalSec}%.0f docs/s " +
      s"(shuffle total=${mb(shuffleTotal.get)} peak stage=${mb(shufflePeak.get)} " +
      s"peak driver heap=${peakHeapMb} MB)")
    spark.stop()
  }
}
