package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.llm.DedupOps

/** Scale soak for the decontamination paths (ad hoc, not driver
  * contract): exact broadcast-gram-set vs Bloom-prescreened on an
  * inflated corpus, measuring wall-clock, the gram-row volume the
  * Bloom kills before the verify join, and result equality. Results
  * recorded in SCALE.md §"Text analysis".
  *
  * usage: runMain graft.tools.BloomSoak [sfDir] [copies]
  */
object BloomSoak {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.core.Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")

    val base = DedupSoak.inflate(Tables.documents(spark, sfDir), copies)
    val (corpus, bench) = DedupOps.contaminationFixture(base)
    val corpusDocs = corpus.count()
    println(s"[bloom-soak] corpus=$corpusDocs docs (${copies}x $sfDir)")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bloom-soak] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val exact = timed("exact broadcast gram-set") {
      DedupOps.contaminationReport(corpus, bench).collect()
    }
    val bloom = timed("bloom prescreen + verify") {
      DedupOps.contaminationReportBloom(corpus, bench).collect()
    }
    require(exact.toSeq == bloom.toSeq, "bloom != exact")
    println(s"[bloom-soak] reports identical: ${exact.length} flagged docs")

    // the pruning the Bloom buys: corpus gram rows in vs survivors out
    val totalGrams = DedupOps.gramRows(corpus, 8).count()
    val benchGrams = DedupOps.gramRows(bench, 8).select("gram").distinct()
    val n = math.max(benchGrams.count(), 1L)
    val bf = benchGrams.stat.bloomFilter("gram", n, 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val passUdf = udf((g: String) => bc.value.mightContainString(g))
    val survivors = DedupOps.gramRows(corpus, 8)
      .filter(passUdf(col("gram"))).count()
    println(f"[bloom-soak] gram rows: $totalGrams%d -> $survivors%d survive " +
      f"(${100.0 * survivors / totalGrams}%.2f%% reach the verify join; " +
      f"bench grams=$n%d, bloom bits≈${bf.bitSize() / 8 / 1024}%d KiB)")
    spark.stop()
  }
}
