package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.llm.DedupOps

/** Ad-hoc profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32")
    val d = "/root/testdata/sf0.1"
    if (args.nonEmpty && args(0) == "explain") {
      graft.SparkEntry.queries(args(1))(spark, "/root/testdata/sf0.001").explain("formatted")
      spark.stop(); return
    }
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val docs = DedupOps.withNearDuplicates(Tables.documents(spark, d))
    val sigs = time("signatures") {
      val s = DedupOps.signatures(docs).persist()
      println(s"[scratch] sigs=${s.count()}"); s
    }
    time("simhashTable") {
      println(s"[scratch] fps=${DedupOps.simhashTable(docs).count()}")
    }
    time("ngram jaccard full") {
      println(s"[scratch] jac=${DedupOps.ngramJaccardPairs(docs).count()}")
    }
    time("minhash pairs only") {
      println(s"[scratch] mh=${DedupOps.minhashPairs(docs, 0.3).count()}")
    }
    val grams = docs.select(col("doc_id"), DedupOps.shingles(col("text")).as("grams"))
    time("grams materialize") {
      println(s"[scratch] grams=${grams.count()}")
    }
    val banded = sigs.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(15))).as("band"))
      .withColumn("band_hash",
        xxhash64(slice(col("sig"), col("band") * 4 + 1, lit(4)), col("band")))
    time("raw band-join pair count") {
      val n = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
        .count()
      println(s"[scratch] raw pairs=$n")
    }
    time("bucket size distribution") {
      banded.groupBy("band", "band_hash").count()
        .agg(max("count").as("max_bucket"), expr("percentile(count, 0.999)").as("p999"),
          sum(expr("count*(count-1)/2")).as("total_pairs")).show(false)
    }
    spark.stop()
  }
}
