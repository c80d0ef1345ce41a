package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.llm.{DedupOps, Similarity}

/** Round-2 persist-lifecycle measurements (ad hoc, not driver contract):
  * confirms ivfTopK needs no persist (ReuseExchange) and quantifies the
  * shingle persist in ngramJaccardPairs. */
object PerfCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32")
    val d = "/root/testdata/sf0.1"
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def time[T](name: String)(f: => T): T = {
      clear()
      val t0 = System.nanoTime(); val r = f
      println(f"[perf] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s  " +
        s"leakedRDDs=${spark.sparkContext.getPersistentRDDs.size}")
      r
    }
    val emb = Tables.embeddings(spark, d)
    val qids = (0L until 50L).map(_ * 20L)
    val ivf = Similarity.ivfTopK(emb, qids)
    val plan = ivf.queryExecution.executedPlan.toString
    println(s"[perf] ivf plan has ReusedExchange: ${plan.contains("ReusedExchange")}")
    time("ivfTopK (no persist)") { ivf.write.format("noop").mode("overwrite").save() }
    time("ivfTopK run2") { Similarity.ivfTopK(emb, qids).write.format("noop").mode("overwrite").save() }

    val docs = DedupOps.withNearDuplicates(Tables.documents(spark, d))
    time("ngramJaccard (persisted shingles)") {
      DedupOps.ngramJaccardPairs(docs).write.format("noop").mode("overwrite").save()
    }
    // unpersisted equivalent: grams and minhash each rebuild shingleRows
    time("ngramJaccard (no persist)") {
      val sh = DedupOps.shingleRows(docs)
      val grams = sh.groupBy(col("doc_id"))
        .agg(collect_set(xxhash64(col("shingle"))).as("grams"))
      val candidates = broadcast(DedupOps.minhashPairs(docs, 0.3)
        .select("doc_a", "doc_b"))
      candidates
        .join(grams.select(col("doc_id").as("doc_a"), col("grams").as("grams_a")), "doc_a")
        .join(grams.select(col("doc_id").as("doc_b"), col("grams").as("grams_b")), "doc_b")
        .withColumn("inter", size(array_intersect(col("grams_a"), col("grams_b"))))
        .withColumn("jaccard",
          col("inter") / (size(col("grams_a")) + size(col("grams_b")) - col("inter")))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
