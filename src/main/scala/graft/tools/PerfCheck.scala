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
    time("ngramJaccard (shipped form, shared shingle pipeline)") {
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
    // skew: plain shuffle join vs salted join on a 50%-hot key, forced
    // shuffle (broadcast off) — the measured basis for SCALE.md's skew
    // paragraph
    // ×32 inflation: at sf0.1 the raw hot key (~300k rows) fits one
    // task without pain; ~10M hot rows is where the single-reducer
    // bottleneck becomes visible on this box. Materialized to parquet
    // OUTSIDE the timed region so the timings measure the join, not
    // the row generation.
    val skewDir = java.nio.file.Files.createTempDirectory("skew").toString
    Tables.lineitem(spark, d)
      .withColumn("__m", explode(sequence(lit(1),
        when(col("l_orderkey") % 10 < 5, 64).otherwise(1))))
      .select(
        when(col("l_orderkey") % 10 < 5, 0L).otherwise(col("l_orderkey")).as("k"),
        col("l_quantity"))
      .write.mode("overwrite").parquet(s"$skewDir/li")
    val li = spark.read.parquet(s"$skewDir/li")
    val rt = Tables.orders(spark, d).select(
      when(col("o_orderkey") % 10 < 5, 0L).otherwise(col("o_orderkey")).as("k"))
      .distinct()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    for (run <- 1 to 2) {
      time(s"skew plain join run$run (no AQE skew, no broadcast)") {
        li.join(rt, "k").groupBy("k").agg(count(lit(1)), sum("l_quantity"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"skew salted join run$run (no AQE skew, no broadcast)") {
        graft.operators.skew.Salting.saltedJoin(li, rt, "k", 8)
          .groupBy("k").agg(count(lit(1)), sum("l_quantity"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    time("skew plain join (AQE skew on, no broadcast)") {
      li.join(rt, "k").groupBy("k").agg(count(lit(1)), sum("l_quantity"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
