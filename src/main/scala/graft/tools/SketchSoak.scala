package graft.tools

import org.apache.spark.sql.functions._

/** Measures the two shingle-stream forms feeding the CMS/KMV sketches
  * and asserts they agree, receipts for SCALE.md:
  *
  *   1. the `shingles()` ARRAY-expression form (`transform` +
  *      `element_at` lambdas) — Catalyst re-inlines the token array
  *      inside the lambda, so it re-evaluates per element: the
  *      documented interpreted-lambda trap;
  *   2. the RELATIONAL `shingleRows` form (posexplode + lead windows,
  *      whole-stage codegen'd) the sketches ship on.
  *
  * Then times the shipped sketch queries end-to-end.
  *
  * usage: runMain graft.tools.SketchSoak [sfDir]
  */
object SketchSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("32")
    val docs = graft.core.Tables.documents(spark, sfDir)
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime
      val r = f
      println(f"[soak] $tag%-34s ${(System.nanoTime - t0) / 1e9}%6.2f s  ($r)")
    }
    import graft.operators.llm.{DedupOps, Sketches}
    // both forms must see the same per-doc-distinct shingle bag
    val arrayForm = docs.select(col("doc_id"),
      explode(DedupOps.shingles(col("text"))).as("w"))
    val relForm = DedupOps.shingleRows(docs)
      .select(col("doc_id"), col("shingle").as("w")).distinct()
    time("array-expression shingle form") {
      arrayForm.groupBy("w").agg(count(lit(1))).count()
    }
    time("relational shingleRows form") {
      relForm.groupBy("w").agg(count(lit(1))).count()
    }
    val diff = arrayForm.distinct().exceptAll(relForm).count() +
      relForm.exceptAll(arrayForm.distinct()).count()
    require(diff == 0, s"shingle forms disagree on $diff rows")
    println("[soak] forms agree (symmetric except = 0)")
    time("llm_cms_audit end-to-end") {
      Sketches.cmsEstimate(docs).write.mode("overwrite")
        .parquet("/tmp/sketch-soak-cms")
    }
    time("llm_kmv_distinct end-to-end") {
      Sketches.kmvDistinct(docs).write.mode("overwrite")
        .parquet("/tmp/sketch-soak-kmv")
    }
    spark.stop()
  }
}
