package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Tokenize

/** Full-text ranked retrieval over the documents corpus.
  *
  * BM25 (Robertson–Spärck Jones / Okapi, the Lucene `1 +` idf variant
  * so idf is always positive) — the standard lexical ranking function a
  * training-data pipeline uses for corpus search, retrieval-based
  * decontamination checks, and hard-negative mining.
  *
  * Shape at 100 TB: the query-term set is broadcast and applied BEFORE
  * the term-frequency shuffle, so the only corpus-sized exchanges are
  * (a) the doc-length aggregate (one hash agg keyed on doc_id,
  * map-side combined) and (b) the tf aggregate over the term-filtered
  * token stream — a tiny fraction of the corpus once the broadcast
  * semi-filter has run. The df table is |query terms| rows, the
  * corpus-stats frame is 1 row; both ride broadcasts. Final ranking
  * partitions by query_id (|queries| keys — fine while the query set
  * is a batch of lookups; a corpus-sized query table would switch to
  * the same banded layout the ANN operators use).
  *
  * Determinism discipline (oracle-replayable): idf is rounded to 6 dp,
  * each per-term contribution to 6 dp, the summed score to 4 dp, and
  * ranking breaks ties by doc_id.
  */
object Retrieval {

  val defaultQueries: Seq[(Int, String)] = Seq(
    0 -> "spark fast hash",
    1 -> "window sort table",
    2 -> "slow batch merge")

  def bm25TopK(documents: DataFrame,
               queries: Seq[(Int, String)] = defaultQueries,
               k: Int = 5): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // BM25 constants (k1=1.2, b=0.75) pre-folded to the exact literal
    // shapes the oracle uses: tf*(k1+1)=tf*2.2, k1*(1-b+b*r)=1.2*(0.25+0.75r)
    val qTerms = queries.flatMap { case (qid, q) =>
      q.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.map(t => (qid, t))
    }.toDF("query_id", "qw")

    val toks = graft.core.Tables.spread(documents)
      .select(col("doc_id"), explode(Tokenize.tokens(col("text"))).as("w"))
    // doc length over ALL tokens; n_docs/avgdl are defined over docs
    // with at least one token (empty docs can't score anyway)
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val stats = broadcast(
      lens.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len")))

    val termSet = qTerms.select(col("qw").as("w")).distinct()
    val qToks = toks.join(broadcast(termSet), "w")
    val tf = qToks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val docFreq = qToks.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))

    val avgdl = col("sum_len").cast("double") / col("n_docs").cast("double")
    val contrib = tf
      .join(broadcast(docFreq), "w")
      .join(lens, "doc_id")
      .crossJoin(stats)
      .join(broadcast(qTerms), col("w") === col("qw"))
      .withColumn("idf", round(log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      .withColumn("c", round(col("idf") * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("len").cast("double") / avgdl))), 6))

    contrib.groupBy("query_id", "doc_id")
      .agg(round(sum(col("c")), 4).as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("int").as("rank"), col("score"))
      .orderBy("query_id", "rank")
  }
}
