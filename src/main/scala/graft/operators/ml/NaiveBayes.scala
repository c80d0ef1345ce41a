package graft.operators.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Tokenize

/** Multinomial Naive Bayes over the documents corpus (class = lang,
  * features = whitespace tokens) — in-engine model training AND
  * scoring, no iteration, no driver round-trip. The numeric contract
  * is MICRO-LOG-PROBS: every log term is rounded to an integer number
  * of millionths immediately (`round(ln(p)·1e6)` → BIGINT), so the
  * per-document score is an INTEGER sum — order-free, partition-free,
  * engine-free — and the argmax is fully deterministic (ties break on
  * lang). The only float op is the single `ln` per (class, token)
  * pair, the same last-ulp exposure every logarithm-based oracle in
  * this repo carries (PMI, BM25).
  *
  * Shape at 100 TB: ONE corpus-sized token aggregate keyed on
  * (lang, w) with map-side combine is the entire statistical input —
  * per-class token totals AND the vocabulary size both derive from
  * that vocab-sized frame. The aggregate's subtree appears in several
  * plan branches (model, totals, broadcast), but they canonicalize
  * identically, so runtime exchange reuse computes it once (verified
  * on the executed plan: 3 ReusedExchange nodes). Prediction adds one
  * column-pruned doc-count scan and one scoring pass: token explode +
  * broadcast model join + one (doc, class) aggregate.
  * Unseen (class, token) pairs fall back to the class's smoothed
  * default via coalesce — the Laplace term, not a dropped feature. */
object NaiveBayes {

  private def toks(docs: DataFrame) =
    graft.core.Tables.spread(docs).select(col("doc_id"), col("lang"),
      explode(Tokenize.wsTokens(col("text"))).as("w"))

  /** The single corpus-sized aggregate: (lang, w) → count. */
  private def pairCounts(docs: DataFrame) =
    toks(docs).groupBy("lang", "w").agg(count(lit(1)).as("ct"))

  private def modelFrom(cts: DataFrame): DataFrame = {
    // totals and vocabulary live on the vocab-sized frame
    val tokC = cts.groupBy("lang").agg(sum("ct").as("tok_c"))
    val vocab = broadcast(cts.agg(countDistinct(col("w")).as("v")))
    cts.join(tokC, "lang").crossJoin(vocab)
      .select(col("lang"), col("w"), col("ct"),
        round(log((col("ct") + 1).cast("double") /
                  (col("tok_c") + col("v"))) * 1e6)
          .cast("bigint").as("logp_micro"),
        col("tok_c"), col("v"))
  }

  /** Class-conditional token log-probabilities with add-one
    * smoothing: logp(w|c) = ln((ct+1)/(tok_c+V)) in micros. */
  def trainLangModel(docs: DataFrame): DataFrame =
    modelFrom(pairCounts(docs))
      .select("lang", "w", "ct", "logp_micro")
      .orderBy("lang", "w")

  /** Scores every document against every class and keeps the argmax:
    * score(d, c) = prior_micro(c) + Σ_w logp_micro(w|c), with the
    * class default for out-of-class-vocabulary tokens. Self-training
    * on the same corpus — the demonstration contract; a held-out
    * corpus plugs into `docs` vs `train` separately. */
  def predictLang(docs: DataFrame): DataFrame = {
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("lang"))
    scoreAll(docs).withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"),
        col("score_micro"))
      .orderBy("doc_id")
  }

  /** Per-(doc, class) scores for ONE class — the ranking statistic
    * for one-vs-rest evaluation ([[Evaluation.nbAuc]]). The class
    * filter sits on the broadcast `info` side, so Catalyst prunes the
    * per-class fanout before the scoring aggregate ever sees it. */
  def scoreClass(docs: DataFrame, cls: String): DataFrame =
    scoreAll(docs).filter(col("lang") === cls)
      .select(col("doc_id"), col("score_micro"))

  /** The full (doc, class, score_micro) frame before the argmax. */
  private def scoreAll(docs: DataFrame): DataFrame = {
    val model = modelFrom(pairCounts(docs))
    // class frame: priors from a pruned doc-count scan; the smoothed
    // default and totals ride the model frame (no corpus rescan)
    val classTotals = model.groupBy("lang")
      .agg(first(col("tok_c")).as("tok_c"), first(col("v")).as("v"))
    val info = docs.groupBy("lang").agg(count(lit(1)).as("docs_c"))
      .withColumn("docs_n", sum("docs_c").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .join(classTotals, "lang")
      .select(col("lang"),
        round(log(col("docs_c").cast("double") / col("docs_n")) * 1e6)
          .cast("bigint").as("prior_micro"),
        round(log(lit(1.0) / (col("tok_c") + col("v"))) * 1e6)
          .cast("bigint").as("default_micro"))
    toks(docs).select(col("doc_id"), col("w"))
      .crossJoin(broadcast(info))
      .join(broadcast(model.select(col("lang"), col("w"),
        col("logp_micro"))), Seq("lang", "w"), "left")
      .groupBy(col("doc_id"), col("lang"), col("prior_micro"))
      .agg(sum(coalesce(col("logp_micro"), col("default_micro")))
        .as("tok_micro"))
      .select(col("doc_id"), col("lang"),
        (col("prior_micro") + col("tok_micro")).as("score_micro"))
  }
}
