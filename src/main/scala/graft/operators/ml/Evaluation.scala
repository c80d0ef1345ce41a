package graft.operators.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** In-engine classifier evaluation over the Naive Bayes predictions:
  * the confusion matrix with per-class precision/recall/F1, and the
  * exact ROC-AUC for a one-vs-rest task by the Mann–Whitney rank
  * statistic. Both follow the repo's integer-contract rule: counts
  * stay BIGINT end-to-end and every ratio is published as a floored
  * micro-int (`floor(1e6·x)` → BIGINT), so the oracle compares bit
  * patterns, not float round-trips.
  *
  * Shape at 100 TB: evaluation never outgrows the label alphabet.
  * The confusion matrix is ONE (true, pred) hash aggregate over the
  * scored corpus — |classes|² rows out — and the per-class P/R/F1
  * derive from two label-sized re-aggregations of that matrix. AUC
  * reduces the corpus to |distinct scores| rows (one keyed aggregate),
  * then runs two prefix-sum windows over that score-sized frame; the
  * pair statistic U is assembled per score group (pos·cum_neg_below +
  * ties/2), never by materializing the P·N pair space. */
object Evaluation {

  /** (true lang, predicted lang) count matrix plus per-class
    * tp/fp/fn and floored-micro precision/recall/F1. Self-scored
    * corpus, same contract as [[NaiveBayes.predictLang]]. */
  def nbConfusion(docs: DataFrame): DataFrame = {
    val pred = NaiveBayes.predictLang(docs)
      .select(col("doc_id"), col("pred_lang"))
    val truth = docs.select(col("doc_id"), col("lang"))
    // the corpus-sized pass: one (true, pred) aggregate
    val matrix = truth.join(pred, "doc_id")
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    // label-sized frames from the matrix, never from the corpus
    val byTrue = matrix.groupBy("lang").agg(
      sum(when(col("pred_lang") === col("lang"), col("n"))
        .otherwise(lit(0L))).as("tp"),
      sum(when(col("pred_lang") =!= col("lang"), col("n"))
        .otherwise(lit(0L))).as("fn"),
      sum("n").as("support"))
    val byPred = matrix.groupBy(col("pred_lang").as("lang")).agg(
      sum(when(col("pred_lang") =!= col("lang"), col("n"))
        .otherwise(lit(0L))).as("fp"))
    def microRatio(num: org.apache.spark.sql.Column,
                   den: org.apache.spark.sql.Column) =
      floor(lit(1000000L) * num / nullif(den, lit(0L))).cast("bigint")
    // FULL outer: a class that is predicted but never true has no
    // byTrue row, and a left join would drop it — losing its fp count
    // and skewing any macro-precision computed downstream
    byTrue.join(byPred, Seq("lang"), "full_outer")
      .select(col("lang"), coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("fn"), lit(0L)).as("fn"),
        coalesce(col("support"), lit(0L)).as("support"))
      .withColumn("prec_micro", microRatio(col("tp"), col("tp") + col("fp")))
      .withColumn("rec_micro", microRatio(col("tp"), col("tp") + col("fn")))
      // F1 in micro space: floor(2·p·r/(p+r)) on the already-floored
      // micros — deterministic integer arithmetic, oracle-replayable
      .withColumn("f1_micro",
        floor(lit(2L) * col("prec_micro") * col("rec_micro") /
          nullif(col("prec_micro") + col("rec_micro"), lit(0L)))
          .cast("bigint"))
      .orderBy("lang")
  }

  /** Exact one-vs-rest ROC-AUC for `posClass` using the NB class
    * score as the ranking statistic. Ties get the standard half
    * credit, kept integral by doubling: U2 = 2·U = Σ_s (2·pos_s·
    * cum_neg_below(s) + pos_s·neg_s); AUC = U2/(2·P·N), published
    * floored-micro. One row out: (p_count, n_count, u2, auc_micro). */
  def nbAuc(docs: DataFrame, posClass: String = "en"): DataFrame = {
    val scored = NaiveBayes.scoreClass(docs, posClass)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("score_micro"),
        when(col("lang") === posClass, lit(1L)).otherwise(lit(0L))
          .as("is_pos"))
    // corpus → score-sized frame in one aggregate
    val groups = scored.groupBy("score_micro").agg(
      sum(col("is_pos")).as("pos"),
      sum(lit(1L) - col("is_pos")).as("neg"))
    // DISTRIBUTED prefix (r11): the former
    // `Window.orderBy(score_micro)` with no partition collapsed the
    // whole score-distinct frame — which scales with corpus size, a
    // near-unique score per doc — into ONE task (the `WindowExec: No
    // Partition Defined` scale trap). Bucket scores by fixed-width
    // integer division (monotone), then split the pair statistic
    // exactly:
    //   u2 = Σ_bkt u2_in(bkt) + 2·Σ_bkt neg_before(bkt)·pos_t(bkt)
    // where u2_in is the within-bucket term (a PARTITIONED window —
    // distributed) and neg_before the cross-bucket prefix over the
    // bucket-sized frame (bounded by score RANGE / W — log-prob
    // micros are doc-length-scale, so thousands of buckets, never
    // corpus-scale; the HeavyHitters bounded-frame contract). All
    // integer arithmetic, bit-identical u2 for ANY monotone split.
    // One linear flow — no self-join, no second consumer of the
    // scoring pipeline (a two-consumer shape re-executed it:
    // broadcast-join +0.4 s, scratch +0.8 s, shuffle-join +0.6 s —
    // receipts in OPTIMIZATION_r11.md).
    val bucketW = 1L << 20 // ~1.05 log-prob units per bucket
    val g0 = groups.withColumn("bkt", floor(col("score_micro") / bucketW))
    val inBucket = Window.partitionBy(col("bkt"))
      .orderBy(col("score_micro"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = g0
      .withColumn("cum_in_bkt_below",
        sum(col("neg")).over(inBucket) - col("neg"))
      .groupBy(col("bkt"))
      .agg(sum(col("pos")).as("pos_t"), sum(col("neg")).as("neg_t"),
        sum(lit(2L) * col("pos") * col("cum_in_bkt_below") +
          col("pos") * col("neg")).as("u2_in"))
    // `pmod(bkt, 1)` is constantly 0 but NOT foldable, so the bounded
    // cross-bucket window keeps an explicit one-partition spec (a
    // bare `lit` is constant-folded out of the partition spec,
    // resurrecting the no-partition warning this rewrite removes)
    val byBkt = Window.partitionBy(pmod(col("bkt"), lit(1L)))
      .orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perBucket
      .withColumn("neg_before",
        coalesce(sum(col("neg_t")).over(byBkt), lit(0L)))
      .agg(
        sum(col("pos_t")).as("p_count"),
        sum(col("neg_t")).as("n_count"),
        sum(col("u2_in") +
          lit(2L) * col("pos_t") * col("neg_before")).as("u2"))
      .withColumn("auc_micro",
        floor(lit(1000000L) * col("u2") /
          nullif(lit(2L) * col("p_count") * col("n_count"), lit(0L)))
          .cast("bigint"))
  }
}
