package graft.operators.llm

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Tokenize

/** Frequent-items (heavy hitters) via Misra–Gries sketch + exact
  * verify — the frequency analog of the LSH→verify dedup spine.
  *
  * Pass 1 (sketch): a k-counter Misra–Gries summary as a typed
  * Aggregator — per-partition partial summaries merged with the
  * offset-merge of Agarwal et al. (PODS'12, mergeable summaries),
  * which preserves the MG guarantee: any token with true frequency
  * > n/k survives with a positive counter. The summary is ≤k entries
  * regardless of corpus size, so the merge tree moves O(k) state per
  * partition — no corpus-sized exchange for candidate discovery.
  *
  * Pass 2 (verify): exact counts for the ≤k candidates (broadcast
  * isin filter → one filtered aggregate), thresholded at > n/k. The
  * superset guarantee + exact second pass make the OUTPUT exactly
  * "GROUP BY HAVING count > n/k" — which is why a plain SQL aggregate
  * oracles this operator bit-for-bit even though a sketch did the
  * discovery.
  *
  * The candidate set (≤k strings) is the only driver materialization —
  * the same bounded contract as k-means centroids. */
object HeavyHitters {

  private[llm] def mgAggregator(k: Int) =
    new org.apache.spark.sql.expressions
      .Aggregator[String, Map[String, Long], Seq[String]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(m: Map[String, Long], w: String): Map[String, Long] =
        if (m.contains(w)) m.updated(w, m(w) + 1)
        else if (m.size < k) m.updated(w, 1L)
        else m.flatMap { case (t, c) =>
          if (c > 1) Some(t -> (c - 1)) else None
        }
      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val combined = b.foldLeft(a) { case (m, (t, c)) =>
          m.updated(t, m.getOrElse(t, 0L) + c)
        }
        if (combined.size <= k) combined
        else {
          // offset merge: subtract the (k+1)-th largest count so at
          // most k survive; undercount stays bounded by n/(k+1)
          val kth = combined.values.toSeq.sortBy(-_).apply(k)
          combined.flatMap { case (t, c) =>
            if (c - kth > 0) Some(t -> (c - kth)) else None
          }
        }
      }
      def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted
      def bufferEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.Encoders.kryo[Map[String, Long]]
      def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.Encoders.kryo[Seq[String]]
    }

  /** Tokens with frequency > totalTokens/k across the corpus, with
    * exact counts: (token, ct), ct descending then token. */
  def frequentTokens(documents: DataFrame, k: Int = 50): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = graft.core.Tables.spread(documents)
      .select(explode(Tokenize.tokens(col("text"))).as("w"))
    val candidates = toks.as[String].select(mgAggregator(k).toColumn).head()
    // ONE verify scan: non-candidates collapse into a single null
    // group, so the same aggregate yields the ≤k candidate counts AND
    // (via the global sum over the ≤k+1 aggregated rows — a window on
    // a tiny post-shuffle frame, not the corpus) the total n
    toks
      .groupBy(when(col("w").isin(candidates: _*), col("w")).as("token"))
      .agg(count(lit(1)).as("ct"))
      .withColumn("n", sum(col("ct")).over(Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("token").isNotNull &&
        col("ct") > col("n").cast("double") / k)
      .select(col("token"), col("ct"))
      .orderBy(col("ct").desc, col("token"))
  }
}
