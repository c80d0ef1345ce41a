package graft.operators.llm


import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus sampling / reporting operators for training-data pipelines.
  *
  * Sampling at 100 TB must be DETERMINISTIC (reproducible corpus
  * builds, stable across retries/partitioning) and single-pass — so
  * selection is a pure hash predicate on the stable doc key, not
  * `rand()` (nondeterministic per task retry) and not per-stratum
  * `sampleBy` (driver-side fraction map). The md5-prefix selector is
  * engine-portable: DuckDB computes the identical md5 hex, which keeps
  * the oracle exact.
  */
object Sampling {

  /** Uniform [0, 100) selector from the doc key: first 4 hex chars of
    * md5 of the DECIMAL doc_id string. */
  private def pctSelector = {
    val hex = substring(md5(col("doc_id").cast("string")), 1, 4)
    conv(hex, 16, 10).cast("long") % 100
  }

  /** Deterministic ~`pct`% sample, stratified in expectation per
    * (lang, source) — every stratum is hash-sampled by the same
    * selector, so each keeps ≈pct% of its docs regardless of stratum
    * skew. One narrow pass, no shuffle. */
  def stratifiedSample(documents: DataFrame, pct: Int = 20): DataFrame =
    documents
      .filter(pctSelector < pct)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
      .orderBy("doc_id")

  /** Deterministic sequence packing — assign docs to fixed-token-budget
    * packs for training (short docs concatenated up to `seqLen`
    * tokens). Exact greedy packing is inherently sequential; the
    * distributed form is the standard streaming-cumsum approximation:
    * within each (lang, source) stream, docs in stable doc_id order
    * are cut into packs wherever the running token total crosses the
    * budget. One window pass per stream — a pack can overshoot by at
    * most one document, the same bound the sequential packer has when
    * it cannot split documents. Deterministic under retries and
    * repartitioning (ordering is (doc_id), not arrival). */
  def sequencePacking(documents: DataFrame, seqLen: Int = 2048): DataFrame = {
    val byStream = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
    documents
      .select(col("doc_id"), col("lang"), col("source"),
        size(graft.functions.Tokenize.tokens(col("text"))).as("n_tokens"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(byStream).cast("long"))
      .withColumn("pack_id",
        ((col("cum_tokens") - col("n_tokens")) / seqLen).cast("long"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        col("pack_id"))
      .orderBy("lang", "source", "doc_id")
  }

  /** Corpus report: per (lang, source) doc counts and char volume —
    * the summary a pipeline emits after every build stage. One
    * hash-aggregate, partial→final. */
  def corpusStats(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("doc_ct"),
        sum(col("n_chars")).cast("long").as("char_sum"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        max(col("n_chars")).cast("long").as("max_chars"))
      .orderBy("lang", "source")
}
