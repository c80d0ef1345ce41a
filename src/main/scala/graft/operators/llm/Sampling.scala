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
