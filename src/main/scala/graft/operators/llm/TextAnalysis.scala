package graft.operators.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Tokenize

/** Text-analysis operators for training-data pipelines: quality
  * scoring, language ID, token counting, fingerprinting. All
  * expression-level (codegen'd), one scan, no shuffle except the final
  * presentation sort — the shape that holds at 100 TB.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "and", "to")

  /** Quality scoring: length/stopword/diversity ratios and a composite
    * score. All ratios are exact IEEE divisions of integers, rounded
    * for cross-engine comparison. */
  def quality(documents: DataFrame): DataFrame = {
    val ws = Tokenize.tokens(col("text"))
    documents
      .withColumn("n_words", size(ws).cast("long"))
      .withColumn("stop_ct",
        size(filter(ws, w => w.isin(stopwords: _*))).cast("long"))
      .withColumn("uniq_ct", size(array_distinct(ws)).cast("long"))
      .select(
        col("doc_id"),
        col("n_words"),
        round(col("stop_ct") / col("n_words"), 4).as("stop_ratio"),
        round(col("uniq_ct") / col("n_words"), 4).as("uniq_ratio"),
        round(length(col("text")).cast("double") / col("n_words"), 4)
          .as("avg_token_span"),
        round(least(col("n_words") / lit(200.0), lit(1.0)) *
          (col("uniq_ct") / col("n_words")), 4).as("quality_score"))
      .orderBy("doc_id")
  }

  /** Language ID by stopword-marker voting (n-gram heuristic):
    * the lang with the most marker hits wins; ties resolve in fixed
    * priority order en > es > fr > de; no hits → 'und'. */
  def langId(documents: DataFrame): DataFrame = {
    val ws = Tokenize.tokens(col("text"))
    def hits(markers: Seq[String]) =
      size(filter(ws, w => w.isin(markers: _*))).cast("long")
    documents
      .withColumn("en_ct", hits(Seq("the", "and", "of")))
      .withColumn("es_ct", hits(Seq("el", "la", "los", "y")))
      .withColumn("fr_ct", hits(Seq("le", "et", "les")))
      .withColumn("de_ct", hits(Seq("der", "und", "die")))
      .withColumn("pred_lang",
        when(col("en_ct") >= col("es_ct") && col("en_ct") >= col("fr_ct") &&
          col("en_ct") >= col("de_ct") && col("en_ct") > 0, "en")
          .when(col("es_ct") >= col("fr_ct") && col("es_ct") >= col("de_ct") &&
            col("es_ct") > 0, "es")
          .when(col("fr_ct") >= col("de_ct") && col("fr_ct") > 0, "fr")
          .when(col("de_ct") > 0, "de")
          .otherwise("und"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("doc_ct"))
      .orderBy("lang", "pred_lang")
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single symbols). */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        size(Tokenize.tokens(col("text"))).cast("long").as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")
          .as("bpe_ish_tokens"),
        length(col("text")).cast("long").as("char_len"))
      .orderBy("doc_id")

  /** Document fingerprinting: content hash + prefix key for sharded
    * storage (rolling-hash family; md5 keeps the oracle exact). */
  def fingerprint(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        md5(lower(col("text"))).as("fp"),
        substring(md5(lower(col("text"))), 1, 4).as("shard_key"),
        length(col("text")).cast("long").as("char_len"))
      .orderBy("doc_id")
}
