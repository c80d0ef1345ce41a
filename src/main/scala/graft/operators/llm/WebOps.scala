package graft.operators.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-provenance operators — the CommonCrawl-shaped half of corpus
  * curation: per-host statistics and per-host document caps. A crawl
  * corpus is violently skewed by host (a handful of boilerplate-heavy
  * domains contribute a huge share of raw documents), so production
  * pipelines (C4, RefinedWeb §3.1, Dolma) both REPORT per-domain mass
  * and CAP it before training.
  *
  * The documents fixture has no URL column, so both operators plant
  * deterministic doc_id-keyed URLs (13 primary hosts + 3 CDN hosts on
  * every 5th doc) — the same injection discipline as the redaction
  * fixtures, replayable verbatim by the DuckDB oracle.
  *
  * Scale posture: `domainStats` is explode → one hash-aggregate keyed
  * by domain (domains are the NATURAL pre-aggregation key — cardinality
  * millions, not billions, so the exchange carries partial aggregates
  * only). `domainCapSample` is one window over the domain exchange;
  * the rank order is a hash of doc_id, not crawl order, so the kept
  * sample is unbiased w.r.t. position and deterministic under retries.
  * A pathological mega-host makes that window's partition huge — the
  * standard fix is pre-capping per (domain, doc_id-hash-bucket) first;
  * at the fixture's fan-out the single window is the right plan.
  */
object WebOps {

  private val UrlPat = "https?://[a-z0-9./-]+"
  private val HostPat = "https?://([a-z0-9.-]+)/"

  /** The deterministic URL injection shared by both operators. */
  private def withUrls(documents: DataFrame) =
    graft.core.Tables.spread(documents)
      .select(col("doc_id"), col("lang"),
        concat(col("text"),
          lit(" https://d"), (col("doc_id") % 13).cast("string"),
          lit(".example.com/p/"), col("doc_id").cast("string"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" via http://cdn"), (col("doc_id") % 3).cast("string"),
              lit(".example.net/x"))).otherwise(lit(""))).as("t"))

  /** Per-host corpus mass: URL mentions, distinct documents and
    * distinct languages per extracted host.
    *
    * Two-level aggregate instead of `count(distinct doc_id),
    * count(distinct lang)` in one pass: multiple DISTINCTs make Spark
    * plan an Expand (3× the exploded URL rows through the first
    * exchange). Pre-aggregating per (domain, doc_id) makes doc_ct a
    * plain count (the pair is the grouping key, so it IS distinct),
    * leaves ONE distinct for lang (no Expand), and carries one row
    * per (domain, doc) — not per URL — into the domain exchange. */
  def domainStats(documents: DataFrame): DataFrame =
    withUrls(documents)
      .select(col("doc_id"), col("lang"),
        explode(regexp_extract_all(col("t"), lit(UrlPat), lit(0))).as("url"))
      .select(col("doc_id"), col("lang"),
        regexp_extract(col("url"), HostPat, 1).as("domain"))
      .groupBy(col("domain"), col("doc_id"))
      .agg(count(lit(1)).as("url_ct_p"), min(col("lang")).as("doc_lang"))
      .groupBy(col("domain"))
      .agg(sum(col("url_ct_p")).as("url_ct"),
        count(lit(1)).as("doc_ct"),
        countDistinct(col("doc_lang")).as("lang_ct"))
      .orderBy("domain")

  /** Tracked-URL fixture for `urlDedup`: full URLs (params/fragments
    * included), with `www.` prefixes, utm tracking params and
    * fragments planted so normalization has variants to collapse;
    * the path key (doc_id % 17) deliberately collides across docs so
    * distinct raw URLs normalize into shared groups. */
  private def withTrackedUrls(documents: DataFrame) =
    graft.core.Tables.spread(documents)
      .select(col("doc_id"),
        concat(col("text"),
          lit(" https://"),
          when(col("doc_id") % 2 === 0, "www.").otherwise(""),
          lit("d"), (col("doc_id") % 13).cast("string"),
          lit(".example.com/p/"), (col("doc_id") % 17).cast("string"),
          when(col("doc_id") % 4 === 0,
            concat(lit("?utm_source=t"), (col("doc_id") % 3).cast("string")))
            .otherwise(lit("")),
          when(col("doc_id") % 6 === 0,
            concat(lit("#sec"), (col("doc_id") % 5).cast("string")))
            .otherwise(lit(""))).as("t"))

  private val FullUrlPat = "https?://[^ ]+"

  /** URL-normalization dedup — the crawl-frontier hygiene pass: strip
    * tracking query strings and fragments, drop the `www.` host
    * prefix, then group by the canonical URL. Emits one row per
    * canonical URL with the duplicate count, the number of DISTINCT
    * raw variants collapsed into it, and the first doc that carried
    * it. One gram... one URL exchange keyed by the normalized string;
    * everything before it is a narrow projection. */
  def urlDedup(documents: DataFrame): DataFrame =
    withTrackedUrls(documents)
      .select(col("doc_id"),
        explode(regexp_extract_all(col("t"), lit(FullUrlPat), lit(0))).as("url"))
      .withColumn("url_norm",
        regexp_replace(regexp_replace(col("url"), "[?#][^ ]*", ""),
          "://www\\.", "://"))
      .groupBy(col("url_norm"))
      .agg(count(lit(1)).as("dup_ct"),
        countDistinct(col("url")).as("variant_ct"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("url_norm")

  /** Per-host document cap: keep at most `cap` documents per primary
    * host (the host of the document's first URL), chosen by md5-hash
    * rank — position-unbiased, deterministic, oracle-replayable. */
  def domainCapSample(documents: DataFrame, cap: Int = 8): DataFrame =
    withUrls(documents)
      .select(col("doc_id"),
        regexp_extract(element_at(regexp_extract_all(col("t"), lit(UrlPat), lit(0)), 1),
          HostPat, 1).as("domain"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("domain"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col("domain"), col("rk"))
      .orderBy("domain", "rk")
}
