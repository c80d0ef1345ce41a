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

  /** 32-bit uniform from the md5 hash family: first 8 hex chars of
    * md5(keyExpr) as a long in [0, 2^32). ONE definition so the
    * 8-hex-width discipline (the 4-hex form skews residues — see
    * budgetSelect) and any future salting fix stay consistent across
    * every sampling op that correlates on this value. */
  private[llm] def hash32(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast("long")

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

  /** T5-style span corruption: every `stride`-th token (1-based
    * position divisible by `stride`) is replaced by a sentinel
    * `<extra_id_k>` in the input and emitted as `<extra_id_k> token`
    * in the target — the deterministic variant of the random masking
    * a denoising objective uses (position arithmetic instead of RNG,
    * so retries/partitioning/engines all agree). Pure array
    * expressions inside one projection: no shuffle at all, the
    * operator is map-only and scales embarrassingly. Documents
    * shorter than one stride emit an empty target (n_masked 0). */
  def spanCorruption(documents: DataFrame, stride: Int = 5): DataFrame = {
    require(stride >= 2, "spanCorruption: need stride >= 2")
    val a = graft.functions.Tokenize.wsTokens(col("text"))
    // 0-based element index i is masked when (i+1) % stride == 0;
    // its sentinel ordinal is k = (i+1)/stride - 1
    def sentinel(i: org.apache.spark.sql.Column) =
      // Column `/` is DOUBLE division — keep the ordinal integral
      concat(lit("<extra_id_"),
        (((i + 1) / stride).cast("int") - 1).cast("string"), lit(">"))
    documents.select(
      col("doc_id"),
      concat_ws(" ", transform(a, (t, i) =>
        when((i + 1) % stride === 0, sentinel(i)).otherwise(t)))
        .as("input_text"),
      concat_ws(" ", transform(
        filter(a, (_, i) => (i + 1) % stride === 0),
        (t, k) => concat(lit("<extra_id_"), k.cast("string"),
          lit("> "), t))).as("target_text"),
      size(filter(a, (_, i) => (i + 1) % stride === 0)).cast("int")
        .as("n_masked"))
      .orderBy("doc_id")
  }

  /** Token-budget corpus selection: keep the highest-quality documents
    * until a token budget is filled (the curation step that turns a
    * scored corpus into a fixed-size training set). Selection is by
    * QUALITY-SCORE BUCKET, not per-document rank: per-bucket token
    * totals cumulate in score-descending order and every bucket whose
    * cumulative start sits under the budget is kept whole — the
    * boundary bucket may overshoot, bounded by one bucket (the same
    * contract as [[sequencePacking]]'s one-document overshoot).
    *
    * Shape at 100 TB: the only total order in the plan is over DISTINCT
    * ROUNDED SCORES (≤ 10^4 rows at 4-dp rounding — the single-partition
    * window is over the bucket table, never the corpus); a per-document
    * global sort-and-cumsum would be the textbook scale-killer this
    * form exists to avoid. Docs rejoin the kept-bucket set on the
    * score key (tiny side, auto-broadcast). */
  def budgetSelect(documents: DataFrame,
                   budgetTokens: Long = 10000L): DataFrame = {
    // the contract guarantees the top bucket is always kept; a
    // non-positive budget (e.g. an upstream remaining-budget gone
    // negative) must fail here, not flow on as an empty training set
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    val q = TextAnalysis.quality(documents)
      .select(col("doc_id"), col("n_words"), col("quality_score"))
    val buckets = q.groupBy("quality_score")
      .agg(sum(col("n_words")).cast("long").as("bucket_tokens"))
    val byScoreDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality_score").desc)
    val kept = buckets
      .withColumn("cum", sum(col("bucket_tokens")).over(byScoreDesc))
      .filter(col("cum") - col("bucket_tokens") < budgetTokens)
      .select("quality_score")
    q.join(kept, Seq("quality_score"))
      .select(col("doc_id"), col("n_words"), col("quality_score"))
      .orderBy("doc_id")
  }

  /** Domain mixture rebalancing: deterministically subsample language
    * strata so the surviving corpus matches target proportions (basis
    * points per lang — the mixture knob every pretraining recipe sets).
    * The largest feasible total is taken: the BINDING stratum
    * (min count/weight) keeps everything; every other stratum
    * hash-samples down to its weight-proportional size. Selection is
    * the [[stratifiedSample]] md5 selector at 1/10000 granularity, and
    * the keep predicate is pure INTEGER cross-multiplication
    * (`sel·ct·w_bind < w·ct_bind·10000`) — no float rate is ever
    * computed, so the decision boundary is exact in any engine.
    *
    * Shape at 100 TB: one tiny count aggregate (≤ #strata rows), the
    * binding stratum picked by a 1-row sort over it, both broadcast
    * back; the corpus pass is a narrow filter. The int64 product is
    * safe to ~9e10 docs per stratum (sel·ct·w < 2^63); past that,
    * coarsen the selector granularity first. */
  def mixtureRebalance(documents: DataFrame,
                       targetsBp: Map[String, Int] = Map(
                         "en" -> 4000, "zh" -> 2000, "de" -> 2000,
                         "fr" -> 1000, "es" -> 1000)): DataFrame = {
    require(targetsBp.values.sum == 10000, "targets must sum to 10000 bp")
    require(targetsBp.values.forall(_ > 0), "every target weight must be > 0")
    val spark = documents.sparkSession
    import spark.implicits._
    val weights = targetsBp.toSeq.sorted.toDF("lang", "w_bp")
    // inner join: langs without a target weight are dropped entirely
    val counts = documents.groupBy("lang").agg(count(lit(1)).as("ct"))
      .join(weights, "lang")
    // a target lang absent from the corpus makes the promised mixture
    // infeasible — fail loudly instead of silently re-normalizing the
    // output to the surviving strata (the tiny count table makes this
    // driver check free at any scale)
    require(counts.count() == targetsBp.size,
      s"target langs missing from the corpus: " +
        (targetsBp.keySet -- counts.select("lang").collect()
          .map(_.getString(0))).mkString(", "))
    val binding = counts
      .orderBy((col("ct").cast("double") / col("w_bp")).asc, col("lang"))
      .limit(1)
      .select(col("ct").as("bind_ct"), col("w_bp").as("bind_w"))
    // 8 hex chars (32 bits): 2^32 mod 10000 leaves ~1e-5 relative
    // non-uniformity, where the 4-hex form's 65536 mod 10000 skewed
    // residues 0–5535 by +1/6 (~7% relative keep-rate error)
    val sel = hash32(col("doc_id").cast("string")) % 10000
    documents.join(broadcast(counts), "lang")
      .crossJoin(broadcast(binding))
      .filter(sel * col("ct") * col("bind_w") <
        col("w_bp") * col("bind_ct") * 10000L)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Temperature-based mixture sampling (the multilingual τ-reweight
    * of XLM/mT5: stratum share ∝ count^τ, τ<1 flattens the head so
    * low-resource languages survive). Targets are DERIVED from the
    * corpus (`w_l = round(ct_l^τ, 6)` — the 6-dp round after the
    * transcendental is the repo's cross-engine pow/ln discipline),
    * then the same binding-stratum + md5-selector machinery as
    * `mixtureRebalance`: the stratum with the least headroom binds,
    * every other stratum keeps `w_l·bind_ct / (bind_w·ct_l)` of its
    * docs by deterministic hash selector. Same 100 TB shape: tiny
    * count aggregate broadcast back, corpus pass is a narrow filter. */
  def temperatureMix(documents: DataFrame, tau: Double = 0.7): DataFrame = {
    require(tau > 0 && tau <= 1, s"temperature must be in (0,1], got $tau")
    val counts = documents.groupBy("lang").agg(count(lit(1)).as("ct"))
      .withColumn("w", round(pow(col("ct").cast("double"), lit(tau)), 6))
    val binding = counts
      .orderBy((col("ct").cast("double") / col("w")).asc, col("lang"))
      .limit(1)
      .select(col("ct").as("bind_ct"), col("w").as("bind_w"))
    val sel = hash32(col("doc_id").cast("string")) % 10000
    documents.join(broadcast(counts), "lang")
      .crossJoin(broadcast(binding))
      .filter(sel.cast("double") * col("bind_w") * col("ct") <
        col("w") * col("bind_ct") * 10000.0)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Dedup-aware train/val/test split: every document maps to its
    * near-dup COMPONENT (from a verified pair set; singletons are
    * their own), and the split is assigned by hashing the COMPONENT
    * id — so a document and its near-duplicates can never straddle
    * splits (the classic eval-leakage bug a doc-level hash split
    * ships). Weights are percent points (train, val; test = rest).
    *
    * Shape at 100 TB: components come from the parquet-backed CC
    * iteration; the assignment itself is a narrow left join on doc_id
    * plus a hash — no extra shuffle class beyond the CC output join. */
  def splitAssign(documents: DataFrame, pairs: DataFrame,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"percents must leave room for test, got train=$trainPct val=$valPct")
    val comp = Components.connectedComponents(pairs)
    // salted ('split:') and 8-hex-widened: an UNsalted selector is the
    // same md5 value the sampling ops filter on, and 100 | 10000 makes
    // the decisions fully correlated — a stratum mixtureRebalance keeps
    // at rate sel%10000 < 80 would land EVERY survivor in 'train'
    val sel = hash32(concat(lit("split:"),
      col("component_id").cast("string"))) % 100
    documents
      .join(comp, Seq("doc_id"), "left_outer")
      .withColumn("component_id",
        coalesce(col("component_id"), col("doc_id")))
      .withColumn("split",
        when(sel < trainPct, "train")
          .when(sel < trainPct + valPct, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("component_id"), col("split"))
      .orderBy("doc_id")
  }

  /** Deterministic training-order shuffle — the step that randomizes
    * document order before training WITHOUT a corpus-wide sort: docs
    * hash into `nShards` shards (seeded, so re-rolls are one seed
    * bump) and get a position WITHIN their shard by pseudo-random
    * order. The only sorts are per-shard window sorts — embarrassingly
    * parallel; a training loader consumes shards in any order. The
    * per-shard key sort is the price of an exact position column;
    * writers that only need randomized file order skip it and write
    * hash-ordered shards directly. */
  def trainingOrder(documents: DataFrame, nShards: Int = 32,
                    seed: Long = 42L): DataFrame = {
    val h = hash32(concat(col("doc_id").cast("string"), lit(":"), lit(seed)))
    val byShard = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    documents
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos", (row_number().over(byShard) - 1).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("doc_id")
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

  /** Weighted sampling without replacement via PRIORITY SAMPLING
    * (Duffield, Lund & Thorup, JACM'07): each doc draws a
    * deterministic uniform u from the md5 hash family and gets
    * priority w/u (w = n_chars); the sample is the top-k priorities.
    * Inclusion probability ∝ weight with the without-replacement
    * guarantee, and — unlike the exponential/A-Res key u^(1/w) — the
    * priority needs NO transcendental, so both engines compute the
    * ranking bit-identically (one multiply, one divide on exact
    * integer-derived operands; the repo's cross-engine float
    * discipline).
    *
    * Top-k is orderBy+limit → TakeOrderedAndProject: per-partition
    * k-row heaps, k·p driver merge, no global sort — the priority
    * column is the only thing computed corpus-wide and it's a narrow
    * per-row expression. */
  def prioritySample(documents: DataFrame, k: Int = 100): DataFrame = {
    // u = (h+1)/2^32 ∈ (0,1]; +1 keeps u nonzero so w/u is finite
    val h = hash32(col("doc_id").cast("string"))
    val priority = col("n_chars").cast("double") * 4294967296.0 /
      (h + lit(1L)).cast("double")
    documents
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"),
        round(priority, 4).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
  }
}
