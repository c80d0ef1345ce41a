package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.llm.DedupOps

/** Ingest-time deduplication for a document stream — the streaming
  * form of the LLM-pipeline dedup family.
  *
  * Production shape at 100 TB: the LSH index over the existing corpus
  * is built in batch (`bandIndex`, refreshed per index rebuild) and the
  * incoming stream probes it with a stream-static join — the same
  * pattern the reference uses for dimension lookups (SURVEY J3: static
  * side re-read per micro-batch). The probe itself is completely
  * stateless (signature → band → broadcast join → verify), so it
  * scales with executors and holds no streaming state; only the exact
  * dedup kernel keeps (watermark-bounded) state.
  */
object StreamingDedup {

  /** Batch-built LSH band index over the existing corpus:
    * (band, band_hash, idx_doc_id, idx_sig). Broadcast at probe time —
    * at scale, persist instead and let the probe shuffle on
    * (band, band_hash) when the index outgrows broadcast. Degenerate
    * buckets are capped exactly like the batch self-join
    * (`DedupOps.capBuckets`): without the cap, one boilerplate band
    * bucket of N docs makes EVERY matching stream row join N index
    * rows — per-row probe cost O(corpus) instead of O(bands). */
  def bandIndex(documents: DataFrame, bands: Int = 16,
                rowsPerBand: Int = 4, maxBucketSize: Int = 10000): DataFrame = {
    require(bands * rowsPerBand == 64,
      s"bands*rowsPerBand must equal the 64-perm signature, got $bands x $rowsPerBand")
    DedupOps.capBuckets(
      DedupOps.bandRows(DedupOps.signaturesNative(documents), bands, rowsPerBand),
      Seq("band", "band_hash"), maxBucketSize)
      .select(col("band"), col("band_hash"),
        col("doc_id").as("idx_doc_id"), col("sig").as("idx_sig"))
  }

  /** Stateless near-dup probe over a document stream (`doc_id`,
    * `text`): the native one-pass `MinHashSig` per row (bit-identical
    * to the batch aggregate — parity spec; it replaced the inline
    * hash-array + 64-permutation expression form, which measured ~4×
    * the batch aggregate's cost), band, join the static index, verify
    * by signature-match fraction.
    *
    * Emits one row per MATCHING BAND in append mode; a pair colliding
    * in k bands appears k times with identical `est_jaccard`. The
    * engine's own changelog idiom absorbs this: route to the K3
    * last-wins upsert sink keyed (doc_id, idx_doc_id), or dedup
    * downstream in batch. Keeping the probe stateless is the point —
    * an in-stream distinct would hold unbounded pair state. */
  def nearDupProbe(stream: DataFrame, index: DataFrame,
                   bands: Int = 16, rowsPerBand: Int = 4,
                   threshold: Double = 0.5): DataFrame = {
    require(bands * rowsPerBand == 64,
      s"bands*rowsPerBand must equal the 64-perm signature, got $bands x $rowsPerBand")
    // same null contract as the batch signature pipelines: a NULL text
    // has no signature and probes nothing (unfiltered it would band a
    // null sig into a junk bucket hash and ride the join as dead rows)
    val sigs = stream.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextExprs.minhash_sig(col("text")).as("sig"))
    DedupOps.bandRows(sigs, bands, rowsPerBand)
      .join(broadcast(index), Seq("band", "band_hash"))
      .filter(col("doc_id") =!= col("idx_doc_id"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig"), col("idx_sig"), (x, y) => x === y),
          b => b)) / size(col("sig")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_id"), col("idx_doc_id"), col("band"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** Stateless contamination probe at ingest: the streaming twin of
    * `DedupOps.contaminationReport`. The benchmark's distinct n-grams
    * are DRIVER-BOUNDED (eval suites are tiny) and broadcast as one
    * hash set; each row tokenizes once in plain JVM code and slides an
    * n-window over its tokens — no join, no state, restart = replay.
    * Typed `mapPartitions` (not expressions) deliberately: the batch
    * gram builder (posexplode + window) is not streaming-legal, and an
    * expression-level per-row gram array re-evaluates the tokenize
    * pipeline inside the interpreted lambda (CollapseProject inlines
    * the binding back — measured ~1.7k rows/s vs ~54k for this form).
    * Emits (doc_id, leaked_gram_ct) for contaminated docs only; route
    * them to the K7 quarantine before they reach the corpus.
    * Count-exact vs the batch report (`StreamingDedupSpec`). */
  def contaminationProbe(stream: DataFrame, benchmark: DataFrame,
                         n: Int = 8): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val benchGrams = DedupOps.gramRows(benchmark, n)
      .select(col("gram")).distinct().collect().map(_.getString(0)).toSet
    val bc = spark.sparkContext.broadcast(benchGrams)
    stream.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val bench = bc.value
        it.flatMap { case (id, text) =>
          val t = graft.functions.Tokenize.tokensScala(text)
          val leaked =
            if (t.length < n) 0
            else t.sliding(n).map(_.mkString(" ")).filter(bench.contains)
              .toSet.size
          if (leaked > 0) Some((id, leaked.toLong)) else None
        }
      }
      .toDF("doc_id", "leaked_gram_ct")
  }

  /** The corpus's boilerplate lines as exact strings, collected for
    * broadcast into `lineDedupProbe`. DRIVER-BOUNDED by contract, like
    * the contamination gram set: the caller picks a `minRepeat` (or
    * pre-filters) such that the over-threshold line set is
    * broadcast-sized — true boilerplate (headers, footers, cookie
    * banners) is tiny relative to any corpus. When a corpus's repeated
    * -line set outgrows broadcast, strip lines in batch
    * (`TextAnalysis.lineDedup`'s shuffle anti join) instead. */
  def lineIndex(documents: DataFrame, minRepeat: Int = 2): Array[String] =
    graft.operators.llm.TextAnalysis.boilerLines(documents, minRepeat)
      .collect().map(_.getString(0))

  /** Stateless line-level boilerplate strip at ingest: the streaming
    * twin of `TextAnalysis.lineDedup` against a STATIC corpus line
    * index. Pure per-row expression work — split, filter against the
    * broadcast literal set, rejoin — no join, no state, restart =
    * replay. Matching is by exact line string (same rule as the batch
    * anti join), so twin outputs are identical for the same index.
    * Emits every row with its cleaned text and removal counts; a doc
    * whose every line is boilerplate survives as an empty string,
    * exactly like the batch form. */
  def lineDedupProbe(stream: DataFrame, index: Array[String]): DataFrame = {
    val boiler = typedLit(index.toSeq)
    val lines = split(col("text"), "\n")
    val kept = filter(lines, l => !array_contains(boiler, l))
    stream.select(col("doc_id"),
      array_join(kept, "\n").as("clean_text"),
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(kept)).cast("long").as("n_lines_removed"))
  }

  /** The corpus's duplicated n-token spans as exact strings, collected
    * for broadcast into `spanDedupProbe`. DRIVER-BOUNDED by contract
    * (same as `lineIndex`): pick `minRepeat`/pre-filter so the
    * over-threshold span set is broadcast-sized; when it outgrows
    * broadcast, strip spans in batch (`TextAnalysis.spanDedup`'s
    * shuffle flag join) instead. */
  def spanIndex(documents: DataFrame, n: Int = 10,
                minRepeat: Int = 2): Array[String] =
    graft.operators.llm.TextAnalysis.dupSpans(documents, n, minRepeat)
      .collect().map(_.getString(0))

  /** Stateless repeated-span strip at ingest: the streaming twin of
    * `TextAnalysis.spanDedup` against a STATIC dup-span index. Typed
    * `mapPartitions` like `contaminationProbe` — an expression-level
    * per-row gram array re-evaluates the split inside the interpreted
    * lambda (the measured HOF trap) — sliding an n-token window
    * against the broadcast set and merging covered positions exactly
    * like the batch coverage max. Same index in, bit-identical
    * clean_text/counts out (parity spec); no join, no state,
    * restart = replay. */
  def spanDedupProbe(stream: DataFrame, index: Array[String],
                     n: Int = 10): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index.toSet)
    stream.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val dup = bc.value
        it.map { case (id, text) =>
          // split(" ", -1) == Spark's split(text, ' '): keeps empty
          // tokens, "" -> [""] — the batch twin's exact tokenization
          val tk = text.split(" ", -1)
          val covered = new Array[Boolean](tk.length)
          var spans = 0L
          var i = 0
          while (i + n <= tk.length) {
            if (dup.contains(tk.slice(i, i + n).mkString(" "))) {
              spans += 1
              java.util.Arrays.fill(covered, i, i + n, true)
            }
            i += 1
          }
          val kept = tk.indices.collect { case j if !covered(j) => tk(j) }
          (id, kept.mkString(" "), tk.length.toLong,
            covered.count(identity).toLong, spans)
        }
      }
      .toDF("doc_id", "clean_text", "n_tokens", "n_tokens_removed",
        "n_dup_spans")
  }

  /** JVM twin of `TextAnalysis.md5Bucket` (first 2 md5 bytes as hex,
    * mod nBuckets) — the scoring probes' side of the parity-critical
    * triple (column expression / DuckDB oracle / this). */
  private def md5Bucket(md: java.security.MessageDigest, s: String,
                        nBuckets: Int): Long = {
    val d = md.digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      f"${d(0) & 0xff}%02x${d(1) & 0xff}%02x", 16) % nBuckets
  }

  /** The batch-built DSIR weight table collected for broadcast into
    * `dsirScoreProbe`. DRIVER-BOUNDED by construction — hashed
    * features cap it at `nBuckets` rows regardless of corpus size. */
  def dsirIndex(documents: DataFrame, nBuckets: Int = 4096): Map[Long, Double] =
    graft.operators.llm.TextAnalysis
      .importanceWeights(documents, nBuckets = nBuckets)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** Stateless DSIR scoring at ingest: the streaming twin of
    * `TextAnalysis.importanceScores` against a STATIC weight index —
    * score arriving documents for target-likeness before they enter
    * the corpus (route low scorers to quarantine, or resample on the
    * score downstream). Typed `mapPartitions` like the other probes
    * (per-row md5-bucket + map lookup; no join, no state, restart =
    * replay). A token whose bucket is absent from the index
    * contributes 0 — the batch left join's null-skip contract.
    * `n_tokens` is count-exact vs batch; the score agrees to within
    * one 4-dp rounding step (summation order differs; weights are
    * 6-dp so the drift is fp-epsilon — StreamingDedupSpec bounds it). */
  def dsirScoreProbe(stream: DataFrame, index: Map[Long, Double],
                     nBuckets: Int = 4096): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index)
    stream.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val w = bc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val toks = graft.functions.Tokenize.tokensScala(text)
          var s = 0.0
          toks.foreach { t =>
            s += w.getOrElse(md5Bucket(md, t, nBuckets), 0.0)
          }
          val n = toks.length.toLong
          val score = if (n == 0) 0.0
            else BigDecimal(s / n)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, n, score)
        }
      }
      .toDF("doc_id", "n_tokens", "dsir_score")
  }

  /** Stateless model-based quality filtering at ingest: the streaming
    * twin of `TextAnalysis.classifierScore` — score arriving documents
    * with the hashed-feature linear classifier and attach the keep
    * verdict before they reach the corpus (route rejects to the K7
    * quarantine). Needs NO index at all: the stand-in weights derive
    * from the bucket id, so the probe is pure per-row JVM work — no
    * join, no broadcast, no state, restart = replay (a trained
    * deployment broadcasts its weight array exactly like
    * `dsirScoreProbe`'s map). Integer weight sums are exact and
    * order-free, so — unlike the fp-bounded DSIR/LM probes — stream
    * scores are BIT-IDENTICAL to batch (StreamingDedupSpec asserts
    * equality, not a bound). */
  def classifierScoreProbe(stream: DataFrame, dim: Int = 4096,
                           threshold: Double = 0.0): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val toks = graft.functions.Tokenize.tokensScala(text)
          var s = 0L
          toks.foreach { t =>
            // weight of bucket b: first 4 md5 hex of "w:b" % 2001 - 1000
            // — the batch column expression's exact arithmetic
            s += md5Bucket(md, s"w:${md5Bucket(md, t, dim)}", 2001) - 1000L
          }
          val n = toks.length.toLong
          val score =
            if (n == 0) None
            else Some(BigDecimal((s / 1000.0) / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          (id, n, score, score.exists(_ >= threshold))
        }
      }
      .toDF("doc_id", "n_tokens", "quality_score", "keep")
  }

  /** The batch-trained LM collected for broadcast into
    * `lmPerplexityProbe`: (bigram → 6-dp logp, context-bucket →
    * backoff logp). DRIVER-BOUNDED by the curated-target contract —
    * uni ≤ nBuckets rows, model ≤ the target slice's distinct bigrams.
    * Both maps collect from Spark frames so every logp carries the
    * batch side's exact 6-dp rounding. */
  def lmIndex(documents: DataFrame, nBuckets: Int = 4096)
      : (Map[(Long, Long), Double], Map[Long, Double]) = {
    val (model, uni) = graft.operators.llm.TextAnalysis
      .lmModel(documents, nBuckets = nBuckets)
    val m = model.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val backoff = uni.select(col("b1"),
        round(log(lit(1.0) / (col("c1") + nBuckets)), 6).as("lp0"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (m, backoff)
  }

  /** Stateless LM-perplexity scoring at ingest: the streaming twin of
    * `TextAnalysis.lmPerplexity` against the static trained model —
    * the CCNet-style ingest quality cut (route high-ppl rows to
    * quarantine). Typed `mapPartitions` like the other probes; a
    * bigram absent from the model backs off to its context bucket, an
    * unseen context to `ln(1/nBuckets)` — the batch join's exact
    * coalesce chain. Bigram counts are count-exact vs batch; scores
    * agree within one 4-dp rounding step (StreamingDedupSpec). */
  def lmPerplexityProbe(stream: DataFrame,
                        index: (Map[(Long, Long), Double], Map[Long, Double]),
                        nBuckets: Int = 4096): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index)
    val defaultLp = BigDecimal(math.log(1.0 / nBuckets))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    stream.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val (model, backoff) = bc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val (n, avg, ppl) =
            StreamingDedup.pplOf(md, model, backoff, defaultLp, nBuckets, text)
          (id, n, avg, ppl)
        }
      }
      .toDF("doc_id", "n_bigrams", "avg_logp", "ppl")
  }

  /** One document's (n_bigrams, avg_logp, ppl) against the broadcast
    * model — shared by the scoring probe and the tier router. */
  private def pplOf(md: java.security.MessageDigest,
                    model: Map[(Long, Long), Double],
                    backoff: Map[Long, Double], defaultLp: Double,
                    nBuckets: Int, text: String): (Long, Double, Double) = {
    val bs = graft.functions.Tokenize.tokensScala(text)
      .map(md5Bucket(md, _, nBuckets))
    var s = 0.0
    var n = 0L
    bs.sliding(2).foreach {
      case Seq(b1, b2) =>
        s += model.getOrElse((b1, b2), backoff.getOrElse(b1, defaultLp))
        n += 1
      case _ => ()
    }
    if (n == 0) (0L, 0.0, 0.0)
    else {
      val avg = s / n
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (n, r4(avg), r4(math.exp(-avg)))
    }
  }

  /** CCNet tier ROUTER at ingest: score the stream with the
    * batch-trained bigram model (`lmPerplexityProbe`), then bucket
    * against the batch-computed per-language percentile cuts
    * (`TextAnalysis.pplBuckets`' `cuts` table, collected once and
    * shipped as a literal) — stream docs land in head/middle/tail
    * exactly as the batch pass would place them. Stateless: model
    * broadcast + tiny cuts map, no streaming state. */
  def pplRouteProbe(stream: DataFrame,
                    index: (Map[(Long, Long), Double], Map[Long, Double]),
                    cuts: Map[String, (Double, Double)],
                    nBuckets: Int = 4096): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((index, cuts))
    val defaultLp = BigDecimal(math.log(1.0 / nBuckets))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    stream.select(col("doc_id").cast("long"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val ((model, backoff), cutMap) = bc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, lang, text) =>
          val (_, _, ppl) =
            pplOf(md, model, backoff, defaultLp, nBuckets, text)
          val bucket = cutMap.get(lang) match {
            case Some((p33, _)) if ppl <= p33 => "head"
            case Some((_, p66)) if ppl <= p66 => "middle"
            case Some(_) => "tail"
            case None => null
          }
          (id, lang, ppl, bucket)
        }
      }
      .toDF("doc_id", "lang", "ppl", "bucket")
  }

  /** Exact dedup at ingest: content-hash + watermark-bounded state
    * (`dropDuplicatesWithinWatermark`) — emits only first-seen content;
    * state for a hash is dropped once the watermark passes it, so a
    * re-crawl months later re-admits the document (by design: bounded
    * state; pair with batch `DedupOps.exact` for corpus-wide dedup). */
  def exactIngestDedup(docs: DataFrame,
                       watermark: String = "10 seconds"): DataFrame =
    docs.withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
