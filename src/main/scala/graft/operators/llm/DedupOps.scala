package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Tokenize

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Exact dedup is a hash-groupBy; near-dup detection uses MinHash+LSH
  * (shingle → 64-perm signature → 16 bands × 4 rows → bucket join,
  * tuned for Jaccard ≳ 0.6: detection ≈ 1-(1-J⁴)¹⁶ ≈ 99% at J=0.7),
  * SimHash (64-bit, 4×16-bit bands), and exact n-gram Jaccard within
  * LSH candidate pairs. All hashing uses Spark's codegen'd `xxhash64`
  * (deterministic across runs/executors — no RNG in the plan).
  *
  * Scale posture: every stage is expression-level (whole-stage codegen,
  * no UDFs); the only shuffles are the band-bucket exchange and the
  * candidate self-join, whose input is |docs|×bands rows, not |docs|².
  * Banding keeps the candidate set near-linear at 100 TB; the
  * verification join touches only colliding pairs.
  */
object DedupOps {

  /** Exact dedup by content hash: canonical row = min doc_id per md5
    * group (kept deterministic for the oracle). */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("dup_ct"))
      .orderBy("canonical_doc_id")

  /** Word 3-gram shingles of `text`; docs shorter than 3 tokens fall
    * back to the whole text as one shingle. */
  def shingles(text: Column): Column = {
    val ws = Tokenize.tokens(text)
    when(size(ws) >= 3,
      array_distinct(transform(sequence(lit(0), size(ws) - 3), i =>
        concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2),
          element_at(ws, i + 3)))))
      .otherwise(array(concat_ws(" ", ws)))
  }

  /** 64-permutation MinHash signature over the shingle set: sig[p] =
    * min over shingles of xxhash64(shingle, p).
    *
    * Inline Column form — correct but NOT used in the pipeline: Catalyst
    * inlines the shingle-array expression inside the permutation lambda,
    * so each row rebuilds its shingle array 64×(measured 700 s at sf0.1
    * vs ~2 s for the exploded form below). Kept for tests/reference. */
  def minhashSignature(shingleCol: Column, perms: Int = 64): Column =
    transform(sequence(lit(0), lit(perms - 1)), p =>
      array_min(transform(shingleCol, sh => xxhash64(sh, p))))

  /** Relational 3-gram shingle rows (doc_id, shingle) — the scalable
    * form: `posexplode` tokens once, assemble each gram with two
    * `lead()` window steps (codegen'd; one shuffle+sort on doc_id).
    * Building the gram array per row with `transform`/`concat_ws`
    * lambdas is interpreted and cost ~19 s at sf0.1 vs ~2 s here.
    * Output is a bag (duplicates kept). Short docs (<3 tokens) fall
    * back to the whole text as one shingle, matching `shingles()`. */
  def shingleRows(documents: DataFrame): DataFrame = {
    // 3-gram kernel shared with gramRows (one copy of the
    // posexplode + lead pipeline); the whole-text fallback for
    // sub-3-token docs is the shingle-specific part
    val grams = gramRows(documents, 3)
      .withColumnRenamed("gram", "shingle")
    val shortDocs = graft.core.Tables.spread(documents)
      .filter(size(Tokenize.tokens(col("text"))) < 3)
      .select(col("doc_id"),
        concat_ws(" ", Tokenize.tokens(col("text"))).as("shingle"))
    grams.unionByName(shortDocs)
  }

  /** Scalable signature table over `shingleRows`: hash each shingle
    * string ONCE; the `perms` permutations are murmur3-fmix64
    * avalanches of (base xor C_p) via the native Mix64 expression
    * (wrapping long arithmetic — ANSI-safe). A full-avalanche family is
    * required: a single xor+multiply family has correlated argmins and
    * destroys recall. min() is duplicate-insensitive, so the bag-of-
    * shingles input needs no distinct. One shuffle (groupBy doc_id)
    * with map-side combine. */
  /** Golden-ratio mix64 family constant — single source in
    * `Mix64Impl.golden` (shared with the native `MinHashSig`). */
  private[graft] val golden = graft.functions.Mix64Impl.golden

  /** Streaming-safe signature from a MATERIALIZED shingle-hash-array
    * column. The column must be a bound attribute (`withColumn` first):
    * referencing the shingle expression directly would re-inline — and
    * re-evaluate — the whole shingle pipeline once per permutation
    * (Catalyst's CollapseProject keeps multiply-referenced non-cheap
    * aliases, so the withColumn boundary survives optimization —
    * verified: the physical plan stays ~4 KB and the measured cost is
    * ~4× the batch aggregate form, not 64×). */
  def signatureFromHashes(hs: Column, perms: Int = 64): Column =
    array((0 until perms).map(p =>
      array_min(transform(hs, h =>
        graft.functions.VectorExprs.mix64(h, golden * (2L * p + 1L))))): _*)

  /** Band rows (doc_id, band, band_hash, sig) for LSH bucketing:
    * `bands` buckets of `rowsPerBand` signature slots each. Works on
    * batch and streaming frames (narrow ops only). */
  def bandRows(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("band_hash",
        xxhash64(slice(col("sig"), col("band") * rowsPerBand + 1,
          lit(rowsPerBand)), col("band")))

  def signatures(documents: DataFrame, perms: Int = 64): DataFrame =
    signaturesFromShingles(shingleRows(documents), perms)

  /** Native one-pass signature table — bit-identical to `signatures`
    * (`MinHashSig` parity spec) with ZERO exchanges: the relational
    * form explodes a row per token through a window sort and
    * re-aggregates through a doc_id shuffle; this is one narrow
    * projection on the scan's own partitioning (locally `spread`
    * round-robins the single-file inputs first). The default
    * signature source for the LSH pipeline. */
  def signaturesNative(documents: DataFrame, perms: Int = 64): DataFrame =
    graft.core.Tables.spread(documents)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextExprs.minhash_sig(col("text"), perms).as("sig"))

  /** Native sorted gram-hash sets — set-equal to the
    * `collect_set(xxhash64(shingle))` aggregate over `shingleRows`
    * (parity spec), same zero-exchange shape as `signaturesNative`. */
  def gramSetsNative(documents: DataFrame, n: Int = 3): DataFrame =
    graft.core.Tables.spread(documents)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextExprs.gram_hash_set(col("text"), n).as("grams"))

  /** Signature aggregate over precomputed (doc_id, shingle) rows —
    * callers that also consume the shingle rows elsewhere (e.g. the
    * Jaccard verifier) build them once and pass them here so both
    * consumers share one plan subtree (AQE reuses the common stage). */
  def signaturesFromShingles(shingleRows: DataFrame,
                             perms: Int = 64): DataFrame = {
    val sh = shingleRows
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val aggs = (0 until perms).map { p =>
      min(graft.functions.VectorExprs.mix64(col("h"), golden * (2L * p + 1L)))
        .as(s"m$p")
    }
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until perms).map(p => col(s"m$p")): _*).as("sig"))
  }

  /** Drop rows in degenerate buckets — buckets bigger than `cap` would
    * make the candidate self-join quadratic (a boilerplate-heavy corpus
    * can put millions of docs in one band bucket). A capped bucket's
    * docs still pair through their other bands; byte-identical docs
    * (colliding in EVERY band) belong to `exact` dedup, not LSH. The
    * count is a window function over the same keys the self-join
    * shuffles on, so the cap adds a sort, not an exchange. */
  private[graft] def capBuckets(banded: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    banded.withColumn("__bucket_ct", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)))
      .filter(col("__bucket_ct") <= cap)
      .drop("__bucket_ct")

  /** MinHash + LSH near-dup pairs: band the signature (bands ×
    * rowsPerBand), bucket-join on (band, hash(band slice)), verify
    * candidates by estimated Jaccard (matching signature fraction).
    * Buckets larger than `maxBucketSize` are dropped (see `capBuckets`).
    * Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b. */
  def minhashPairs(documents: DataFrame, threshold: Double = 0.5,
                   bands: Int = 16, rowsPerBand: Int = 4,
                   maxBucketSize: Int = 10000,
                   shingles: Option[DataFrame] = None): DataFrame = {
    require(bands * rowsPerBand == 64,
      s"bands*rowsPerBand must equal the 64-perm signature, got $bands x $rowsPerBand")
    // signature source: the native one-pass kernel (zero exchanges) —
    // bit-identical to the relational aggregate, which remains the
    // path for callers passing a precomputed shingle frame
    val sigs = shingles.fold(signaturesNative(documents))(
      sh => signaturesFromShingles(sh))
    val banded = capBuckets(
      bandRows(sigs, bands, rowsPerBand)
        .select("doc_id", "band", "band_hash", "sig"),
      Seq("band", "band_hash"), maxBucketSize)
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    candidates
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)) / size(col("sig_a")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash from token hashes: bit j of the fingerprint is the
    * sign of sum over tokens of ±1 on bit j of xxhash64(token).
    * Inline Column form (same per-row re-evaluation caveat as
    * `minhashSignature`; pipeline uses `simhashTable`). */
  def simhash(text: Column): Column = {
    val ws = Tokenize.tokens(text)
    val bitSums = transform(sequence(lit(0), lit(63)), j =>
      aggregate(ws, lit(0L), (acc, w) =>
        acc + when(call_function("shiftright", xxhash64(w), j).bitwiseAND(lit(1)) === 1, 1L)
          .otherwise(-1L)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)), (s, j) =>
        when(s > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Scalable SimHash table: explode tokens once, hash each token once,
    * then a single hash-aggregate with `bits` signed bit-sums per doc;
    * fingerprint assembled from the aggregated sums. Default (xxhash64,
    * 64 bits) is identical in output to `simhash`; the oracle twin
    * check swaps in the md5-derived 32-bit family DuckDB can replay. */
  def simhashTable(documents: DataFrame,
                   hashFn: Column => Column = xxhash64(_),
                   bits: Int = 64): DataFrame = {
    // explode_outer: a zero-token doc keeps one null-token row, whose
    // hash is hashFn(NULL) (= the seed 42 for xxhash64), giving a
    // well-defined fingerprint; plain explode would drop the doc and
    // lose empty-vs-empty duplicate pairs
    val words = graft.core.Tables.spread(documents)
      .select(col("doc_id"), explode_outer(Tokenize.tokensNullable(col("text"))).as("w"))
      .withColumn("h", hashFn(col("w")))
    val bitAggs = (0 until bits).map(j =>
      sum(when(call_function("shiftright", col("h"), lit(j))
        .bitwiseAND(lit(1)) === 1, 1L).otherwise(-1L)).as(s"b$j"))
    words.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("fp"))
  }

  /** SimHash near-dup pairs: band the 64-bit fingerprint into 4×16-bit
    * keys, bucket-join, keep pairs with Hamming distance ≤ maxHamming.
    * Buckets larger than `maxBucketSize` are dropped (see `capBuckets`).
    * Returns (doc_a, doc_b, hamming). */
  /** Native one-pass fingerprint table — bit-identical to
    * `simhashTable`'s xxhash64/64 default (parity spec), zero
    * exchanges. NULL text maps to the relational form's null-token
    * fingerprint (42) via coalesce. */
  def simhashTableNative(documents: DataFrame): DataFrame =
    graft.core.Tables.spread(documents)
      .select(col("doc_id"),
        coalesce(graft.functions.TextExprs.simhash_fp(col("text")),
          lit(42L)).as("fp"))

  def simhashPairs(documents: DataFrame, maxHamming: Int = 6,
                   maxBucketSize: Int = 10000): DataFrame = {
    val fps = simhashTableNative(documents)
    val banded = capBuckets(fps.select(col("doc_id"), col("fp"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_key",
        call_function("shiftright", col("fp"), col("band") * 16).bitwiseAND(lit(0xFFFFL))),
      Seq("band", "band_key"), maxBucketSize)
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .dropDuplicates("doc_a", "doc_b")
    pairs
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard verification over MinHash candidates: the
    * LSH pass proposes, the exact set intersection disposes. Gram SETS
    * are `collect_set` over the grams' xxhash64 — an 8-byte long per
    * distinct gram instead of the gram string, which shrinks the
    * aggregate state and its shuffle ~4× while leaving |A∩B|/|A∪B|
    * unchanged (64-bit collisions are negligible next to the MinHash
    * estimate this pass verifies). The candidate pair set is small, so
    * it broadcasts into both gram joins. */
  def ngramJaccardPairs(documents: DataFrame, lshThreshold: Double = 0.3,
                        jaccardThreshold: Double = 0.5): DataFrame = {
    // Both sides are native one-pass kernels now (signatures inside
    // minhashPairs, gram sets here) — no exploded shingle table to
    // share or persist; each is a narrow projection over the corpus.
    // (The old shared-shingle form measured 3.2 s at sf0.1; see the
    // bench artifact for the native chain.)
    val grams = gramSetsNative(documents)
    val candidates = broadcast(
      minhashPairs(documents, lshThreshold)
        .select("doc_a", "doc_b"))
    candidates
      .join(grams.select(col("doc_id").as("doc_a"), col("grams").as("grams_a")), "doc_a")
      .join(grams.select(col("doc_id").as("doc_b"), col("grams").as("grams_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("grams_a"), col("grams_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("grams_a")) + size(col("grams_b")) - col("inter")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Containment near-dup detection — |A∩B| / min(|A|,|B|) on word
    * 3-gram sets, the asymmetric companion to Jaccard that catches
    * SUBSET/superset relations (a quote inside a longer page, a
    * truncated re-crawl) Jaccard dilutes: a 50-gram doc fully
    * contained in a 500-gram doc scores containment 1.0 but Jaccard
    * 0.1. Run over the planted near-dup corpus (`withNearDuplicates`:
    * each twin drops every 15th word of its base, so twin ⊂ base up
    * to gram breaks at the removal points).
    *
    * Blocking: candidate pairs share at least one RARE gram (corpus
    * frequency in [2, maxBucket]) — pair fan-out is bounded by
    * Σ f² ≤ maxBucket · |rare grams| regardless of corpus size, and
    * genuinely contained docs always share rare grams (a gram unique
    * to the pair IS rare). Stop-grams never generate candidates —
    * the cap here costs recall only for pairs ALL of whose shared
    * grams are corpus-common, which containment semantics does not
    * target. Everything emitted is INTEGER (inter, sizes; the
    * threshold compares cross-multiplied ints), so the DuckDB oracle
    * is bit-exact with no rounding contract. */
  def containmentPairs(documents: DataFrame, maxBucket: Int = 5,
                       minPct: Int = 80, every: Int = 10): DataFrame = {
    val corpus = withNearDuplicates(documents, every)
    // Gram identity is the 64-bit xxhash64 of the gram, not the gram
    // string (r10 optimization — the same 8-bytes-for-strings trade
    // `ngramJaccardPairs` documents): the native one-pass kernel
    // replaces the posexplode + lead-window shingle pipeline AND the
    // per-doc collect_set aggregate (two exchanges + a per-doc sort
    // gone), the rare-gram count and the candidate self-join shuffle
    // longs instead of gram strings, and the per-doc set needs no
    // distinct (the kernel emits sets). All counts — inter, sizes,
    // rare frequencies — are unchanged next to the string form bar a
    // 64-bit collision inside one corpus (odds ~|grams|²/2⁶⁵,
    // negligible next to the blocking recall trade already accepted);
    // the integer threshold algebra is untouched.
    val sets = gramSetsNative(corpus)
    val grams = sets.select(col("doc_id"), explode(col("grams")).as("h"))
    val rare = grams.groupBy("h").agg(count(lit(1)).as("f"))
      .filter(col("f") >= 2 && col("f") <= maxBucket)
      .select("h")
    val rareGrams = grams.join(rare, "h")
    val candidates = rareGrams.select(col("doc_id").as("doc_a"), col("h"))
      .join(rareGrams.select(col("doc_id").as("doc_b"), col("h")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("grams").as("ga")),
        "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("grams").as("gb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("inter"),
        size(col("ga")).cast("long").as("size_a"),
        size(col("gb")).cast("long").as("size_b"))
      .filter(col("inter") * 100 >= lit(minPct) *
        least(col("size_a"), col("size_b")))
      .orderBy("doc_a", "doc_b")
  }

  // ---- Oracle-able twin variants -----------------------------------
  // The twin corpus pairs doc i with doc i+1_000_000 deterministically,
  // so exact per-pair metrics are DuckDB-expressible: where the runtime
  // xxhash64/mix64 families cannot be replayed in SQL, these variants
  // run the SAME shingle/signature/fingerprint machinery with an
  // md5-derived hash family both engines compute bit-identically,
  // turning the spec-only ops into driver-checked green rows.

  /** 32-bit hash from the md5 hex prefix — identical in DuckDB as
    * `CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)`. */
  private[graft] def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Exact word-3-gram Jaccard for each twin pair — the verification
    * half of `ngramJaccardPairs` on gram STRINGS (no hashing at all),
    * over the same `shingleRows` pipeline. */
  def twinNgramJaccard(documents: DataFrame, every: Int = 10): DataFrame = {
    val grams = shingleRows(withNearDuplicates(
      documents.filter(col("doc_id") % every === 0), every))
      .groupBy("doc_id").agg(collect_set(col("shingle")).as("grams"))
    val a = grams.filter(col("doc_id") < 1000000L)
      .select(col("doc_id").as("doc_a"), col("grams").as("grams_a"))
    val b = grams.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("doc_a"),
        col("doc_id").as("doc_b"), col("grams").as("grams_b"))
    a.join(broadcast(b), "doc_a")
      .withColumn("inter", size(array_intersect(col("grams_a"), col("grams_b"))))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") /
          (size(col("grams_a")) + size(col("grams_b")) - col("inter")), 4)
          .as("jaccard"))
      .orderBy("doc_a")
  }

  /** SimHash Hamming distance for each twin pair, md5-32 family —
    * exercises the full `simhashTable` machinery (explode, signed
    * bit-sums, fingerprint assembly) with a DuckDB-replayable hash. */
  def twinSimhashHamming(documents: DataFrame, every: Int = 10): DataFrame = {
    val fps = simhashTable(withNearDuplicates(
      documents.filter(col("doc_id") % every === 0), every), md5Hash32, 32)
    val a = fps.filter(col("doc_id") < 1000000L)
      .select(col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = fps.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("doc_a"),
        col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(broadcast(b), "doc_a")
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int").as("hamming"))
      .orderBy("doc_a")
  }

  /** MinHash signature agreement (estimated Jaccard) for each twin
    * pair, md5-32 permutation family h_p(g) = md5_32(g || ":" || p) —
    * exercises the min-per-permutation signature aggregate and the
    * slot-agreement estimate exactly as `minhashPairs` does. */
  def twinMinhashEst(documents: DataFrame, every: Int = 10,
                     perms: Int = 32): DataFrame = {
    val sh = shingleRows(withNearDuplicates(
      documents.filter(col("doc_id") % every === 0), every))
    val aggs = (0 until perms).map(p =>
      min(md5Hash32(concat(col("shingle"), lit(":" + p)))).as(s"m$p"))
    val sigs = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until perms).map(p => col(s"m$p")): _*).as("sig"))
    val a = sigs.filter(col("doc_id") < 1000000L)
      .select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = sigs.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("doc_a"),
        col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(broadcast(b), "doc_a")
      .select(col("doc_a"), col("doc_b"),
        round(size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)) / lit(perms.toDouble), 4)
          .as("est_jaccard"))
      .orderBy("doc_a")
  }

  /** Relational word n-gram rows for arbitrary n — `shingleRows`
    * generalized (one posexplode + n-1 `lead()` columns over a single
    * doc_id window; docs shorter than n emit nothing, correct for the
    * long-gram uses below). */
  def gramRows(documents: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"gram size must be positive, got $n")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val words = graft.core.Tables.spread(documents)
      .select(col("doc_id"),
        posexplode(Tokenize.tokens(col("text"))).as(Seq("pos", "w")))
    val withLeads = (1 until n).foldLeft(words)((df, i) =>
      df.withColumn(s"w$i", lead(col("w"), i).over(byDoc)))
    val gramCols = col("w") +: (1 until n).map(i => col(s"w$i"))
    (if (n > 1) withLeads.filter(col(s"w${n - 1}").isNotNull) else withLeads)
      .select(col("doc_id"), concat_ws(" ", gramCols: _*).as("gram"))
  }

  /** Benchmark decontamination — the training-data hygiene pass that
    * removes eval-set leakage before training: flag every corpus doc
    * sharing at least one exact `n`-gram (default 8, long enough that
    * chance collisions vanish) with any benchmark document. The
    * benchmark gram set is |bench|×grams rows — eval suites are tiny
    * relative to a corpus — so it broadcasts and the corpus is scanned
    * once; at benchmark sizes past broadcast the same plan shuffles on
    * the gram hash. Output: one row per contaminated doc with the
    * count of distinct leaked grams (`decontaminate` keeps the clean
    * complement). */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
                          n: Int = 8): DataFrame = {
    val benchGrams = broadcast(
      gramRows(benchmark, n).select(col("gram")).distinct())
    gramRows(corpus, n)
      .join(benchGrams, "gram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("leaked_gram_ct"))
      .orderBy("doc_id")
  }

  /** The clean complement: corpus rows with no benchmark n-gram. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    n: Int = 8): DataFrame =
    corpus.join(
      contaminationReport(corpus, benchmark, n).select(col("doc_id")),
      Seq("doc_id"), "left_anti")

  /** `contaminationReport` with a Bloom pre-screen — the 100 TB path.
    *
    * At scale the exact benchmark gram SET stops broadcasting long
    * before the benchmark stops mattering (a 10M-gram eval suite is
    * ~1 GB of strings but ~12 MB of Bloom bits at 1% fpp). Two-phase
    * plan: (1) build a driver-side Bloom filter over the distinct
    * benchmark grams (one pass over the tiny side; `expectedItems`
    * from an exact count of the same frame, so the fpp target is
    * honest); (2) scan the corpus grams ONCE, dropping every gram the
    * Bloom rejects — no false negatives, so survivors are a superset
    * of the true matches — then (3) exact-join only the survivors
    * against the gram set. False positives die in phase 3, making the
    * result BIT-IDENTICAL to `contaminationReport` (same oracle SQL);
    * the Bloom only prunes the join's probe side from |corpus grams|
    * to ~|true matches| + fpp·|corpus grams|.
    *
    * The screen is a broadcast-variable UDF (one hash probe per gram);
    * it sits between two codegen spans rather than inside one, the
    * standard trade for sketch probes — the row volume it removes
    * dwarfs the codegen break. */
  def contaminationReportBloom(corpus: DataFrame, benchmark: DataFrame,
                               n: Int = 8, fpp: Double = 0.01): DataFrame = {
    val benchGrams = gramRows(benchmark, n).select(col("gram")).distinct()
    val expectedItems = math.max(benchGrams.count(), 1L)
    val bloom = benchGrams.stat.bloomFilter("gram", expectedItems, fpp)
    val bcast = corpus.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => bcast.value.mightContainString(g))
    gramRows(corpus, n)
      .filter(mightContain(col("gram")))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("leaked_gram_ct"))
      .orderBy("doc_id")
  }

  /** Deterministic contamination fixture for the driver oracle: the
    * benchmark is every 97th doc; corpus docs with `doc_id % 31 == 5`
    * whose `doc_id % 5` matches a benchmark index get that benchmark's
    * first 12 tokens appended — 5 planted 8-grams each, replayable in
    * SQL. Returns (corpus-with-injections, benchmark). */
  def contaminationFixture(documents: DataFrame): (DataFrame, DataFrame) = {
    val benchmark = documents.filter(col("doc_id") % 97 === 0)
    val snippets = broadcast(benchmark.select(
      (col("doc_id") / 97).cast("long").as("b_idx"),
      concat_ws(" ", slice(Tokenize.tokens(col("text")), 1, 12)).as("snippet")))
    val corpus = documents.filter(col("doc_id") % 97 =!= 0)
      .join(snippets, col("doc_id") % 5 === col("b_idx"), "left_outer")
      .select(col("doc_id"),
        when(col("doc_id") % 31 === 5 && col("snippet").isNotNull,
          concat_ws(" ", col("text"), col("snippet")))
          .otherwise(col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    (corpus, benchmark)
  }

  /** Deterministic near-duplicate generator for exercising the dedup
    * operators at any scale: every `every`-th doc gets a mutated twin
    * (doc_id + 1_000_000) with every 15th token dropped (shingle
    * Jaccard ≈ 0.7 — inside the LSH detection band). */
  def withNearDuplicates(documents: DataFrame, every: Int = 10): DataFrame = {
    val ws = Tokenize.tokens(col("text"))
    val mutated = documents
      .filter(col("doc_id") % every === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ",
          filter(zip_with(ws, sequence(lit(0), size(ws) - 1), (w, i) =>
            when(i % 15 === 0, lit(null)).otherwise(w)), w => w.isNotNull))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    documents.select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(mutated)
  }

  /** Sorted-neighborhood near-dup blocking (Hernández & Stolfo 1995,
    * "The merge/purge problem"): sort on a normalized key, compare
    * each record only to its `w−1` successors in sort order, verify
    * the survivors with Jaro–Winkler in integer micros. Distributed
    * contract: the sliding window is PARTITIONED by the key's 2-char
    * bucket — windows never cross buckets, so no global single-
    * partition sort exists at any scale; a near-pair whose normalized
    * prefixes diverge in the first two characters is out of scope by
    * construction (the standard distributed-SNM trade, and the oracle
    * replays the identical bucketing). The comparison string is the
    * normalized text capped at 64 chars, so the verify cost is
    * per-pair constant. */
  def snmNearDups(documents: DataFrame, w: Int = 4,
                  minMicros: Long = 900000L): DataFrame = {
    require(w >= 2, "snmNearDups: need window >= 2")
    val norm = substring(regexp_replace(lower(col("text")),
      "[^a-z0-9]", ""), 1, 64)
    val keyed = graft.core.Tables.spread(documents)
      .select(col("doc_id"), norm.as("k"))
      .filter(length(col("k")) > 0)
      .withColumn("bucket", substring(col("k"), 1, 2))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("k"), col("doc_id"))
    val leadCols = (1 until w).map(o =>
      lead(col("doc_id"), o).over(win).as(s"nd_$o")) ++
      (1 until w).map(o => lead(col("k"), o).over(win).as(s"nk_$o"))
    val withLeads = keyed.select(
      (Seq(col("doc_id"), col("k"), col("bucket")) ++ leadCols): _*)
    val pairs = (1 until w).map { o =>
      withLeads.filter(col(s"nd_$o").isNotNull)
        .select(col("doc_id").as("doc_a"), col(s"nd_$o").as("doc_b"),
          round(graft.functions.TextExprs
            .jaro_winkler(col("k"), col(s"nk_$o")) * 1000000)
            .cast("bigint").as("jw_micros"))
    }.reduce(_ unionAll _)
    pairs.filter(col("jw_micros") >= minMicros)
      .orderBy("doc_a", "doc_b")
  }
}
