package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.functions._

/** Mergeable frequency / cardinality sketches beyond Misra–Gries
  * ([[HeavyHitters]]): a Count-Min sketch and a KMV (k-minimum-values)
  * distinct-count sketch, both built on the md5-derived hash family
  * the twin dedup variants use (`DedupOps.md5Hash32`) so a SQL engine
  * replays every cell BIT-IDENTICALLY — the sketches are
  * deterministic functions of the data, not seeded approximations,
  * which is what lets the driver hash-compare them like any exact
  * query (reference surface: the Flink warehouse keys everything on
  * exact counts; these add the bounded-state summaries a 100 TB
  * corpus needs when "GROUP BY token" output itself is the problem).
  *
  * Scale posture (Cormode–Muthukrishnan, J.Alg 2005; Bar-Yossef et
  * al. RANDOM 2002): both sketches are MERGEABLE — CMS cells add, KMV
  * keeps the k smallest of a union — so Spark's partial aggregation
  * moves only sketch-sized state (depth×width counters / k hashes)
  * per partition regardless of corpus size. Neither output grows with
  * the data: CMS is a fixed grid, KMV is ≤k values per group.
  */
object Sketches {

  /** 32-bit salted hash from the md5 hex prefix — DuckDB replays it
    * as `CAST(('0x' || substring(md5(salt || w), 1, 8)) AS BIGINT)`. */
  private def h32(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c)), 1, 8), 16, 10).cast("long")

  /** Per-doc-distinct word 3-gram shingles — the unbounded-cardinality
    * stream both sketches summarize (the test corpus's token
    * VOCABULARY is small by construction; its shingle space is not,
    * which is the regime a sketch exists for). Rides the RELATIONAL
    * [[DedupOps.shingleRows]] form (posexplode + lead, codegen'd):
    * the `shingles()` array expression costs ~19 s at sf0.1 against
    * ~2 s here — the documented transform-lambda trap. The distinct
    * makes the bag per-doc-unique, matching `array_distinct` in the
    * column form. */
  private def toks(documents: DataFrame): DataFrame =
    DedupOps.shingleRows(documents)
      .select(col("doc_id"), col("shingle").as("w")).distinct()

  /** Count-Min estimates audited against exact counts: build a
    * depth×width CMS over the shingle stream, then read back every
    * probe shingle's estimate (min over the depth cells) next to its
    * exact count. CMS can only OVERcount (each cell adds colliding
    * shingles' counts), so `over_err >= 0` is an invariant the spec
    * and the integer output both pin down. `ct` counts DOCS containing
    * the shingle (shingles are per-doc distinct), i.e. document
    * frequency — the decontamination/winnowing convention.
    *
    * The sketch is built from the per-shingle count aggregate, not the
    * raw occurrence stream — the depth-way explode multiplies
    * DISTINCT shingles, and the (r, cell) aggregate map-side-combines
    * into at most depth×width rows. Probes are the shingles of length
    * ≥ `minLen` (a deterministic, data-derived probe set). All-integer
    * output: (token, exact_ct, cms_est, over_err). */
  def cmsEstimate(documents: DataFrame, depth: Int = 4, width: Int = 512,
                  minLen: Int = 8): DataFrame = {
    require(depth >= 1 && width >= 1, "cmsEstimate: need depth, width >= 1")
    val counts = toks(documents).groupBy("w").agg(count(lit(1)).as("ct"))
    def cellsOf(df: DataFrame): DataFrame = df.select(col("w"), col("ct"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"),
            (h32(col("w"), s"cms$r:") % width).as("cell"))): _*)).as("rc"))
      .select(col("w"), col("ct"),
        col("rc.r").as("r"), col("rc.cell").as("cell"))
    val sketch = cellsOf(counts).groupBy("r", "cell")
      .agg(sum("ct").as("cct"))
    cellsOf(counts.filter(length(col("w")) >= minLen))
      .join(sketch, Seq("r", "cell"))
      .groupBy(col("w").as("token"))
      .agg(min("ct").as("exact_ct"), min("cct").as("cms_est"))
      .select(col("token"), col("exact_ct"), col("cms_est"),
        (col("cms_est") - col("exact_ct")).as("over_err"))
      .orderBy("token")
  }

  /** Bounded-state KMV accumulator: the k smallest distinct values
    * seen. An immutable sorted set capped at k is both the reduce and
    * the merge (KMV's union-then-truncate IS its merge law), so each
    * partition ships ≤k longs. */
  private[llm] def kmvAggregator(k: Int) =
    new org.apache.spark.sql.expressions
      .Aggregator[Long, scala.collection.immutable.SortedSet[Long], Seq[Long]] {
      type B = scala.collection.immutable.SortedSet[Long]
      def zero: B = scala.collection.immutable.SortedSet.empty[Long]
      private def cap(s: B): B = if (s.size <= k) s else s.take(k)
      def reduce(b: B, h: Long): B = cap(b + h)
      def merge(a: B, b: B): B = cap(a ++ b)
      def finish(b: B): Seq[Long] = b.toSeq
      def bufferEncoder: Encoder[B] = org.apache.spark.sql.Encoders.kryo[B]
      // expression encoder so the agg output is a real ARRAY<BIGINT>
      // column the estimator expressions can address
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** KMV distinct-SHINGLE estimates per language plus a merged `(all)`
    * rollup row, each next to the exact distinct count. Shingles (word
    * 3-grams, [[DedupOps.shingles]]) rather than tokens because that is
    * the cardinality a corpus pipeline actually cannot afford to GROUP
    * BY — vocabularies are bounded, shingle spaces are not. The
    * per-group sketch is the k smallest 60-bit shingle hashes (md5 hex
    * prefix — 15 nibbles); the estimator is the classic (k−1)/θ with
    * θ = kth/2^60, emitted as `round((k−1)·(2^60−1)/kth)` — one
    * double division both engines evaluate identically. Groups with
    * fewer than k distinct tokens report their exact cardinality (the
    * sketch IS the value set there).
    *
    * The rollup is the mergeability law made visible: the `(all)` row
    * is computed from the UNION of the per-language sketches — k
    * smallest of the union of per-group k-minima ≡ k smallest overall
    * (any global top-k minimum is a minimum within its own group) —
    * never from a second corpus scan. */
  def kmvDistinct(documents: DataFrame, k: Int = 256): DataFrame = {
    require(k >= 2, "kmvDistinct: need k >= 2")
    val spark = documents.sparkSession
    import spark.implicits._
    // distinct (lang, shingle) FIRST — one columnar exchange shrinks
    // the stream to distinct grams before the typed aggregator (whose
    // per-row SortedSet rebuild priced the raw-stream form at ~16 s
    // vs ~3 s here); h is a function of w, so these rows double as
    // the exact-count frame below
    val dist = DedupOps.shingleRows(documents)
      .join(documents.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("lang"), col("shingle").as("w")).distinct()
      .withColumn("h",
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"))
    val agg = kmvAggregator(k).toColumn
    // one pass for the sketches (bounded state per group) ...
    val perLang = dist.select(col("lang"), col("h")).as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2).agg(agg)
      .toDF("grp", "minima")
    // ... and the (all) rollup from the SKETCHES, not the corpus
    val rollup = perLang.select(lit("(all)").as("grp"),
        explode(col("minima")).as("h")).as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2).agg(agg)
      .toDF("grp", "minima")
    // exact distincts to audit against (the expensive truth the sketch
    // replaces at scale) — `dist` rows ARE distinct (lang, w), so the
    // per-lang truth is a plain count over them
    val exact = dist.groupBy(col("lang").as("grp"))
      .agg(count(lit(1)).as("exact_distinct"))
    val exactAll = dist.select(col("w")).distinct()
      .agg(count(lit(1)).as("exact_distinct"))
      .select(lit("(all)").as("grp"), col("exact_distinct"))
    val maxH = math.pow(2.0, 60) - 1
    perLang.unionAll(rollup)
      .select(col("grp"),
        try_element_at(col("minima"), lit(k)).as("kth"))
      .join(exact.unionAll(exactAll), "grp")
      .select(col("grp"), col("exact_distinct"),
        when(col("kth").isNull, col("exact_distinct"))
          .otherwise(round(lit((k - 1).toDouble) * lit(maxH) /
            col("kth").cast("double")).cast("bigint"))
          .as("kmv_est"))
      .orderBy("grp")
  }
}
