package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search") — the memory side of the
  * billion-vector posture that IVF alone doesn't give: each vector is
  * compressed to `m` small codes (one per subspace), so the searchable
  * corpus shrinks from D floats to m bytes per vector (64-dim float64
  * → 8 codes ≈ 64× less state), and query scoring becomes `m` table
  * lookups per candidate via the ADC trick (per-query lookup table of
  * sub-dot-products against every code centroid).
  *
  * Shape at 100 TB: the codebook train is the only iterative stage and
  * its driver state is m×codes×subDim doubles (bounded by contract,
  * like `kmeansCentroids`); encode is one broadcast pass; a query
  * scores candidates entirely from the codes column — the
  * full-precision embedding column is touched only by the final exact
  * rerank of a `shortlist`-bounded candidate set. All scoring is
  * array-HOF expression code (whole-stage codegen), no UDFs.
  *
  * Scoring operates on L2-NORMALIZED vectors, so the ADC sum of
  * sub-dot-products estimates cosine directly and the exact rerank is
  * plain `cosine`. Determinism mirrors the rest of the ANN family:
  * hash-sampled k-means init, fixed iteration count, every ordering
  * tie-broken by id.
  */
object PqAnn {

  /** L2-normalized doubles, vector form (unlike `l2Normalized`'s
    * exploded oracle shape). */
  private def normalized(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("l2", Similarity.norm(col("embedding")))
      .select(col("vec_id"),
        transform(col("embedding"), x =>
          when(col("l2") === 0.0, 0.0).otherwise(x.cast("double") / col("l2")))
          .as("emb"))

  /** (vec_id, sub, sub_emb) — every vector exploded into its `m`
    * subvectors. */
  private def subVectors(normed: DataFrame, m: Int, subDim: Int): DataFrame =
    normed.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("emb"))
      .select(col("vec_id"), col("sub"),
        slice(col("emb"), col("sub") * subDim + 1, lit(subDim)).as("sub_emb"))

  private def l2dist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Per-subspace codebooks: k-means over each subspace's subvectors,
    * all `m` subspaces trained in the SAME distributed rounds (the sub
    * index is just another grouping key). Init = `codes` hash-sampled
    * vectors per subspace (unbiased, deterministic); `iters` Lloyd
    * rounds; centroids collected per round — driver state is
    * m×codes×subDim doubles by contract. Returns (sub, code_id,
    * c_emb). */
  def pqCodebooks(embeddings: DataFrame, m: Int = 8, codes: Int = 16,
                  iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    val dim = 64 // documents/embeddings fixture dim; validated below
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val subs = subVectors(normalized(embeddings), m, subDim)
    var books = subs
      .withColumn("h_rank", row_number().over(Window.partitionBy(col("sub"))
        .orderBy(xxhash64(col("vec_id")), col("vec_id"))))
      .filter(col("h_rank") <= codes)
      .select(col("sub"), (col("h_rank") - 1).as("code_id"),
        col("sub_emb").as("c_emb"))
    for (_ <- 1 to iters) {
      // argmin-by-aggregate (see assignCells): map-side combine, no
      // sorted window over |vecs|×m×codes rows
      val assigned = subs.join(broadcast(books), Seq("sub"))
        .withColumn("d", l2dist(col("sub_emb"), col("c_emb")))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("d"), col("code_id").as("cid"),
          col("sub_emb").as("se"))).as("m"))
        .select(col("sub"), col("m.cid").as("code_id"),
          posexplode(col("m.se")).as(Seq("pos", "x")))
      val next = assigned.groupBy(col("sub"), col("code_id"), col("pos"))
        .agg(round(avg(col("x")), 6).as("mv"))
        .groupBy(col("sub"), col("code_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          s => s.getField("mv")).as("c_emb"))
      // same lineage-cut contract as kmeansCentroids: bounded rows,
      // zero persisted executor state left behind
      books = spark.createDataFrame(
        spark.sparkContext.parallelize(next.collect().toIndexedSeq, 1),
        next.schema)
    }
    books
  }

  /** PQ-encode the corpus: (vec_id, codes array<int>, emb) — `codes`
    * is the m-byte compressed representation the search runs on. */
  def pqEncode(embeddings: DataFrame, books: DataFrame, m: Int = 8): DataFrame = {
    val subDim = 64 / m
    val normed = normalized(embeddings)
    val coded = subVectors(normed, m, subDim)
      .join(broadcast(books), Seq("sub"))
      .withColumn("d", l2dist(col("sub_emb"), col("c_emb")))
      // argmin-by-aggregate, then the per-vector code array — two hash
      // aggregates on (vec_id[, sub]), both map-side combined
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d"), col("code_id").as("cid"))).as("m"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("m.cid").as("code_id")))),
        s => s.getField("code_id").cast("int")).as("codes"))
    normed.join(coded, "vec_id")
  }

  /** ADC top-k: per-query lookup tables LUT[sub][code] = q_sub ·
    * c_emb, approximate score = Σ_sub LUT[sub][codes[sub]], shortlist
    * the top `shortlist` candidates by ADC score, exact-rerank the
    * shortlist with full-precision cosine. `shortlist >= |corpus|`
    * degenerates to exact brute force (the identity the oracle pins).
    * Output shape matches `bruteForceTopK`. */
  /** IVF × PQ — the composed billion-vector plan: probe the query's
    * `nProbe` nearest k-means cells (IVF bounds WHICH vectors are
    * scored), ADC-score only those cells' code rows (PQ bounds the
    * BYTES each score touches), exact-rerank the shortlist. With
    * `nProbe = nCentroids` and `shortlist >= |corpus|` this
    * degenerates to brute force exactly — the identity the spec pins;
    * recall at bounded budgets is measured in `tools/AnnSoak`. */
  def ivfPqTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10,
                nCentroids: Int = 16, nProbe: Int = 4, m: Int = 8,
                codes: Int = 16, shortlist: Int = 50,
                kmeansIters: Int = 2): DataFrame = {
    val subDim = 64 / m
    val centroids = broadcast(
      Similarity.kmeansCentroids(embeddings, nCentroids, kmeansIters))
    val cells = Similarity.assignCells(embeddings, centroids)
      .select(col("vec_id"), col("cell"))
    val books = pqCodebooks(embeddings, m, codes)
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
      .join(pqEncode(embeddings, books, m).select(col("vec_id"), col("codes")),
        "vec_id")
      .join(cells, "vec_id")
    val queries = embeddings
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val probes = queries.crossJoin(centroids)
      .withColumn("c_sim", Similarity.cosine(col("q_emb"), col("c_emb")))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("c_sim").desc, col("centroid_id"))))
      .filter(col("c_rank") <= nProbe)
      .select(col("query_id"), col("centroid_id").as("cell"))
    val luts = subVectors(
        normalized(embeddings).filter(col("vec_id").isin(queryIds: _*)),
        m, subDim)
      .join(broadcast(books), Seq("sub"))
      .withColumn("lv", aggregate(zip_with(col("sub_emb"), col("c_emb"),
        (x, y) => x * y), lit(0.0), (acc, v) => acc + v))
      .groupBy(col("vec_id"), col("sub"))
      .agg(transform(array_sort(collect_list(struct(col("code_id"), col("lv")))),
        s => s.getField("lv")).as("lut"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("lut")))),
        s => s.getField("lut")).as("luts"))
      .select(col("vec_id").as("query_id"), col("luts"))
    val scored = corpus
      .join(broadcast(probes.join(queries, "query_id").join(luts, "query_id")),
        Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_sim", aggregate(
        zip_with(col("codes"), col("luts"),
          (c, lut) => element_at(lut, c + 1)),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("adc_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc_sim").desc, col("vec_id"))))
      .filter(col("adc_rank") <= shortlist)
    scored
      .withColumn("cos_sim",
        round(Similarity.cosine(col("q_emb"), col("embedding")), 4))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("int").as("rank"), col("cos_sim"))
      .orderBy("query_id", "rank")
  }

  def pqTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10,
             m: Int = 8, codes: Int = 16, shortlist: Int = 50,
             iters: Int = 2): DataFrame = {
    val subDim = 64 / m
    val books = pqCodebooks(embeddings, m, codes, iters)
    // the searchable corpus: m-code column + the RAW embedding (only
    // the final rerank touches the latter; ADC runs on codes alone)
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
      .join(pqEncode(embeddings, books, m).select(col("vec_id"), col("codes")),
        "vec_id")
    // raw query vectors — the rerank must score EXACTLY like
    // bruteForceTopK (same expression on the same float columns), so
    // the shortlist>=corpus identity is bit-for-bit
    val queries = embeddings
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    // per-query LUT: group (sub, code) dot-products twice into
    // array[sub][code] — inner array ordered by code_id, outer by sub
    val luts = subVectors(
        normalized(embeddings).filter(col("vec_id").isin(queryIds: _*)),
        m, subDim)
      .join(broadcast(books), Seq("sub"))
      .withColumn("lv", aggregate(zip_with(col("sub_emb"), col("c_emb"),
        (x, y) => x * y), lit(0.0), (acc, v) => acc + v))
      .groupBy(col("vec_id"), col("sub"))
      .agg(transform(array_sort(collect_list(struct(col("code_id"), col("lv")))),
        s => s.getField("lv")).as("lut"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("lut")))),
        s => s.getField("lut")).as("luts"))
      .select(col("vec_id").as("query_id"), col("luts"))
    val scored = corpus.crossJoin(broadcast(queries.join(luts, "query_id")))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_sim", aggregate(
        zip_with(col("codes"), col("luts"),
          (c, lut) => element_at(lut, c + 1)),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("adc_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc_sim").desc, col("vec_id"))))
      .filter(col("adc_rank") <= shortlist)
    scored
      .withColumn("cos_sim",
        round(Similarity.cosine(col("q_emb"), col("embedding")), 4))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("int").as("rank"), col("cos_sim"))
      .orderBy("query_id", "rank")
  }
}
