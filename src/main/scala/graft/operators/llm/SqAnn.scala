package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization for embedding search — the 4×-memory
  * compression step (float32 → uint8 per dimension) used when a corpus'
  * embedding table must fit executor memory or a serving index. PQ
  * (PqAnn) compresses harder via codebooks; SQ8 is the cheap linear
  * variant with no training beyond per-dimension min/max, and unlike PQ
  * its search is fully deterministic arithmetic — so the WHOLE pipeline
  * (calibrate → quantize → dequantize → score → rank) is replayable by
  * the SQL oracle, not just twin-checked.
  *
  * Quantization: q_i = clamp(floor((x_i - min_i)/scale_i + 0.5), 0, 255)
  * with scale_i = (max_i - min_i)/255 from a corpus calibration pass;
  * constant dimensions (max=min) quantize to 0 and dequantize back to
  * the constant. `floor(r + 0.5)` rather than `round(r)` so Spark and
  * any replaying engine agree on ties regardless of their rounding
  * mode. Search scores symmetric SQ: both query and corpus vectors are
  * dequantized (q_i·scale_i + min_i) and ranked by exact cosine over
  * the dequantized doubles (the fused CosineSim kernel), rounded to
  * 4 dp with vec_id tie-break, identical shape to
  * `Similarity.bruteForceTopK`.
  *
  * Shape at 100 TB: calibration is one map-side-combined hash
  * aggregate keyed on dimension index (64 groups); the per-dim
  * min/scale arrays are a 1-row broadcast frame (the same pattern as
  * the corpus-stats frames — never a driver collect). Quantize and
  * dequantize are narrow per-row expressions. The scoring stage here
  * is brute force over the compressed representation (SQ's baseline
  * deployment); composing it under the IVF cell-probe from
  * `Similarity.ivfTopK` is the same candidate-join swap the PQ
  * operator demonstrates.
  */
object SqAnn {

  /** Per-dimension (min, max) calibration + round-trip dequantized
    * vectors for the whole corpus: (vec_id, demb). */
  private def dequantized(embeddings: DataFrame, dim: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))
    val byDim = e.select(posexplode(col("emb")).as(Seq("i", "x")))
      .groupBy("i").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val calib = broadcast(byDim
      .agg(array_sort(collect_list(struct(col("i"), col("mn")))).as("mns"),
        array_sort(collect_list(struct(col("i"), col("mx")))).as("mxs"))
      .select(transform(col("mns"), s => s.getField("mn")).as("mn"),
        transform(col("mxs"), s => s.getField("mx")).as("mx")))
    val demb = transform(sequence(lit(0), lit(dim - 1)), i => {
      val mn = element_at(col("mn"), i + 1)
      val mx = element_at(col("mx"), i + 1)
      val sc = (mx - mn) / lit(255.0)
      val q = when(mx === mn, lit(0.0)).otherwise(
        least(lit(255.0), greatest(lit(0.0),
          floor((element_at(col("emb"), i + 1) - mn) / sc + lit(0.5)))))
      q * sc + mn
    })
    e.crossJoin(calib).select(col("vec_id"), demb.as("demb"))
  }

  /** SQ8 cosine top-k, same output contract as bruteForceTopK:
    * (query_id, neighbor_id, rank, cos_sim). */
  def sq8TopK(embeddings: DataFrame, queryIds: Seq[Long],
              k: Int = 10, dim: Int = 64): DataFrame = {
    val deq = dequantized(embeddings, dim)
    val queries = broadcast(deq.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("demb").as("q_emb")))
    rankCandidates(deq.crossJoin(queries), k)
  }

  /** IVF × SQ8 — the compression-under-probe composition the PQ
    * operator demonstrates, with SQ8 as the cheap rung: k-means cells
    * bound the candidate set (probe `nProbe` cells per query), and
    * only candidates are scored over the dequantized representation.
    * With `nProbe >= nCentroids` every cell is probed, so the result
    * IS `sq8TopK` bit-for-bit — which gives the composition a real
    * SQL oracle (same replay as `llm_ann_sq8`); the probed form's
    * recall is spec-pinned against the full scan. */
  def ivfSq8TopK(embeddings: DataFrame, queryIds: Seq[Long],
                 k: Int = 10, nCentroids: Int = 16, nProbe: Int = 4,
                 dim: Int = 64): DataFrame = {
    val deq = dequantized(embeddings, dim)
    val centroids = broadcast(
      Similarity.kmeansCentroids(embeddings, nCentroids))
    val cells = Similarity.assignCells(embeddings, centroids)
      .select(col("vec_id"), col("cell"))
    val corpus = deq.join(cells, "vec_id")
    // probe ranking is over the ORIGINAL float vectors (index-build
    // side), like IVF-PQ; ties break by centroid_id
    val probes = embeddings.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q0"))
      .crossJoin(centroids)
      .withColumn("c_sim", Similarity.cosine(col("q0"), col("c_emb")))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("c_sim").desc, col("centroid_id"))))
      .filter(col("c_rank") <= nProbe)
      .select(col("query_id"), col("centroid_id").as("cell"))
    val queries = broadcast(deq.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("demb").as("q_emb")))
    val cands = corpus.join(broadcast(probes), "cell")
      .join(queries, "query_id")
    rankCandidates(cands, k)
  }

  private def rankCandidates(cands: DataFrame, k: Int): DataFrame =
    cands
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim",
        round(Similarity.cosine(col("q_emb"), col("demb")), 4))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("int").as("rank"), col("cos_sim"))
      .orderBy("query_id", "rank")
}
