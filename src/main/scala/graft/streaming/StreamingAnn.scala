package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.llm.Similarity

/** Streaming approximate-nearest-neighbor retrieval: a stream of query
  * embeddings probes a batch-built IVF index (stream-static joins, no
  * streaming state at all).
  *
  * Spark streams cannot use window functions or unwatermarked
  * aggregates, so the per-query top-k is done entirely inside array
  * expressions: the candidate list of each probed cell arrives as one
  * array column, is scored with the native `CosineSim` expression,
  * sorted by struct order ((-sim, vec_id) ascending = sim descending
  * with id tie-break) and sliced to k — one row in, k rows out,
  * completely stateless. The stream emits the union of per-cell top-k
  * sets; because every vector lives in exactly one cell, that union
  * contains the global top-k, and the final k-merge across probed
  * cells is a bounded sink-side/batch step (proved equal to the batch
  * `ivfTopK` in `StreamingAnnSpec`).
  */
object StreamingAnn {

  /** All centroids as ONE array row — the stream cross-joins this
    * 1-row frame so probe-cell selection is a per-row array expression
    * rather than a (stateful) per-query ranking. Pass a precomputed
    * `centroids` frame to share one k-means run with `cellIndex`
    * (both defaults recompute it; the rounded means make the two runs
    * identical, but the clustering is the expensive part of the
    * build). */
  def centroidArray(embeddings: DataFrame, nCentroids: Int = 16,
                    kmeansIters: Int = 2,
                    centroids: Option[DataFrame] = None): DataFrame =
    centroids.getOrElse(
        Similarity.kmeansCentroids(embeddings, nCentroids, kmeansIters))
      .agg(collect_list(struct(col("centroid_id"), col("c_emb"))).as("cents"))

  /** Inverted file: cell → array of (vec_id, embedding) members. At
    * 100 TB keep cells as bucketed parquet instead of broadcast and
    * the probe becomes a shuffle-on-cell join; the expression-level
    * top-k is unchanged. */
  def cellIndex(embeddings: DataFrame, nCentroids: Int = 16,
                kmeansIters: Int = 2,
                centroids: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(
      Similarity.kmeansCentroids(embeddings, nCentroids, kmeansIters))
    Similarity.assignCells(embeddings, cents)
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("cands"))
  }

  /** Stateless streaming probe. Input stream: (query_id, q_emb).
    * Emits per-cell top-k rows (query_id, cell, neighbor_id, cos_sim);
    * the ≤ nProbe·k rows per query are merged to the global top-k
    * downstream. Self-matches are excluded (k+1 candidates kept per
    * cell so the exclusion cannot starve a cell's contribution). */
  def probe(stream: DataFrame, centroidArr: DataFrame, cellIdx: DataFrame,
            k: Int = 10, nProbe: Int = 4): DataFrame =
    stream.crossJoin(broadcast(centroidArr))
      // nProbe nearest cells, ranked by unrounded cosine (struct sort:
      // (-sim, centroid_id) ascending == sim desc, id tie-break)
      .withColumn("probe_cells",
        slice(array_sort(transform(col("cents"), c =>
          struct((-Similarity.cosine(col("q_emb"), c.getField("c_emb")))
            .as("neg"), c.getField("centroid_id").as("cell")))),
          1, nProbe))
      .select(col("query_id"), col("q_emb"),
        explode(col("probe_cells.cell")).as("cell"))
      .join(broadcast(cellIdx), Seq("cell"))
      // per-cell top-(k+1) by rounded score, matching ivfTopK's ranking
      .withColumn("scored",
        slice(array_sort(transform(col("cands"), v =>
          struct((-round(Similarity.cosine(col("q_emb"),
            v.getField("embedding")), 4)).as("neg"),
            v.getField("vec_id").as("neighbor_id")))),
          1, k + 1))
      .select(col("query_id"), col("cell"), explode(col("scored")).as("s"))
      .filter(col("s.neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("cell"),
        col("s.neighbor_id").as("neighbor_id"),
        (-col("s.neg")).as("cos_sim"))
}
