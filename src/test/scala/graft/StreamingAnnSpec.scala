package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.llm.Similarity
import graft.streaming.StreamingAnn

case class QueryVec(query_id: Long, q_emb: Array[Float])

/** Streaming IVF probe == batch ivfTopK after the sink-side k-merge. */
class StreamingAnnSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streamed per-cell top-k merges to the batch IVF result") {
    val emb = Tables.embeddings(spark, sf0001)
    val queryIds = Seq(3L, 17L, 42L)
    val k = 10

    val batch = Similarity.ivfTopK(emb, queryIds, k)

    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .as[QueryVec].collect().toSeq
    val ms = MemoryStream[QueryVec]
    val q = StreamingAnn.probe(ms.toDF(),
        StreamingAnn.centroidArray(emb), StreamingAnn.cellIndex(emb), k)
      .writeStream.format("memory").queryName("ann_probe_out")
      .outputMode("append").start()
    ms.addData(queries: _*)
    q.processAllAvailable()
    q.stop()

    // sink-side k-merge: global top-k across the probed cells
    val merged = spark.table("ann_probe_out")
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("int").as("rank"), col("cos_sim"))
    assertSameRows(merged, batch)
  }

  test("probe emits at most nProbe * (k+1) rows per query") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") === 7L)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .as[QueryVec].collect().toSeq
    val ms = MemoryStream[QueryVec]
    val q = StreamingAnn.probe(ms.toDF(),
        StreamingAnn.centroidArray(emb), StreamingAnn.cellIndex(emb),
        k = 5, nProbe = 3)
      .writeStream.format("memory").queryName("ann_bound_out")
      .outputMode("append").start()
    ms.addData(queries: _*)
    q.processAllAvailable()
    q.stop()
    val n = spark.table("ann_bound_out").count()
    assert(n > 0 && n <= 3 * 6, s"emitted $n rows")
  }
}
