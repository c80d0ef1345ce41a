package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorExprs
import graft.operators.llm.Similarity

/** Native CosineSim expression: bit-for-bit parity with the
  * higher-order-function form, on both float and double arrays. */
class VectorExprsSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine_sim == HOF cosine bit-for-bit on the embeddings table") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        VectorExprs.cosine_sim(col("embedding"), col("q_emb")).as("native"),
        Similarity.cosineHof(col("embedding"), col("q_emb")).as("hof"))
    val mismatches = both.filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("cosine_sim handles double arrays and nulls") {
    val df = Seq(
      (Some(Seq(1.0, 0.0)), Some(Seq(0.0, 2.0))),
      (Some(Seq(1.0, 1.0)), Some(Seq(1.0, 1.0))),
      (None, Some(Seq(1.0, 1.0))))
      .toDF("a", "b")
    val r = df.select(VectorExprs.cosine_sim(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 0.0)
    assert(math.abs(r(1).getDouble(0) - 1.0) < 1e-12)
    assert(r(2).isNullAt(0))
  }

  test("cosine_sim: a null ELEMENT yields NULL, matching the HOF form") {
    val df = Seq(
      (Seq(Some(1.0), None), Seq(Some(1.0), Some(1.0))),
      (Seq(Some(1.0), Some(2.0)), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
    val r = df.select(
      VectorExprs.cosine_sim(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1)) // both NULL
    assert(!r(1).isNullAt(0) && r(1).getDouble(0) == r(1).getDouble(1))
  }

  test("cosine_sim: zero-norm and length-mismatch yield NULL, never NaN") {
    // Under ANSI (Spark 4 default) the HOF form THROWS on a zero
    // divisor; the native expression instead defines cosine of a
    // zero-norm vector as NULL — NaN must never escape, since NaN
    // outranks every real similarity in a descending top-k.
    val df = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),      // zero-norm left
      (Seq(1.0, 2.0), Seq(0.0, 0.0)),      // zero-norm right
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)), // length mismatch
      (Seq(1.0, 2.0), Seq(1.0, 2.0)))      // control
      .toDF("a", "b")
    val r = df.select(
      VectorExprs.cosine_sim(col("a"), col("b")).as("native")).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).isNullAt(0))
    assert(r(2).isNullAt(0))
    assert(math.abs(r(3).getDouble(0) - 1.0) < 1e-12)
    // length mismatch parity vs HOF (null-pad → NULL even under ANSI)
    val hof = df.limit(3).filter(size(col("a")) =!= size(col("b")))
      .select(Similarity.cosineHof(col("a"), col("b"))).collect()
    assert(hof.forall(_.isNullAt(0)))
  }

  test("cosine_sim participates in whole-stage codegen") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val df = emb.crossJoin(broadcast(q))
      .select(VectorExprs.cosine_sim(col("embedding"), col("q_emb")).as("s"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }
}
