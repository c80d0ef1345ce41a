package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Ev, StatefulStreams}

/** SQL registration of the native expressions + A10 streaming dedup. */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("GraftExtensions registers cosine_sim and mix64 for SQL") {
    // apply the extension to this session's registry — the same
    // injection the builder performs with .withExtensions
    org.apache.spark.sql.graftbridge.Bridge.installFunctions(
      new GraftExtensions(), spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "mix64(42L, 7L) AS m, " +
        "mix64(42L, 7) AS m_int").collect()(0) // plain Int literal spelling
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) == graft.functions.Mix64Impl.fmix(42L, 7L))
    assert(r.getLong(2) == r.getLong(1))
    // wrong arity → a clear error, not IndexOutOfBounds
    val e = intercept[Exception](spark.sql("SELECT mix64(1L)").collect())
    assert(e.getMessage.contains("2 arguments") ||
      e.getMessage.toLowerCase.contains("expects"))
  }

  test("FuseCosine rewrites the HOF cosine tree to CosineSim when enabled") {
    import graft.operators.llm.Similarity
    // parquet-backed (a local Seq relation constant-folds at optimize
    // time and the rule never sees the expression)
    val df = core.Tables.embeddings(spark, sf0001)
      .select(transform(col("embedding"), x => x.cast("double")).as("a"),
        reverse(transform(col("embedding"), x => x.cast("double"))).as("b"))
    val hof = df.select(Similarity.cosineHof(col("a"), col("b")).as("c"))
    if (!spark.experimental.extraOptimizations.contains(graft.plans.FuseCosine))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.FuseCosine
    // default off: the optimized plan keeps the interpreted aggregate
    assert(hof.queryExecution.optimizedPlan.toString.contains("aggregate("))
    spark.conf.set("spark.graft.fuseCosine.enabled", "true")
    try {
      val fused = df.select(Similarity.cosineHof(col("a"), col("b")).as("c"))
      val opt = fused.queryExecution.optimizedPlan.toString
      assert(opt.contains("cosinesim"), opt)
      assert(!opt.contains("aggregate("), opt)
      // same answers on non-degenerate vectors, bit for bit
      val expect = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
        .collect().map(_.getDouble(0))
      assert(fused.collect().map(_.getDouble(0)).sameElements(expect))
    } finally spark.conf.unset("spark.graft.fuseCosine.enabled")
  }

  test("A10 streaming dedup == batch daily-first semantics") {
    val evs = Seq(
      Ev(1, tsOf("2024-01-01T01:00:00Z"), 1, "view", 1.0),
      Ev(2, tsOf("2024-01-01T02:00:00Z"), 1, "view", 1.0), // same day dup
      Ev(3, tsOf("2024-01-02T01:00:00Z"), 1, "view", 1.0),
      Ev(4, tsOf("2024-01-01T03:00:00Z"), 2, "view", 1.0))
    val ms = MemoryStream[Ev]
    val q = StatefulStreams.dailyUvStream(ms.toDF()).writeStream
      .format("memory").queryName("uv_out").outputMode("append").start()
    ms.addData(evs: _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("uv_out").select("user_id", "cur_date").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "2024-01-01"), (1L, "2024-01-02"), (2L, "2024-01-01")))
  }
}
