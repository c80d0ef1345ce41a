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

  test("text kernels are SQL-callable and match their Column twins") {
    org.apache.spark.sql.graftbridge.Bridge.installFunctions(
      new GraftExtensions(), spark)
    Seq((1L, "spark shuffles the hash join build side"),
        (2L, "实时数据仓库"))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT doc_id, minhash_sig(text) AS sig, minhash_sig(text, 64) AS sig2,
        |       gram_hash_set(text) AS gs, gram_hash_set(text, 2) AS gs2,
        |       simhash_fp(text) AS fp, winnow_minima(text) AS wm,
        |       winnow_minima(text, 8, 8) AS wm2
        |FROM ext_docs ORDER BY doc_id""".stripMargin).collect()
    val twins = spark.table("ext_docs").select(col("doc_id"),
        graft.functions.TextExprs.minhash_sig(col("text")).as("sig"),
        graft.functions.TextExprs.gram_hash_set(col("text")).as("gs"),
        graft.functions.TextExprs.gram_hash_set(col("text"), 2).as("gs2"),
        graft.functions.TextExprs.simhash_fp(col("text")).as("fp"),
        graft.functions.TextExprs.winnow_minima(col("text")).as("wm"))
      .orderBy("doc_id").collect()
    sql.zip(twins).foreach { case (s, t) =>
      assert(s.getSeq[Long](1) == t.getSeq[Long](1))   // sig == twin
      assert(s.getSeq[Long](1) == s.getSeq[Long](2))   // default == explicit
      assert(s.getSeq[Long](3) == t.getSeq[Long](2))   // gram set
      assert(s.getSeq[Long](4) == t.getSeq[Long](3))   // gram set n=2
      assert(s.getLong(5) == t.getLong(4))             // simhash
      assert(s.getSeq[Long](6) == t.getSeq[Long](5))   // winnow
      assert(s.getSeq[Long](6) == s.getSeq[Long](7))
    }
    // static params must be literals — a column there is a clear error
    val e = intercept[Exception](
      spark.sql("SELECT gram_hash_set(text, doc_id) FROM ext_docs").collect())
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("nfc_normalize is SQL-callable, codegen'd, and composes NFC") {
    org.apache.spark.sql.graftbridge.Bridge.installFunctions(
      new GraftExtensions(), spark)
    // decomposed e+COMBINING ACUTE, ANGSTROM SIGN, OHM SIGN, plain
    // ASCII — NOTE Spark SQL's char(n) is ASCII-mod-256, not a code
    // point (unlike DuckDB's chr), so the literals use \u escapes
    val rows = spark.sql(
      "SELECT nfc_normalize('caf" + "e\u0301" + "') AS a, " +
        "nfc_normalize('" + "\u212B" + "') AS b, nfc_normalize('" + "\u2126" + "') AS c, " +
        "nfc_normalize('plain ascii stays') AS d, " +
        "nfc_normalize(CAST(NULL AS STRING)) AS n").collect().head
    assert(rows.getString(0) == "caf\u00E9")
    assert(rows.getString(1) == "\u00C5")
    assert(rows.getString(2) == "\u03A9")
    assert(rows.getString(3) == "plain ascii stays")
    assert(rows.isNullAt(4))
  }

  test("jaro_winkler: textbook values, DuckDB convention, SQL + codegen") {
    org.apache.spark.sql.graftbridge.Bridge.installFunctions(
      new GraftExtensions(), spark)
    import graft.functions.JaroWinkler.jw
    // the classic Winkler pairs (integer-halved transpositions)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(jw("", "") == 1.0 && jw("a", "") == 0.0 && jw("", "a") == 0.0)
    assert(jw("same", "same") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    // the integer-halving convention: "abcde" vs "abced" matches all 5
    // chars with 2 mismatched positions -> t = 2/2 = 1, prefix l = 3
    val j = (5.0 / 5 + 5.0 / 5 + (5.0 - 1) / 5) / 3
    assert(math.abs(jw("abcde", "abced") - (j + 3 * 0.1 * (1 - j))) < 1e-12)
    // SQL registration + null propagation + codegen path
    val r = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS a, " +
        "jaro_winkler(CAST(NULL AS STRING), 'x') AS n").collect().head
    assert(math.abs(r.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(r.isNullAt(1))
    // whole-stage codegen must hold (doGenCode, no fallback boxing)
    val df = core.Tables.part(spark, sf0001).select(
      graft.functions.TextExprs.jaro_winkler(col("p_name"), col("p_brand")))
    // the starred project is the whole-stage-codegen marker — a
    // CodegenFallback expression would print an unstarred Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
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
