package graft

/** Every SparkEntry query runs on sf0.001 and returns rows; spot checks
  * pin a few known aggregates (values derived from the seed-42 data). */
class BatchQueriesSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only entries must be a deliberate, documented set
    val allowed = Set("llm_dedup_minhash", "llm_dedup_simhash",
      "llm_dedup_ngram_jaccard", "llm_ann_lsh", "llm_ann_ivf")
    assert(noOracle.subsetOf(allowed), s"queries missing oracle: $noOracle")
  }

  test("a10 daily uv: users are bounded by distinct user count") {
    import org.apache.spark.sql.functions._
    val uv = SparkEntry.queries("a10_daily_unique_visitors")(spark, sf0001)
    val maxUv = uv.agg(max(col("uv_ct"))).collect()(0).getLong(0)
    assert(maxUv <= 15) // sf0.001 has 15 distinct users
  }

  test("j2 left join keeps all lineitem rows") {
    val li = core.Tables.lineitem(spark, sf0001).count()
    val j2 = SparkEntry.queries("j2_left_outer_activity")(spark, sf0001).count()
    assert(j2 == li)
  }
}
