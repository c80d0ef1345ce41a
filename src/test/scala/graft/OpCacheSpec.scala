package graft

/** The pooled-cache slot's interaction with Spark's CacheManager
  * dedupe: re-building a deterministic operator over the same input
  * re-registers the SAME canonical cache entry, so the slot swap must
  * NOT unpersist the "previous" frame then (it would kill the entry
  * the new frame just joined, and the shared subtree would silently
  * re-derive — the exact order-dependent failure the full suite hit
  * when PlanSpec ran after suites that had already invoked these
  * operators). Different-plan swaps must still release. */
class OpCacheSpec extends SparkTestBase {

  private def cacheReads(p: String): Int =
    p.linesIterator.count(l => l.contains("InMemoryTableScan") ||
      l.contains("TableCacheQueryStage"))

  test("re-invoking a pooled-cache operator keeps the shared subtree " +
      "cached — a plan-identical slot swap must not kill the entry") {
    val orders = graft.core.Tables.orders(spark, sf0001)
    def planOf(): String = graft.operators.dws.Survival
      .kaplanMeierRepurchase(orders)
      .queryExecution.executedPlan.toString
    planOf() // first registration takes the slot
    val second = planOf() // plan-identical re-registration
    assert(cacheReads(second) >= 2,
      s"shared frame re-derived on re-invocation:\n$second")
  }

  test("a different-plan slot swap releases the previous cache entry") {
    import org.apache.spark.sql.functions.lit
    val spark0 = spark
    import spark0.implicits._
    val a = graft.core.OpCache.shared("opcache-spec",
      Seq(1, 2, 3).toDF("x"))
    assert(a.storageLevel.useMemory)
    val b = graft.core.OpCache.shared("opcache-spec",
      Seq(1, 2, 3).toDF("x").withColumn("y", lit(1)))
    assert(b.storageLevel.useMemory)
    assert(!a.storageLevel.useMemory,
      "previous slot holder kept its cache entry after a " +
        "different-plan swap")
    graft.core.OpCache.releaseAll()
  }
}
