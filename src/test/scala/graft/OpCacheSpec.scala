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

  test("distinct inputs under one tag coexist (no mutual eviction), " +
      "and the per-tag cap releases oldest-first") {
    import org.apache.spark.sql.functions.lit
    val spark0 = spark
    import spark0.implicits._
    // two interleaved pipelines over DIFFERENT inputs: each keeps its
    // own slot — tag-only keying used to evict a's entry here while
    // a lazy consumer still held the frame
    val a = graft.core.OpCache.shared("opcache-spec",
      Seq(1, 2, 3).toDF("x"))
    val b = graft.core.OpCache.shared("opcache-spec",
      Seq(1, 2, 3).toDF("x").withColumn("y", lit(1)))
    assert(a.storageLevel.useMemory && b.storageLevel.useMemory,
      "distinct-input slots must coexist under one tag")
    // cycling MORE distinct inputs through the tag stays bounded: the
    // oldest entries are released once the per-tag cap is exceeded
    val later = (10 to 12).map(i => graft.core.OpCache.shared(
      "opcache-spec", Seq(1, 2, 3).toDF("x").withColumn("y", lit(i))))
    assert(later.forall(_.storageLevel.useMemory))
    assert(!a.storageLevel.useMemory,
      "oldest slot survived past the per-tag cap")
    graft.core.OpCache.releaseAll()
    assert(later.forall(!_.storageLevel.useMemory),
      "releaseAll left a slot cached")
  }
}
