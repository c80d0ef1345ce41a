package graft

import graft.core.Tables
import graft.plans.RecursiveCte

/** Native `WITH RECURSIVE` (Spark 4 UnionLoop) against its
  * non-recursive twin — the Spark half of the three-way differential
  * (the DuckDB half replays the IDENTICAL text as the
  * `cte_month_spine_gapfill` oracle). */
class RecursiveCteSpec extends SparkTestBase {

  test("native recursive month spine == range-built twin, gaps kept") {
    val orders = Tables.orders(spark, sf0001)
    val nativeDf = RecursiveCte.monthSpineGapfill(orders)
    assert(rowsOf(nativeDf) == rowsOf(RecursiveCte.monthSpineGapfillTwin(orders)))
    // the spine is the full 1995–2001 calendar: 84 rows, no month
    // collapsed away, and the data's post-coverage tail surfaces as
    // explicit zero-order gap rows (the gap-fill contract)
    val native = nativeDf.collect().toSeq
    assert(native.size == 84)
    val gaps = native.filter(_.getLong(3) == 0L)
    assert(gaps.nonEmpty && gaps.forall(_.isNullAt(4)))
  }

  test("recursion depth stays under the engine's level limit") {
    // spark.sql.cteRecursionLevelLimit (default 100) ERRORS on
    // overflow rather than truncating — the spine's 84 levels and the
    // fuzz space's worst case (chain seeds <= 60) must clear it, or a
    // conf change in Sessions would break queries at runtime
    val limit = spark.conf.get("spark.sql.cteRecursionLevelLimit").toInt
    assert(limit > 84, s"cteRecursionLevelLimit=$limit too low for the spine")
  }
}
