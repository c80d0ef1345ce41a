package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native `WITH RECURSIVE` execution — Spark 4's UnionLoop operator
  * driven through `spark.sql` with the SAME text the DuckDB oracle
  * replays, so the differential covers the loop executor itself, not
  * just a re-derivation of its semantics. (The graph operators keep
  * their materialized-round `Scratch` loops: Spark rejects
  * UNION-distinct recursion — UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE —
  * so frontier dedup, the thing that keeps BFS/SSSP row counts
  * bounded on a dense graph, is not expressible as a recursive CTE
  * yet. A calendar spine recursion is the shape that IS safe: depth
  * is a constant 84 — under the default
  * spark.sql.cteRecursionLevelLimit of 100, which ERRORS rather than
  * truncates — and each step is one row.)
  *
  * Reference pattern: the gmall DWS jobs surface per-window rollups
  * whose BI consumers expect gapless time axes
  * (`dws/DwsTradeSkuOrderWindow.java:sum` analog); the spine join is
  * the standard gap-fill.
  *
  * 100 TB posture: the spine side is 84 rows — Catalyst broadcasts
  * it — and the fact side is one partial→final aggregate over
  * orders, so the whole query is one exchange plus a broadcast join;
  * the recursion never touches the fact table. */
object RecursiveCte {

  /** Monthly order rollup on a RECURSIVELY GENERATED 1995–2001 month
    * spine: months with no orders survive as explicit rows with
    * `n_orders = 0` and NULL `total_r` (the gap-fill contract).
    * Integer-only spine arithmetic; the one division is exact
    * (`idx - idx % 12` is a multiple of 12). Shared verbatim with the
    * DuckDB oracle. */
  val monthSpineGapfillSql: String =
    """WITH RECURSIVE m(idx) AS (
      |  SELECT 0 UNION ALL SELECT idx + 1 FROM m WHERE idx < 83),
      |mm AS (
      |  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS idx,
      |         count(*) AS n_orders,
      |         round(sum(round(o_totalprice, 2)), 2) AS total_r
      |  FROM orders GROUP BY 1)
      |SELECT m.idx, CAST(1995 + (m.idx - m.idx % 12) / 12 AS INT) AS y,
      |       m.idx % 12 + 1 AS mo,
      |       coalesce(mm.n_orders, CAST(0 AS BIGINT)) AS n_orders, mm.total_r
      |FROM m LEFT JOIN mm ON mm.idx = m.idx
      |ORDER BY m.idx""".stripMargin

  /** Runs [[monthSpineGapfillSql]] natively: registers `orders` as a
    * temp view (the text's one table reference) and hands the
    * recursion to the engine. */
  def monthSpineGapfill(orders: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("orders")
    orders.sparkSession.sql(monthSpineGapfillSql)
  }

  /** Non-recursive twin for the spec: the identical rollup on a
    * `range`-built spine. Native recursion ≡ this ≡ DuckDB closes the
    * three-way differential. */
  private[graft] def monthSpineGapfillTwin(orders: DataFrame): DataFrame = {
    val spine = orders.sparkSession.range(0L, 84L)
      .select(col("id").cast("int").as("idx"))
    val mm = orders
      .groupBy(((year(col("o_orderdate")) - 1995) * 12 +
        month(col("o_orderdate")) - 1).as("idx"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(round(col("o_totalprice"), 2)), 2).as("total_r"))
    spine.join(mm, Seq("idx"), "left")
      .select(col("idx"),
        (lit(1995) + (col("idx") - col("idx") % 12) / 12).cast("int").as("y"),
        (col("idx") % 12 + 1).as("mo"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("total_r"))
      .orderBy("idx")
  }
}
