package graft.operators.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Referential-integrity audit across the star schema's FK edges —
  * the data-quality check that complements `Expectations` (column
  * contracts) and `Profile` (distributions): for every declared
  * child→parent edge, the non-null child row count, the NULL-FK
  * count, and the ORPHAN count (child keys with no parent row).
  *
  * Scale contract: each edge costs one map-side-combined null/total
  * aggregate over the child plus one anti-join against the DISTINCT
  * parent keys — the distinct collapses the build side to |keys|
  * before the join, so dimension-sized parents broadcast and even
  * fact-sized parents (orders under lineitem) exchange only the key
  * column. Nothing here is quadratic; every edge is independent, so
  * Spark schedules the eight audits concurrently in one action. */
object Integrity {

  /** (edge label, child table, child FK col, parent table, parent key). */
  private val edges: Seq[(String, String, String, String, String)] = Seq(
    ("lineitem.l_orderkey->orders.o_orderkey",
      "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey",
      "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey",
      "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer.c_custkey",
      "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey",
      "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation.n_nationkey",
      "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region.r_regionkey",
      "nation", "n_regionkey", "region", "r_regionkey"),
    ("embeddings.vec_id->documents.doc_id",
      "embeddings", "vec_id", "documents", "doc_id"))

  /** One row per FK edge: fk_edge, child_rows (non-null FK),
    * null_fks, orphan_ct. A healthy warehouse shows orphan_ct = 0 on
    * the relational edges; the embeddings→documents edge documents
    * whatever alignment the corpus actually has. */
  def audit(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.core.Tables
    val perEdge = edges.map { case (label, child, fk, parent, pk) =>
      val c = Tables.table(spark, sfDir, child)
      val p = Tables.table(spark, sfDir, parent)
        .select(col(pk).as("__pk")).distinct()
      val counts = c.agg(
        count(col(fk)).as("child_rows"),
        sum(when(col(fk).isNull, 1L).otherwise(0L)).as("null_fks"))
      val orphans = c.filter(col(fk).isNotNull)
        .join(p, col(fk) === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("orphan_ct"))
      counts.crossJoin(orphans)
        .select(lit(label).as("fk_edge"), col("child_rows"),
          col("null_fks"), col("orphan_ct"))
    }
    perEdge.reduce(_ unionByName _).orderBy("fk_edge")
  }

  /** The oracle twin as ANSI SQL (scalar subqueries per edge). */
  val auditSql: String = edges.map {
    case (label, child, fk, parent, pk) =>
      s"""SELECT '$label' AS fk_edge,
         |  (SELECT count($fk) FROM $child) AS child_rows,
         |  (SELECT count(*) FROM $child WHERE $fk IS NULL) AS null_fks,
         |  (SELECT count(*) FROM $child c
         |   WHERE c.$fk IS NOT NULL AND NOT EXISTS
         |     (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)) AS orphan_ct"""
        .stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge")
}
