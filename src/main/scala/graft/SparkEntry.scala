package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.operators.dws._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator/pipeline from SURVEY.md §2
  * re-expressed Spark-first, runnable batch-deterministically on a
  * `/root/testdata/sf*` directory; `oracleSql` holds its DuckDB twin
  * (same column names — the driver hash-compares after sorting columns
  * by name). Streaming parity of the stateful operators is exercised in
  * the ScalaTest suites (`graft.streaming`), not here.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    ProvinceOrderWindow(
      Tables.lineitem(spark, d), Tables.orders(spark, d),
      Tables.customer(spark, d), Tables.nation(spark, d))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a3_province_order_window" -> ((s, d) =>
      ProvinceOrderWindow(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.nation(s, d)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "a3_province_order_window" -> ProvinceOrderWindow.oracle
  )
}
