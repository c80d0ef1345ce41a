package graft

import graft.core.Tables
import graft.operators.FuzzGen

/** Property-based differential sweep of the relational surface: 120
  * seeded FuzzGen cases, each executed BOTH as its DataFrame plan and
  * as its generated SQL through `spark.sql` over the same table —
  * row-identical or the generator's two renderings have drifted. The
  * SQL text is the exact string the driver hands DuckDB for the
  * fuzz_* oracle entries, so this sweep pins the Spark half of the
  * differential at 15× the width the per-round oracle replays. */
class FuzzDiffSpec extends SparkTestBase {

  private val cases = FuzzGen.suite(120) ++
    (1000 until 1040).map(FuzzGen.gen) ++ // the event-time shape space
    (2000 until 2040).map(FuzzGen.gen) ++ // the cross-table shape space
    (3000 until 3040).map(FuzzGen.gen) ++ // the window/HAVING shape space
    (4000 until 4040).map(FuzzGen.gen) ++ // the set-op/expression shape space
    (5000 until 5040).map(FuzzGen.gen) ++ // the subquery/semi-anti shape space
    (6000 until 6040).map(FuzzGen.gen) ++ // the correlated-scalar/LATERAL space
    (7000 until 7040).map(FuzzGen.gen) ++ // the recursive-CTE space (Spark 4 UnionLoop)
    (8000 until 8040).map(FuzzGen.gen) ++ // the grouping-sets/FILTER-aggregate space
    (9000 until 9040).map(FuzzGen.gen) ++ // the window-frame/navigation space
    (10000 until 10040).map(FuzzGen.gen) ++ // the string-function space
    (11000 until 11040).map(FuzzGen.gen) ++ // the timestamp/interval space
    (12000 until 12040).map(FuzzGen.gen) ++ // the decimal-arithmetic space
    (13000 until 13040).map(FuzzGen.gen) ++ // the float/double-semantics space
    (14000 until 14040).map(FuzzGen.gen) ++ // the coercion/DISTINCT space
    (15000 until 15040).map(FuzzGen.gen) ++ // the string-edge/collation space
    (16000 until 16040).map(FuzzGen.gen)  // the JSON-path extraction space

  test("720 generated filter/agg/join/time/cross/window/set/subquery/recursive/grouping/frame/string/timestamp/decimal/float/coercion/collation/json cases: DataFrame plan == SQL text") {
    Tables.events(spark, sf0001).createOrReplaceTempView("events")
    Tables.orders(spark, sf0001).createOrReplaceTempView("orders")
    Tables.nation(spark, sf0001).createOrReplaceTempView("nation")
    val failures = cases.flatMap { f =>
      val df = f.build(spark, sf0001)
      // shapes pinning a genuine surface-dialect split (regexp) carry
      // their Spark rendering separately; `f.sql` is DuckDB's text
      val viaSql = spark.sql(f.sparkSql.getOrElse(f.sql))
      val (a, b) = (rowsOf(df), rowsOf(viaSql))
      if (a == b) None
      else Some(s"${f.name}: df=${a.take(2)} sql=${b.take(2)}")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("generator is deterministic: same index, same SQL") {
    assert(FuzzGen.driverSuite.map(_.sql) == FuzzGen.driverSuite.map(_.sql))
    // and every shape appears in the 120-case sweep
    val shapes = cases.map(f =>
      if (f.sql.contains("WITH RECURSIVE")) "recursive"
      else if (f.sql.contains("ROLLUP") || f.sql.contains("CUBE") ||
        f.sql.contains("GROUPING SETS") ||
        f.sql.contains("FILTER (WHERE")) "grouping"
      else if (f.sql.contains("o_custkey")) "cross"
      else if (f.sql.contains("UNION") || f.sql.contains("INTERSECT") ||
        f.sql.contains("EXCEPT")) "setop"
      else if (f.sql.contains("CASE WHEN") ||
        f.sql.contains("concat_ws")) "expr"
      else if (f.sql.contains("JOIN")) "join"
      else if (f.sql.contains("hour(ts)")) "time"
      else if (f.sql.contains("HAVING")) "having"
      else if (f.sql.contains("OVER")) "window"
      else if (f.sql.contains("GROUP BY")) "agg"
      else if (f.sql.contains("LIMIT")) "limit" else "filter").toSet
    assert(shapes == Set("join", "agg", "filter", "window", "limit",
      "time", "cross", "having", "setop", "expr", "recursive",
      "grouping"))
  }

  test("rendering guard-rail assumptions hold on this Spark " +
      "(decimal→string pads scale; floor/ceil are BIGINT; exact casts)") {
    // The 12000–15000 pins are driver-green only while these hold; a
    // Spark upgrade that changes any of them must fail HERE, not as an
    // opaque driver hash-red.
    val r = spark.sql(
      """SELECT CAST(CAST(3.5 AS DECIMAL(30,5)) AS STRING) AS pad,
        |       CAST(CAST(-0.28 AS DECIMAL(12,2)) AS STRING) AS neg,
        |       CAST(CAST(12 AS DECIMAL(24,6)) AS STRING) AS intl,
        |       floor(CAST(3.7 AS DOUBLE)) AS fl,
        |       ceil(CAST(-3.7 AS DOUBLE)) AS ce,
        |       CAST(sign(CAST(-2.5 AS DOUBLE)) AS BIGINT) AS sg,
        |       CAST((CAST(-2.0 AS DOUBLE) % 2.0) * 4 AS BIGINT) AS mz,
        |       CAST((CAST(-5.75 AS DOUBLE) % 1.5) * 4 AS BIGINT) AS md
        |""".stripMargin).head()
    assert(r.getString(0) == "3.50000")  // scale-padded, not "3.5"
    assert(r.getString(1) == "-0.28")
    assert(r.getString(2) == "12.000000")
    // floor/ceil(DOUBLE) return BIGINT in Spark (the very divergence
    // the floorgrid pins CAST away — if this becomes DOUBLE the pins'
    // casts are still correct, but the assumption doc must be revised)
    assert(r.schema("fl").dataType.typeName == "long")
    assert(r.schema("ce").dataType.typeName == "long")
    assert(r.getLong(5) == -1L)
    assert(r.getLong(6) == 0L)   // IEEE -0.0 * 4 casts to plain 0
    assert(r.getLong(7) == -5L)  // C-style remainder -1.25, exact ×4
  }

  test("every case returns rows on sf0.001 or is a legitimately empty slice") {
    // a fuzz corpus where most predicates select nothing wouldn't test
    // the engines — require the bulk of cases to be non-empty
    val nonEmpty = cases.count(f => f.build(spark, sf0001).limit(1).count() > 0)
    assert(nonEmpty >= cases.length * 7 / 10,
      s"only $nonEmpty/${cases.length} fuzz cases select any rows")
  }
}
