package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Property-based DIFFERENTIAL fuzz of the relational surface: a
  * seeded generator of random filter / aggregate / join fragments over
  * the `events` table, where every case is built twice from one AST —
  * once as a DataFrame plan, once as ANSI SQL that both Spark and
  * DuckDB parse identically. The fixed queries in `SparkEntry` pin the
  * operators the reference actually ships; this sweeps the space
  * BETWEEN them, catching dialect/semantics drift (null ordering,
  * rounding family, modulo sign, join null-matching) that hand-picked
  * cases can miss.
  *
  * Determinism: each case is a pure function of its index (one
  * `java.util.Random` LCG per case — stable across JVMs by spec), so
  * the local ScalaTest sweep (`FuzzDiffSpec`: DataFrame ≡ spark.sql,
  * 120 cases) and the driver's DuckDB oracle replay (fuzz_* entries in
  * SparkEntry) see the SAME queries.
  *
  * Dialect guard-rails baked into the grammar — each is a REAL drift
  * trap the generator must not step on, the same rules the fixed
  * oracles follow: aggregates of doubles go through `round(sum, 2)`
  * over 2-dp inputs (exactly representable; avoids HALF_UP-vs-
  * HALF_EVEN divergence), no `avg` (division ulps), every ORDER BY is
  * a total order, `%` only on non-negative operands (C-style sign
  * differs from floored), and string literals stay ASCII. */
object FuzzGen {

  final case class Fuzz(name: String,
                        build: (SparkSession, String) => DataFrame,
                        sql: String,
                        sparkSql: Option[String] = None)
  // `sql` is what the driver hands DuckDB. Almost every shape keeps it
  // engine-common so FuzzDiffSpec can replay the SAME text through
  // spark.sql; the few shapes that pin genuinely different surface
  // syntax (regexp dialect: Spark RLIKE / global regexp_replace vs
  // DuckDB regexp_matches / regexp_replace(...,'g')) carry the Spark
  // rendering in `sparkSql` for the local differential sweep.

  private val types = Seq("click", "error", "purchase", "signup", "view")

  /** One predicate atom: (DataFrame Column, SQL text) from one draw. */
  private def atom(rng: Random): (Column, String) =
    rng.nextInt(6) match {
      case 0 =>
        val t = types(rng.nextInt(types.length))
        if (rng.nextBoolean()) (col("event_type") === t, s"event_type = '$t'")
        else (col("event_type") =!= t, s"event_type <> '$t'")
      case 1 =>
        val ts = rng.shuffle(types).take(2 + rng.nextInt(2))
        (col("event_type").isin(ts: _*),
          s"event_type IN (${ts.map(t => s"'$t'").mkString(", ")})")
      case 2 =>
        val m = 2 + rng.nextInt(9); val r = rng.nextInt(m)
        (col("user_id") % m === r, s"user_id % $m = $r")
      case 3 =>
        // sf0.001 has only 15 distinct users (0..14): keep the lower
        // bound inside that range so the atom is satisfiable at every SF
        val a = rng.nextInt(10); val b = a + 3 + rng.nextInt(30)
        (col("user_id").between(a, b), s"user_id BETWEEN $a AND $b")
      case 4 =>
        // value spans ~0.03..327 at sf0.001 (wider at larger SF): draw
        // thresholds from the fat middle so neither direction is vacuous
        if (rng.nextBoolean()) {
          val x = math.floor(rng.nextDouble() * 20000) / 100.0 // 0..200
          (col("value") > x, s"value > $x")
        } else {
          val x = 100.0 + math.floor(rng.nextDouble() * 20000) / 100.0
          (col("value") <= x, s"value <= $x")
        }
      case _ =>
        val m = 3 + rng.nextInt(7); val r = rng.nextInt(m)
        (col("event_id") % m === r, s"event_id % $m = $r")
    }

  /** 1–3 atoms joined with AND/OR, fully parenthesized (identical
    * precedence reading in both engines). */
  private def predicate(rng: Random): (Column, String) = {
    val n = 1 + rng.nextInt(3)
    val parts = Seq.fill(n)(atom(rng))
    parts.reduceLeft { (acc, p) =>
      if (rng.nextBoolean()) (acc._1 && p._1, s"(${acc._2} AND ${p._2})")
      else (acc._1 || p._1, s"(${acc._2} OR ${p._2})")
    }
  }

  /** Group keys: event_type and/or a user bucket. */
  private def groupKeys(rng: Random): Seq[(Column, String, String)] = {
    val m = 2 + rng.nextInt(19)
    val all = Seq(
      (col("event_type"), "event_type", "event_type"),
      ((col("user_id") % m).as("ug"), s"user_id % $m AS ug", "ug"))
    rng.nextInt(3) match {
      case 0 => all.take(1)
      case 1 => all.drop(1)
      case _ => all
    }
  }

  /** Case `i`, deterministically. */
  def gen(i: Int): Fuzz = {
    val rng = new Random(0xF0220000L + i)
    val (pc, ps) = predicate(rng)
    val name = f"fuzz_$i%03d"
    // index spaces ≥1000 hold shapes added AFTER the first vetting
    // round — new shapes must never re-deal the existing indices'
    // shape draws, or every pinned vetted case silently changes
    if (i >= 16000) return genJson(i, rng, pc, ps, name)
    if (i >= 15000) return genStrEdge(i, rng, pc, ps, name)
    if (i >= 14000) return genCoerce(i, rng, pc, ps, name)
    if (i >= 13000) return genFloat(i, rng, pc, ps, name)
    if (i >= 12000) return genDecimal(i, rng, pc, ps, name)
    if (i >= 11000) return genTsArith(i, rng, pc, ps, name)
    if (i >= 10000) return genStringFns(i, rng, pc, ps, name)
    if (i >= 9000) return genAdvWindow(i, rng, pc, ps, name)
    if (i >= 8000) return genGroupingSets(i, rng, pc, ps, name)
    if (i >= 7000) return genRecursive(i, rng, pc, ps, name)
    if (i >= 6000) return genLateral(i, rng, pc, ps, name)
    if (i >= 5000) return genSubquery(i, rng, pc, ps, name)
    if (i >= 4000) return genSetExpr(i, rng, pc, ps, name)
    if (i >= 3000) return genWindow(i, rng, pc, ps, name)
    if (i >= 2000) return genCross(i, rng, pc, ps, name)
    if (i >= 1000) return genTime(i, rng, pc, ps, name)
    rng.nextInt(5) match {
      case 0 => // filter + projection
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"), col("user_id"), col("event_type"),
              round(col("value"), 2).as("value_r"))
            .orderBy("event_id"),
          s"""SELECT event_id, user_id, event_type,
             |       round(value, 2) AS value_r
             |FROM events WHERE $ps ORDER BY event_id""".stripMargin)
      case 1 => // filter + group + aggregate
        val keys = groupKeys(rng)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(keys.map(_._1): _*)
            .agg(count(lit(1)).as("ct"),
              min(col("event_id")).as("min_id"),
              max(col("event_id")).as("max_id"),
              round(sum(round(col("value"), 2)), 2).as("vsum"))
            .orderBy(keys.map(k => col(k._3)): _*),
          s"""SELECT ${keys.map(_._2).mkString(", ")},
             |       count(*) AS ct, min(event_id) AS min_id,
             |       max(event_id) AS max_id,
             |       round(sum(round(value, 2)), 2) AS vsum
             |FROM events WHERE $ps
             |GROUP BY ${keys.map(_._3).mkString(", ")}
             |ORDER BY ${keys.map(_._3).mkString(", ")}""".stripMargin)
      case 3 => // window rank: first N events per key by event_id
        val byType = rng.nextBoolean()
        val (keyCol, keySql) =
          if (byType) (col("event_type"), "event_type")
          else {
            val m = 2 + rng.nextInt(9)
            ((col("user_id") % m).as("ug"), s"user_id % $m")
          }
        val keyName = if (byType) "event_type" else "ug"
        val n = 1 + rng.nextInt(5)
        Fuzz(name,
          (s, d) => {
            import org.apache.spark.sql.expressions.Window
            graft.core.Tables.events(s, d)
              .filter(pc)
              .select(col("event_id"), col("user_id"), keyCol)
              .withColumn("rn", row_number().over(
                Window.partitionBy(col(keyName)).orderBy(col("event_id"))))
              .filter(col("rn") <= n)
              .orderBy("event_id")
          },
          // nested subquery, not QUALIFY: the text must parse in Spark
          // SQL (FuzzDiffSpec) AND DuckDB (driver oracle)
          s"""SELECT event_id, user_id, $keyName, rn FROM (
             |  SELECT event_id, user_id, $keySql AS $keyName,
             |         CAST(row_number() OVER (PARTITION BY $keySql
             |              ORDER BY event_id) AS INT) AS rn
             |  FROM events WHERE $ps) ranked
             |WHERE rn <= $n ORDER BY event_id""".stripMargin)
      case 4 => // global sort-limit (top-N by rounded value)
        val lim = 20 + rng.nextInt(80)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"), col("user_id"),
              round(col("value"), 2).as("value_r"))
            .orderBy(col("value_r").desc, col("event_id"))
            .limit(lim),
          s"""SELECT event_id, user_id, round(value, 2) AS value_r
             |FROM events WHERE $ps
             |ORDER BY value_r DESC, event_id LIMIT $lim""".stripMargin)
      case _ => // filtered slice joined to a per-user aggregate
        val lo = 10 + rng.nextInt(40)
        Fuzz(name,
          (s, d) => {
            val ev = graft.core.Tables.events(s, d)
            val perUser = ev.groupBy(col("user_id"))
              .agg(count(lit(1)).as("user_ct"))
              .filter(col("user_ct") >= lo)
            ev.filter(pc)
              .join(perUser, Seq("user_id"))
              .select(col("event_id"), col("user_id"), col("user_ct"),
                col("event_type"))
              .orderBy("event_id")
          },
          s"""SELECT e.event_id, e.user_id, u.user_ct, e.event_type
             |FROM (SELECT * FROM events WHERE $ps) e
             |JOIN (SELECT user_id, count(*) AS user_ct
             |      FROM events GROUP BY user_id
             |      HAVING count(*) >= $lo) u
             |  ON e.user_id = u.user_id
             |ORDER BY e.event_id""".stripMargin)
    }
  }

  /** Event-time shapes (index space ≥1000): calendar-field buckets and
    * hour-band filters. Only `day`/`hour`/`minute` appear — they parse
    * and agree in BOTH dialects; `dayofweek` is deliberately excluded
    * (Sunday=1 in Spark, Sunday=0 in DuckDB — a real drift trap the
    * grammar must not step on). */
  private def genTime(i: Int, rng: Random, pc: Column, ps: String,
                      name: String): Fuzz =
    rng.nextInt(2) match {
      case 0 => // calendar-bucket aggregate: (day, hour[, type]) rollups
        val withType = rng.nextBoolean()
        val tailSql = if (withType) ", event_type" else ""
        Fuzz(name,
          (s, d) => {
            val keys = Seq(dayofmonth(col("ts")).as("d"),
              hour(col("ts")).as("h")) ++
              (if (withType) Seq(col("event_type")) else Nil)
            val names = Seq("d", "h") ++
              (if (withType) Seq("event_type") else Nil)
            graft.core.Tables.events(s, d)
              .filter(pc)
              .groupBy(keys: _*)
              .agg(count(lit(1)).as("ct"),
                min(col("event_id")).as("min_id"),
                round(sum(round(col("value"), 2)), 2).as("vsum"))
              .orderBy(names.map(col): _*)
          },
          s"""SELECT day(ts) AS d, hour(ts) AS h$tailSql,
             |       count(*) AS ct, min(event_id) AS min_id,
             |       round(sum(round(value, 2)), 2) AS vsum
             |FROM events WHERE $ps
             |GROUP BY day(ts), hour(ts)$tailSql
             |ORDER BY d, h$tailSql""".stripMargin)
      case _ => // hour-of-day band filter + calendar projection
        val h1 = rng.nextInt(12); val h2 = h1 + 6 + rng.nextInt(6)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc && hour(col("ts")).between(h1, h2))
            .select(col("event_id"), col("user_id"),
              hour(col("ts")).as("h"), minute(col("ts")).as("m"),
              round(col("value"), 2).as("value_r"))
            .orderBy("event_id"),
          s"""SELECT event_id, user_id, hour(ts) AS h, minute(ts) AS m,
             |       round(value, 2) AS value_r
             |FROM events WHERE ($ps) AND hour(ts) BETWEEN $h1 AND $h2
             |ORDER BY event_id""".stripMargin)
    }

  /** Cross-table shapes (index space ≥2000): events ⋈ orders on
    * user_id = o_custkey — the multi-table differential surface (all
    * other shapes stay on one table). Order-side predicates use only
    * status equality and month() — both dialect-identical. */
  private def genCross(i: Int, rng: Random, pc: Column, ps: String,
                       name: String): Fuzz = {
    val (oc, os) = rng.nextInt(2) match {
      case 0 =>
        val st = Seq("O", "F", "P")(rng.nextInt(3))
        (col("o_orderstatus") === st, s"o_orderstatus = '$st'")
      case _ =>
        val m = 1 + rng.nextInt(12)
        (month(col("o_orderdate")) === m, s"month(o_orderdate) = $m")
    }
    rng.nextInt(2) match {
      case 0 => // inner join + per-customer aggregate over the fan-out
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d).filter(pc).as("e")
            .join(graft.core.Tables.orders(s, d).filter(oc).as("o"),
              col("e.user_id") === col("o.o_custkey"))
            .groupBy(col("o.o_custkey").as("o_custkey"))
            .agg(count(lit(1)).as("ct"),
              min(col("e.event_id")).as("min_ev"),
              round(sum(round(col("o.o_totalprice"), 2)), 2).as("osum"))
            .orderBy("o_custkey"),
          s"""SELECT o.o_custkey, count(*) AS ct, min(e.event_id) AS min_ev,
             |       round(sum(round(o.o_totalprice, 2)), 2) AS osum
             |FROM events e JOIN orders o ON e.user_id = o.o_custkey
             |WHERE ($ps) AND $os
             |GROUP BY o.o_custkey ORDER BY o.o_custkey""".stripMargin)
      case _ => // left join to a filtered per-customer aggregate:
        // NULL-vs-zero on unmatched users is the drift trap
        Fuzz(name,
          (s, d) => {
            val oagg = graft.core.Tables.orders(s, d).filter(oc)
              .groupBy(col("o_custkey")).agg(count(lit(1)).as("o_ct"))
            graft.core.Tables.events(s, d).filter(pc)
              .join(oagg, col("user_id") === col("o_custkey"), "left")
              .select(col("event_id"), col("user_id"), col("o_ct"))
              .orderBy("event_id")
          },
          s"""SELECT e.event_id, e.user_id, o.o_ct
             |FROM (SELECT * FROM events WHERE $ps) e
             |LEFT JOIN (SELECT o_custkey, count(*) AS o_ct FROM orders
             |           WHERE $os GROUP BY 1) o
             |  ON e.user_id = o.o_custkey
             |ORDER BY e.event_id""".stripMargin)
    }
  }

  /** Window-function / grouped-HAVING shapes (index space ≥3000) —
    * the analytic kernels the reference's batch twins lean on
    * everywhere (`Dedup`, `VisitFlags`, `Sessionize` are all
    * row_number/lag/lead under the hood), swept between the fixed
    * queries. Guard rails: row_number's ORDER BY always carries the
    * unique event_id tie-break (total order or the value is
    * nondeterministic); rank/dense_rank may order by the rounded value
    * alone (tie-stable by definition); running frames are explicit
    * ROWS (RANGE peers would drag float peer-grouping in) and sum only
    * integers; rank-family outputs are CAST to INT and window counts/
    * integer sums to BIGINT on the SQL side so both dialects agree on
    * schema. */
  private def genWindow(i: Int, rng: Random, pc: Column, ps: String,
                        name: String): Fuzz = {
    import org.apache.spark.sql.expressions.Window
    val byType = rng.nextBoolean()
    val m = 2 + rng.nextInt(9)
    val keySql = if (byType) "event_type" else s"user_id % $m"
    val keyCol: Column = if (byType) col("event_type") else col("user_id") % m
    rng.nextInt(4) match {
      case 0 => // ranking trio: row_number (total order) vs rank /
        // dense_rank (peer-stable on the rounded value alone)
        val n = 2 + rng.nextInt(6)
        Fuzz(name,
          (s, d) => {
            val wTotal = Window.partitionBy(keyCol)
              .orderBy(round(col("value"), 2).desc, col("event_id"))
            val wPeers = Window.partitionBy(keyCol)
              .orderBy(round(col("value"), 2).desc)
            graft.core.Tables.events(s, d)
              .filter(pc)
              .select(col("event_id"), col("user_id"), keyCol.as("k"),
                row_number().over(wTotal).as("rn"),
                rank().over(wPeers).as("rk"),
                dense_rank().over(wPeers).as("drk"))
              .filter(col("rn") <= n)
              .orderBy("event_id")
          },
          s"""SELECT event_id, user_id, k, rn, rk, drk FROM (
             |  SELECT event_id, user_id, $keySql AS k,
             |         CAST(row_number() OVER (PARTITION BY $keySql
             |           ORDER BY round(value, 2) DESC, event_id) AS INT) AS rn,
             |         CAST(rank() OVER (PARTITION BY $keySql
             |           ORDER BY round(value, 2) DESC) AS INT) AS rk,
             |         CAST(dense_rank() OVER (PARTITION BY $keySql
             |           ORDER BY round(value, 2) DESC) AS INT) AS drk
             |  FROM events WHERE $ps) ranked
             |WHERE rn <= $n ORDER BY event_id""".stripMargin)
      case 1 => // lag/lead navigation over the per-key event sequence
        Fuzz(name,
          (s, d) => {
            val w = Window.partitionBy(keyCol).orderBy(col("event_id"))
            graft.core.Tables.events(s, d)
              .filter(pc)
              .select(col("event_id"), col("user_id"), keyCol.as("k"),
                lag(col("event_id"), 1).over(w).as("prev_id"),
                lead(col("event_id"), 1).over(w).as("next_id"),
                round(round(col("value"), 2) -
                  lag(round(col("value"), 2), 1).over(w), 2).as("dv"))
              .orderBy("event_id")
          },
          s"""SELECT event_id, user_id, $keySql AS k,
             |       lag(event_id, 1) OVER (PARTITION BY $keySql
             |         ORDER BY event_id) AS prev_id,
             |       lead(event_id, 1) OVER (PARTITION BY $keySql
             |         ORDER BY event_id) AS next_id,
             |       round(round(value, 2) - lag(round(value, 2), 1)
             |         OVER (PARTITION BY $keySql ORDER BY event_id), 2) AS dv
             |FROM events WHERE $ps ORDER BY event_id""".stripMargin)
      case 2 => // running integer aggregates, explicit ROWS frame
        Fuzz(name,
          (s, d) => {
            val w = Window.partitionBy(keyCol).orderBy(col("event_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            graft.core.Tables.events(s, d)
              .filter(pc)
              .select(col("event_id"), col("user_id"), keyCol.as("k"),
                sum(col("event_id")).over(w).as("run_sum"),
                count(lit(1)).over(w).as("run_ct"))
              .orderBy("event_id")
          },
          s"""SELECT event_id, user_id, $keySql AS k,
             |       CAST(sum(event_id) OVER (PARTITION BY $keySql
             |         ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
             |         AND CURRENT ROW) AS BIGINT) AS run_sum,
             |       CAST(count(*) OVER (PARTITION BY $keySql
             |         ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
             |         AND CURRENT ROW) AS BIGINT) AS run_ct
             |FROM events WHERE $ps ORDER BY event_id""".stripMargin)
      case _ => // grouped HAVING over multiple aggregate conditions
        val lo = 2 + rng.nextInt(20)
        val cap = 5000 + rng.nextInt(5000)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(keyCol.as("k"))
            .agg(count(lit(1)).as("ct"),
              min(col("event_id")).as("min_id"),
              max(col("event_id")).as("max_id"),
              round(sum(round(col("value"), 2)), 2).as("vsum"))
            .filter(col("ct") >= lo && col("min_id") <= cap)
            .orderBy("k"),
          s"""SELECT $keySql AS k, count(*) AS ct,
             |       min(event_id) AS min_id, max(event_id) AS max_id,
             |       round(sum(round(value, 2)), 2) AS vsum
             |FROM events WHERE $ps
             |GROUP BY $keySql
             |HAVING count(*) >= $lo AND min(event_id) <= $cap
             |ORDER BY k""".stripMargin)
    }
  }

  /** Set-operation and scalar-expression shapes (index space ≥4000):
    * UNION/INTERSECT/EXCEPT between two predicate branches (bag-vs-set
    * semantics and null-matching are the classic dialect traps —
    * INTERSECT/EXCEPT are SET ops in both engines, so the DataFrame
    * side uses `intersect`/`except`/`union().distinct()`), plus CASE
    * bucketing and ASCII string-function projections. Guard rails:
    * CASE thresholds compare RAW doubles (identical float64 in both
    * engines, no rounding at the comparison), string functions stay in
    * the dialect-identical set (upper/substring/length/concat_ws/
    * nullif/coalesce, ASCII-only inputs). */
  private def genSetExpr(i: Int, rng: Random, pc: Column, ps: String,
                         name: String): Fuzz = {
    val (pc2, ps2) = predicate(rng)
    rng.nextInt(4) match {
      case 0 => // set op between two projected branches
        val (opName, opSqlKw) = Seq(
          ("union", "UNION"), ("intersect", "INTERSECT"),
          ("except", "EXCEPT"))(rng.nextInt(3))
        Fuzz(name,
          (s, d) => {
            val ev = graft.core.Tables.events(s, d)
            val a = ev.filter(pc)
              .select(col("user_id"), col("event_type"))
            val b = ev.filter(pc2)
              .select(col("user_id"), col("event_type"))
            val out = opName match {
              case "union"     => a.union(b).distinct()
              case "intersect" => a.intersect(b)
              case _           => a.except(b)
            }
            out.orderBy("user_id", "event_type")
          },
          s"""SELECT user_id, event_type FROM events WHERE $ps
             |$opSqlKw
             |SELECT user_id, event_type FROM events WHERE $ps2
             |ORDER BY user_id, event_type""".stripMargin)
      case 1 => // UNION ALL with a branch tag, re-aggregated (bag
        // semantics: overlap must count twice)
        Fuzz(name,
          (s, d) => {
            val ev = graft.core.Tables.events(s, d)
            ev.filter(pc)
              .select(col("event_type"), lit("a").as("branch"))
              .union(ev.filter(pc2)
                .select(col("event_type"), lit("b").as("branch")))
              .groupBy(col("event_type"), col("branch"))
              .agg(count(lit(1)).as("ct"))
              .orderBy("event_type", "branch")
          },
          s"""SELECT event_type, branch, count(*) AS ct FROM (
             |  SELECT event_type, 'a' AS branch FROM events WHERE $ps
             |  UNION ALL
             |  SELECT event_type, 'b' AS branch FROM events WHERE $ps2) u
             |GROUP BY event_type, branch
             |ORDER BY event_type, branch""".stripMargin)
      case 2 => // CASE bucketing over raw-double thresholds + count
        val t1 = 50 + rng.nextInt(100)  // integer literals: identical
        val t2 = t1 + 50 + rng.nextInt(100) // comparison in both
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_type"),
              when(col("value") > t2, "high")
                .when(col("value") > t1, "mid")
                .otherwise("low").as("bucket"))
            .groupBy(col("event_type"), col("bucket"))
            .agg(count(lit(1)).as("ct"))
            .orderBy("event_type", "bucket"),
          s"""SELECT event_type,
             |       CASE WHEN value > $t2 THEN 'high'
             |            WHEN value > $t1 THEN 'mid'
             |            ELSE 'low' END AS bucket,
             |       count(*) AS ct
             |FROM events WHERE $ps
             |GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin)
      case _ => // ASCII string-function projection + null plumbing
        val t = types(rng.nextInt(types.length))
        val sLen = 1 + rng.nextInt(4)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"),
              upper(col("event_type")).as("up"),
              substring(col("event_type"), 1, sLen).as("pre"),
              length(col("event_type")).cast("int").as("len"),
              concat_ws("_", col("event_type"),
                (col("user_id") % 10).cast("string")).as("tag"),
              coalesce(nullif(col("event_type"), lit(t)), lit("other"))
                .as("nn"))
            .orderBy("event_id"),
          s"""SELECT event_id, upper(event_type) AS up,
             |       substring(event_type, 1, $sLen) AS pre,
             |       CAST(length(event_type) AS INT) AS len,
             |       concat_ws('_', event_type,
             |                 CAST(user_id % 10 AS STRING)) AS tag,
             |       coalesce(nullif(event_type, '$t'), 'other') AS nn
             |FROM events WHERE $ps ORDER BY event_id""".stripMargin)
    }
  }

  /** Subquery shapes (index space ≥5000): EXISTS / NOT EXISTS
    * correlation against orders (the planner's semi/anti join family),
    * IN over a grouped-HAVING derived table, and an uncorrelated
    * scalar-subquery threshold. Dialect guard-rails: the scalar
    * threshold compares RAW doubles (identical float64 both engines —
    * the CASE-bucket precedent), and an empty scalar subquery yields
    * NULL, which both engines drop through the comparison. */
  private def genSubquery(i: Int, rng: Random, pc: Column, ps: String,
                          name: String): Fuzz = {
    rng.nextInt(4) match {
      case 0 => // EXISTS → left-semi join
        val st = Seq("O", "F", "P")(rng.nextInt(3))
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .join(graft.core.Tables.orders(s, d)
              .filter(col("o_orderstatus") === st)
              .select(col("o_custkey").as("user_id")),
              Seq("user_id"), "left_semi")
            .select(col("event_id"), col("user_id"), col("event_type"),
              round(col("value"), 2).as("value_r"))
            .orderBy("event_id"),
          s"""SELECT event_id, user_id, event_type,
             |       round(value, 2) AS value_r
             |FROM events e WHERE ($ps) AND EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_custkey = e.user_id
             |    AND o.o_orderstatus = '$st')
             |ORDER BY event_id""".stripMargin)
      case 1 => // NOT EXISTS → left-anti join
        val st = Seq("O", "F", "P")(rng.nextInt(3))
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .join(graft.core.Tables.orders(s, d)
              .filter(col("o_orderstatus") === st)
              .select(col("o_custkey").as("user_id")),
              Seq("user_id"), "left_anti")
            .select(col("event_id"), col("user_id"), col("event_type"))
            .orderBy("event_id"),
          s"""SELECT event_id, user_id, event_type
             |FROM events e WHERE ($ps) AND NOT EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_custkey = e.user_id
             |    AND o.o_orderstatus = '$st')
             |ORDER BY event_id""".stripMargin)
      case 2 => // IN over a grouped-HAVING derived table → semi join
        val k = 5 + rng.nextInt(21)
        Fuzz(name,
          (s, d) => {
            val ev = graft.core.Tables.events(s, d)
            ev.filter(pc)
              .join(ev.groupBy(col("user_id"))
                .agg(count(lit(1)).as("n")).filter(col("n") >= k)
                .select("user_id"),
                Seq("user_id"), "left_semi")
              .groupBy(col("user_id"))
              .agg(count(lit(1)).as("ct"),
                min(col("event_id")).as("min_id"))
              .orderBy("user_id")
          },
          s"""SELECT user_id, count(*) AS ct, min(event_id) AS min_id
             |FROM events WHERE ($ps) AND user_id IN (
             |  SELECT user_id FROM events
             |  GROUP BY user_id HAVING count(*) >= $k)
             |GROUP BY user_id ORDER BY user_id""".stripMargin)
      case _ => // uncorrelated scalar-subquery threshold
        val (pc2, ps2) = predicate(rng)
        val drop = 50 + rng.nextInt(101)
        Fuzz(name,
          (s, d) => {
            val ev = graft.core.Tables.events(s, d)
            ev.filter(pc)
              .crossJoin(broadcast(ev.filter(pc2)
                .agg((max(col("value")) - drop).as("thr"))))
              .filter(col("value") > col("thr"))
              .select(col("event_id"), col("user_id"),
                round(col("value"), 2).as("value_r"))
              .orderBy("event_id")
          },
          s"""SELECT event_id, user_id, round(value, 2) AS value_r
             |FROM events WHERE ($ps) AND value > (
             |  SELECT max(value) - $drop FROM events WHERE $ps2)
             |ORDER BY event_id""".stripMargin)
    }
  }

  /** Correlated-scalar + LATERAL shapes (index space ≥6000): the two
    * relational shapes the ≥5000 space does not generate — correlated
    * SCALAR subqueries (SELECT-list count; WHERE-clause max
    * threshold) and LATERAL derived tables (correlated aggregate;
    * ORDER BY ... LIMIT top-k). The DataFrame twins express the same
    * semantics the way Catalyst decorrelates them: a grouped or
    * windowed build side joined on the correlation key. Guard-rails:
    * a correlated count over no rows is 0 (coalesce on the join
    * build — the classic COUNT-decorrelation trap), sum over no rows
    * is NULL on BOTH sides, double sums ride `round(., 2)`, scalar
    * max thresholds compare raw float64 (single division, identical
    * in both engines), and every output is totally ordered. */
  private def genLateral(i: Int, rng: Random, pc: Column, ps: String,
                         name: String): Fuzz = {
    rng.nextInt(4) match {
      case 0 => // correlated scalar COUNT in the SELECT list
        val st = Seq("O", "F", "P")(rng.nextInt(3))
        Fuzz(name,
          (s, d) => {
            val u = graft.core.Tables.events(s, d).filter(pc)
              .select("user_id").distinct()
            val n = graft.core.Tables.orders(s, d)
              .filter(col("o_orderstatus") === st)
              .groupBy(col("o_custkey").as("user_id"))
              .agg(count(lit(1)).as("n_orders"))
            u.join(n, Seq("user_id"), "left")
              .select(col("user_id"),
                coalesce(col("n_orders"), lit(0L)).as("n_orders"))
              .orderBy("user_id")
          },
          s"""SELECT user_id,
             |       (SELECT count(*) FROM orders o
             |        WHERE o.o_custkey = e.user_id
             |          AND o.o_orderstatus = '$st') AS n_orders
             |FROM (SELECT DISTINCT user_id FROM events WHERE ($ps)) e
             |ORDER BY user_id""".stripMargin)
      case 1 => // correlated scalar MAX as a WHERE threshold
        val dv = 500 + rng.nextInt(1500)
        Fuzz(name,
          (s, d) => {
            val mx = graft.core.Tables.orders(s, d)
              .groupBy(col("o_custkey").as("user_id"))
              .agg(max(col("o_totalprice")).as("__mx"))
            graft.core.Tables.events(s, d).filter(pc)
              .join(mx, Seq("user_id"), "left")
              .filter(col("value") > col("__mx") / dv)
              .select(col("event_id"), col("user_id"),
                round(col("value"), 2).as("value_r"))
              .orderBy("event_id")
          },
          s"""SELECT event_id, user_id, round(value, 2) AS value_r
             |FROM events e
             |WHERE ($ps) AND value > (
             |  SELECT max(o.o_totalprice) FROM orders o
             |  WHERE o.o_custkey = e.user_id) / $dv
             |ORDER BY event_id""".stripMargin)
      case 2 => // LATERAL correlated aggregate (always one row per key)
        val m = 2 + rng.nextInt(5); val r = rng.nextInt(m)
        Fuzz(name,
          (s, d) => {
            val u = graft.core.Tables.events(s, d).filter(pc)
              .select("user_id").distinct()
            val agg = graft.core.Tables.orders(s, d)
              .filter(col("o_orderkey") % m === r)
              .groupBy(col("o_custkey").as("user_id"))
              .agg(count(lit(1)).as("n"),
                round(sum(col("o_totalprice")), 2).as("spend_r"))
            u.join(agg, Seq("user_id"), "left")
              .select(col("user_id"),
                coalesce(col("n"), lit(0L)).as("n"), col("spend_r"))
              .orderBy("user_id")
          },
          s"""SELECT u.user_id, l.n, l.spend_r
             |FROM (SELECT DISTINCT user_id FROM events WHERE ($ps)) u,
             |  LATERAL (SELECT count(*) AS n,
             |             round(sum(o.o_totalprice), 2) AS spend_r
             |           FROM orders o
             |           WHERE o.o_custkey = u.user_id
             |             AND o.o_orderkey % $m = $r) l
             |ORDER BY user_id""".stripMargin)
      case _ => // LATERAL top-k per key (ORDER BY ... LIMIT inside)
        val k = 1 + rng.nextInt(3)
        Fuzz(name,
          (s, d) => {
            val u = graft.core.Tables.events(s, d).filter(pc)
              .select("user_id").distinct()
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col("o_custkey"))
              .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
            val top = graft.core.Tables.orders(s, d)
              .withColumn("__rn", row_number().over(w))
              .filter(col("__rn") <= k)
              .select(col("o_custkey").as("user_id"), col("o_orderkey"),
                col("o_totalprice"))
            // inner: a LATERAL with no rows contributes nothing
            u.join(top, Seq("user_id"))
              .orderBy("user_id", "o_orderkey")
          },
          s"""SELECT u.user_id, l.o_orderkey, l.o_totalprice
             |FROM (SELECT DISTINCT user_id FROM events WHERE ($ps)) u,
             |  LATERAL (SELECT o.o_orderkey, o.o_totalprice
             |           FROM orders o WHERE o.o_custkey = u.user_id
             |           ORDER BY o.o_totalprice DESC, o.o_orderkey
             |           LIMIT $k) l
             |ORDER BY user_id, o_orderkey""".stripMargin)
    }
  }

  /** Recursive-CTE shapes (index space ≥7000): `WITH RECURSIVE` is new
    * engine surface in Spark 4 (UnionLoopExec), and this space
    * differentials it THREE ways — the DataFrame twin here is never a
    * recursive plan (a `range` spine, a typed per-row unfold, or a
    * closed form), the SQL text recurses in Spark (`FuzzDiffSpec`),
    * and the SAME text recurses in DuckDB (driver oracle) — so a bug
    * in either engine's loop execution or in the twin's algebra
    * surfaces as a three-way disagreement. Guard-rails on top of the
    * base grammar: recursion is `UNION ALL` only (Spark 4.1 rejects
    * UNION-distinct recursion: UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE),
    * every step STRICTLY decreases a non-negative integer or carries
    * an explicit depth bound, and worst-case depth stays ≤ 61 — well
    * under Spark's default cteRecursionLevelLimit of 100 (exceeding
    * it is an ERROR, not truncation, so the bound is correctness).
    * Arithmetic is integer +/-/% on non-negative operands only; the
    * one division (ancestor closed form) is exact by construction
    * (`a - a%step` is a multiple of `step`, float64 division of small
    * exact integers is exact in both engines). Seeds guard
    * `user_id IS NOT NULL` on BOTH sides: the typed unfold twins
    * decode seeds as primitive Longs, and a future testdata
    * generation with null user_ids must change the seed SET, not
    * silently NPE one side. */
  private def genRecursive(i: Int, rng: Random, pc: Column, ps: String,
                           name: String): Fuzz = {
    rng.nextInt(4) match {
      case 0 => // recursive integer spine LEFT JOINed to a fact slice
        // (the gap-fill pattern: spine rows with no facts must survive
        // with ct = 0 — count(col) over an all-null group)
        val k = 5 + rng.nextInt(40)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d).filter(pc)
            .join(s.range(0L, k + 1L).toDF("x"),
              col("user_id") % (k + 1) === col("x"), "right")
            .groupBy(col("x"))
            .agg(count(col("event_id")).as("ct"))
            .orderBy("x"),
          s"""WITH RECURSIVE n(x) AS (
             |  SELECT CAST(0 AS BIGINT) UNION ALL
             |  SELECT x + 1 FROM n WHERE x < $k)
             |SELECT x, count(e.event_id) AS ct
             |FROM n LEFT JOIN (SELECT * FROM events WHERE $ps) e
             |  ON e.user_id % ${k + 1} = n.x
             |GROUP BY x ORDER BY x""".stripMargin)
      case 1 => // per-seed subtraction chain: x -> x - (x % d + 1),
        // data-dependent termination (strictly decreasing, so depth is
        // bounded by the seed value, itself bounded by the modulus)
        val cap = 20 + rng.nextInt(41) // seeds 0..cap-1, depth <= cap <= 60
        val d0 = 3 + rng.nextInt(8)
        Fuzz(name,
          (s, d) => {
            import s.implicits._
            graft.core.Tables.events(s, d)
              .filter(pc && col("user_id").isNotNull)
              .select((col("user_id") % cap).as("start")).distinct()
              .as[Long]
              .flatMap { s0 =>
                // the twin unfolds the chain per row — no recursion,
                // no joins; distributed because seeds are
                Iterator.iterate(s0)(x => x - (x % d0 + 1))
                  .takeWhile(_ > 0).map(x => (s0, x)).toSeq :+
                  ((s0, Iterator.iterate(s0)(x => x - (x % d0 + 1))
                    .dropWhile(_ > 0).next()))
              }
              .toDF("start", "x")
              .groupBy(col("start"))
              .agg(count(lit(1)).as("steps"), min(col("x")).as("floor_x"))
              .orderBy("start")
          },
          s"""WITH RECURSIVE chain(start, x) AS (
             |  SELECT DISTINCT user_id % $cap, user_id % $cap
             |  FROM events WHERE ($ps) AND user_id IS NOT NULL
             |  UNION ALL
             |  SELECT start, x - (x % $d0 + 1) FROM chain WHERE x > 0)
             |SELECT start, count(*) AS steps, min(x) AS floor_x
             |FROM chain GROUP BY start ORDER BY start""".stripMargin)
      case 2 => // ancestor chain over nation keys vs the CLOSED FORM:
        // parent = a - step while >= 0, so depth = a div step + 1 and
        // root = a % step — recursion checked against pure arithmetic
        val step = 2 + rng.nextInt(9)
        val fm = 1 + rng.nextInt(3); val fr = rng.nextInt(fm)
        Fuzz(name,
          (s, d) => graft.core.Tables.nation(s, d)
            .filter(col("n_nationkey") % fm === fr)
            .select(col("n_nationkey").as("k"),
              (((col("n_nationkey") - col("n_nationkey") % step) / step)
                .cast("long") + 1L).as("depth"),
              (col("n_nationkey") % step).as("root"))
            .orderBy("k"),
          s"""WITH RECURSIVE anc(k, a) AS (
             |  SELECT n_nationkey, n_nationkey FROM nation
             |  WHERE n_nationkey % $fm = $fr
             |  UNION ALL
             |  SELECT k, a - $step FROM anc WHERE a - $step >= 0)
             |SELECT k, count(*) AS depth, min(a) AS root
             |FROM anc GROUP BY k ORDER BY k""".stripMargin)
      case _ => // depth-bounded walk of the functional graph
        // u -> (a*u + b) % m: one successor per node, so rows grow
        // linearly with depth (never combinatorially) — the twin
        // iterates the map locally and counts distinct visits
        val m = 8 + rng.nextInt(17)
        val a = 2 + rng.nextInt(4); val b = rng.nextInt(m)
        val dep = 5 + rng.nextInt(12)
        Fuzz(name,
          (s, d) => {
            import s.implicits._
            graft.core.Tables.events(s, d)
              .filter(pc && col("user_id").isNotNull)
              .select((col("user_id") % m).as("seed")).distinct()
              .as[Long]
              .map { s0 =>
                val visited = Iterator.iterate(s0)(x => (a * x + b) % m)
                  .take(dep + 1).toSet
                (s0, visited.size.toLong)
              }
              .toDF("seed", "n_reach")
              .orderBy("seed")
          },
          s"""WITH RECURSIVE r(seed, node, depth) AS (
             |  SELECT DISTINCT user_id % $m, user_id % $m, 0
             |  FROM events WHERE ($ps) AND user_id IS NOT NULL
             |  UNION ALL
             |  SELECT seed, ($a * node + $b) % $m, depth + 1
             |  FROM r WHERE depth < $dep)
             |SELECT seed, count(DISTINCT node) AS n_reach
             |FROM r GROUP BY seed ORDER BY seed""".stripMargin)
    }
  }

  /** Multi-grouping / filtered-aggregate shapes (index space ≥8000):
    * ROLLUP, CUBE, explicit GROUPING SETS, and FILTER-clause
    * aggregates — the grouping surface the fixed `w_grouping_sets` /
    * `w_status_priority_cube` queries pin, swept between them.
    * Dialect guard-rails: super-aggregate rows carry NULL group keys
    * whose SORT ORDER differs by engine default (Spark NULLS FIRST
    * ASC, DuckDB NULLS LAST), so every rollup/cube key is rewritten
    * to an explicit sentinel through `grouping(col)` BEFORE the
    * ORDER BY — never sort a nullable super-aggregate key; and
    * `grouping_id()` is deliberately excluded (bit order is
    * engine-defined), only per-column `grouping()` appears. The
    * GROUPING SETS twin is a UNION ALL of independent aggregates —
    * a non-grouping-sets derivation, so the engine's set expansion
    * is differentialed against plain relational algebra, not against
    * itself. */
  private def genGroupingSets(i: Int, rng: Random, pc: Column, ps: String,
                              name: String): Fuzz = {
    val m = 2 + rng.nextInt(9)
    // grouping() is only legal inside the rollup/cube aggregate, so
    // the marker columns ride the agg and the sentinel rewrite is a
    // plain projection over them
    val etSentinel = when(col("__g1") === 1, lit("ALL"))
      .otherwise(col("event_type")).as("et")
    val ugSentinel = when(col("__g2") === 1, lit(-1L))
      .otherwise(col("ug")).as("ug")
    def base(s: SparkSession, d: String) =
      graft.core.Tables.events(s, d).filter(pc)
        .select(col("event_type"), (col("user_id") % m).as("ug"),
          col("event_id"), col("value"))
    val fromSql =
      s"(SELECT event_type, user_id % $m AS ug, event_id, value " +
        s"FROM events WHERE $ps) t"
    rng.nextInt(4) match {
      case 0 => // ROLLUP (event_type, ug): 3 grouping levels
        Fuzz(name,
          (s, d) => base(s, d)
            .rollup(col("event_type"), col("ug"))
            .agg(grouping(col("event_type")).as("__g1"),
              grouping(col("ug")).as("__g2"),
              count(lit(1)).as("ct"),
              sum(col("event_id")).cast("bigint").as("id_sum"))
            .select(etSentinel, ugSentinel, col("ct"), col("id_sum"))
            .orderBy("et", "ug"),
          s"""SELECT CASE WHEN grouping(event_type) = 1 THEN 'ALL'
             |            ELSE event_type END AS et,
             |       CASE WHEN grouping(ug) = 1 THEN -1 ELSE ug END AS ug,
             |       count(*) AS ct,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM $fromSql
             |GROUP BY ROLLUP(event_type, ug) ORDER BY et, ug""".stripMargin)
      case 1 => // CUBE (event_type, ug): all 4 grouping levels
        Fuzz(name,
          (s, d) => base(s, d)
            .cube(col("event_type"), col("ug"))
            .agg(grouping(col("event_type")).as("__g1"),
              grouping(col("ug")).as("__g2"),
              count(lit(1)).as("ct"),
              min(col("event_id")).as("min_id"),
              max(col("event_id")).as("max_id"))
            .select(etSentinel, ugSentinel, col("ct"), col("min_id"),
              col("max_id"))
            .orderBy("et", "ug"),
          s"""SELECT CASE WHEN grouping(event_type) = 1 THEN 'ALL'
             |            ELSE event_type END AS et,
             |       CASE WHEN grouping(ug) = 1 THEN -1 ELSE ug END AS ug,
             |       count(*) AS ct, min(event_id) AS min_id,
             |       max(event_id) AS max_id
             |FROM $fromSql
             |GROUP BY CUBE(event_type, ug) ORDER BY et, ug""".stripMargin)
      case 2 => // explicit GROUPING SETS ((et),(ug),()) vs a UNION ALL
        // of plain aggregates — the engine's expansion checked against
        // a derivation that never mentions grouping sets
        Fuzz(name,
          (s, d) => {
            val b = base(s, d)
            val byType = b.groupBy(col("event_type"))
              .agg(count(lit(1)).as("ct"))
              .select(col("event_type").as("et"), lit(-1L).as("ug"),
                col("ct"))
            val byUg = b.groupBy(col("ug"))
              .agg(count(lit(1)).as("ct"))
              .select(lit("ALL").as("et"), col("ug"), col("ct"))
            val global = b.agg(count(lit(1)).as("ct"))
              .select(lit("ALL").as("et"), lit(-1L).as("ug"), col("ct"))
            byType.unionByName(byUg).unionByName(global)
              .orderBy("et", "ug")
          },
          s"""SELECT CASE WHEN grouping(event_type) = 1 THEN 'ALL'
             |            ELSE event_type END AS et,
             |       CASE WHEN grouping(ug) = 1 THEN -1 ELSE ug END AS ug,
             |       count(*) AS ct
             |FROM $fromSql
             |GROUP BY GROUPING SETS ((event_type), (ug), ())
             |ORDER BY et, ug""".stripMargin)
      case _ => // FILTER-clause aggregates vs the when()-projection twin
        val t = 50 + rng.nextInt(150)
        val r = rng.nextInt(2)
        Fuzz(name,
          (s, d) => base(s, d)
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("ct"),
              count(when(col("value") > t, 1)).as("hi_ct"),
              sum(when(col("ug") % 2 === r, col("event_id")))
                .cast("bigint").as("sel_sum"),
              min(when(col("ug") % 2 =!= r, col("event_id")))
                .as("other_min"))
            .orderBy("event_type"),
          s"""SELECT event_type, count(*) AS ct,
             |       count(*) FILTER (WHERE value > $t) AS hi_ct,
             |       CAST(sum(event_id) FILTER (WHERE ug % 2 = $r)
             |            AS BIGINT) AS sel_sum,
             |       min(event_id) FILTER (WHERE ug % 2 <> $r) AS other_min
             |FROM $fromSql
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
    }
  }

  /** Advanced window-frame + navigation shapes (index space ≥9000):
    * the frame surface the ≥3000 space does not sweep — NTILE
    * bucketing, PERCENT_RANK/CUME_DIST distribution functions,
    * bounded sliding ROWS frames (j PRECEDING .. k FOLLOWING),
    * integer RANGE frames, FIRST_VALUE/LAST_VALUE/NTH_VALUE with an
    * explicit full frame, and deep LAG/LEAD with non-null defaults.
    * Dialect guard-rails: NTILE only over a TOTAL order (its
    * remainder-bucket convention is shared, but peer assignment
    * within ties is not); PERCENT_RANK/CUME_DIST emit raw float64 —
    * each is ONE correctly-rounded IEEE division of two exact small
    * integers, so both engines produce bit-identical doubles (the
    * same rationale as the scalar-max thresholds in the ≥6000
    * space); LAST_VALUE always rides an explicit UNBOUNDED FOLLOWING
    * frame (the default frame ends at CURRENT ROW, a classic
    * cross-engine trap — pinned explicitly so the differential tests
    * the frame clause, not the default); RANGE frames order by an
    * integer key so the frame bound arithmetic is exact. */
  private def genAdvWindow(i: Int, rng: Random, pc: Column, ps: String,
                           name: String): Fuzz = {
    import org.apache.spark.sql.expressions.Window
    val byType = rng.nextBoolean()
    val m = 2 + rng.nextInt(9)
    val keySql = if (byType) "event_type" else s"user_id % $m"
    val keyCol: Column = if (byType) col("event_type") else col("user_id") % m
    rng.nextInt(6) match {
      case 0 => // NTILE over a total order per key
        val k = 2 + rng.nextInt(6)
        Fuzz(name,
          (s, d) => {
            val w = Window.partitionBy(keyCol).orderBy(col("event_id"))
            graft.core.Tables.events(s, d)
              .filter(pc)
              .select(col("event_id"), col("user_id"), keyCol.as("k"),
                ntile(k).over(w).as("tile"))
              .orderBy("event_id")
          },
          s"""SELECT event_id, user_id, $keySql AS k,
             |       CAST(ntile($k) OVER (PARTITION BY $keySql
             |         ORDER BY event_id) AS INT) AS tile
             |FROM events WHERE $ps ORDER BY event_id""".stripMargin)
      case 1 => // PERCENT_RANK / CUME_DIST over value peers
        Fuzz(name,
          (s, d) => {
            val w = Window.partitionBy(keyCol)
              .orderBy(round(col("value"), 2).desc)
            graft.core.Tables.events(s, d)
              .filter(pc)
              .select(col("event_id"), col("user_id"), keyCol.as("k"),
                percent_rank().over(w).as("pr"),
                cume_dist().over(w).as("cd"))
              .orderBy("event_id")
          },
          s"""SELECT event_id, user_id, $keySql AS k,
             |       percent_rank() OVER (PARTITION BY $keySql
             |         ORDER BY round(value, 2) DESC) AS pr,
             |       cume_dist() OVER (PARTITION BY $keySql
             |         ORDER BY round(value, 2) DESC) AS cd
             |FROM events WHERE $ps ORDER BY event_id""".stripMargin)
      case 2 => // bounded sliding ROWS frame: j PRECEDING .. k FOLLOWING
        val p = 1 + rng.nextInt(4); val f = rng.nextInt(4)
        val endSql = if (f == 0) "CURRENT ROW" else s"$f FOLLOWING"
        Fuzz(name,
          (s, d) => {
            val w = Window.partitionBy(keyCol).orderBy(col("event_id"))
              .rowsBetween(-p, f)
            graft.core.Tables.events(s, d)
              .filter(pc)
              .select(col("event_id"), col("user_id"), keyCol.as("k"),
                sum(col("event_id")).over(w).as("win_sum"),
                count(lit(1)).over(w).as("win_ct"),
                min(round(col("value"), 2)).over(w).as("win_min"),
                max(round(col("value"), 2)).over(w).as("win_max"))
              .orderBy("event_id")
          },
          s"""SELECT event_id, user_id, $keySql AS k,
             |       CAST(sum(event_id) OVER w AS BIGINT) AS win_sum,
             |       CAST(count(*) OVER w AS BIGINT) AS win_ct,
             |       min(round(value, 2)) OVER w AS win_min,
             |       max(round(value, 2)) OVER w AS win_max
             |FROM events WHERE $ps
             |WINDOW w AS (PARTITION BY $keySql ORDER BY event_id
             |  ROWS BETWEEN $p PRECEDING AND $endSql)
             |ORDER BY event_id""".stripMargin)
      case 3 => // integer RANGE frame on user_id (peers all included)
        val r = 2 + rng.nextInt(8)
        Fuzz(name,
          (s, d) => {
            val w = Window.partitionBy(col("event_type"))
              .orderBy(col("user_id")).rangeBetween(-r, 0)
            graft.core.Tables.events(s, d)
              .filter(pc)
              .select(col("event_id"), col("user_id"),
                col("event_type").as("k"),
                count(lit(1)).over(w).as("near_ct"),
                sum(col("user_id")).over(w).as("near_uid_sum"))
              .orderBy("event_id")
          },
          s"""SELECT event_id, user_id, event_type AS k,
             |       CAST(count(*) OVER w AS BIGINT) AS near_ct,
             |       CAST(sum(user_id) OVER w AS BIGINT) AS near_uid_sum
             |FROM events WHERE $ps
             |WINDOW w AS (PARTITION BY event_type ORDER BY user_id
             |  RANGE BETWEEN $r PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)
      case 4 => // FIRST/LAST/NTH_VALUE over an explicit full frame
        val n = 2 + rng.nextInt(3)
        Fuzz(name,
          (s, d) => {
            val w = Window.partitionBy(keyCol)
              .orderBy(round(col("value"), 2).desc, col("event_id"))
              .rowsBetween(Window.unboundedPreceding,
                Window.unboundedFollowing)
            graft.core.Tables.events(s, d)
              .filter(pc)
              .select(col("event_id"), col("user_id"), keyCol.as("k"),
                first_value(col("event_id")).over(w).as("top_id"),
                last_value(col("event_id")).over(w).as("bot_id"),
                nth_value(col("event_id"), n).over(w).as("nth_id"))
              .orderBy("event_id")
          },
          s"""SELECT event_id, user_id, $keySql AS k,
             |       first_value(event_id) OVER w AS top_id,
             |       last_value(event_id) OVER w AS bot_id,
             |       nth_value(event_id, $n) OVER w AS nth_id
             |FROM events WHERE $ps
             |WINDOW w AS (PARTITION BY $keySql
             |  ORDER BY round(value, 2) DESC, event_id
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY event_id""".stripMargin)
      case _ => // deep LAG/LEAD with a non-null default
        val off = 2 + rng.nextInt(2); val dflt = rng.nextInt(1000)
        Fuzz(name,
          (s, d) => {
            val w = Window.partitionBy(keyCol).orderBy(col("event_id"))
            graft.core.Tables.events(s, d)
              .filter(pc)
              .select(col("event_id"), col("user_id"), keyCol.as("k"),
                lag(col("event_id"), off, dflt.toLong).over(w).as("lag_d"),
                lead(col("event_id"), off, dflt.toLong).over(w)
                  .as("lead_d"))
              .orderBy("event_id")
          },
          s"""SELECT event_id, user_id, $keySql AS k,
             |       lag(event_id, $off, $dflt) OVER (PARTITION BY $keySql
             |         ORDER BY event_id) AS lag_d,
             |       lead(event_id, $off, $dflt) OVER (PARTITION BY $keySql
             |         ORDER BY event_id) AS lead_d
             |FROM events WHERE $ps ORDER BY event_id""".stripMargin)
    }
  }

  /** String-function shapes (index space ≥10000): the scalar string
    * surface swept between the fixed `f_scalar_functions` pins —
    * length/upper/substring, translate/lpad/rpad/reverse,
    * md5-bucketed grouping, instr/ascii arithmetic, split_part over
    * constructed delimited strings, and left/right/repeat. Dialect
    * guard-rails: everything stays ASCII over the closed event_type
    * alphabet (no collation/locale surface); int→string casts are
    * written `CAST(x AS STRING)` (both engines accept STRING);
    * `startswith` is avoided (Spark) vs `starts_with` (DuckDB) — LIKE
    * carries prefix tests; lpad/rpad 3-arg truncate-or-pad semantics
    * and 1-based instr/substring are shared; md5 hex is lowercase in
    * both. */
  private def genStringFns(i: Int, rng: Random, pc: Column, ps: String,
                           name: String): Fuzz = {
    val letters = "cesuv"
    rng.nextInt(6) match {
      case 0 => // length/upper/substring projection + LIKE filter
        val k = 2 + rng.nextInt(4)
        val ch = letters(rng.nextInt(letters.length))
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc && col("event_type").like(s"%$ch%"))
            .select(col("event_id"), col("event_type"),
              length(col("event_type")).as("len"),
              upper(col("event_type")).as("up"),
              substring(col("event_type"), 1, k).as("pre"))
            .orderBy("event_id"),
          s"""SELECT event_id, event_type,
             |       length(event_type) AS len,
             |       upper(event_type) AS up,
             |       substring(event_type, 1, $k) AS pre
             |FROM events WHERE ($ps) AND event_type LIKE '%$ch%'
             |ORDER BY event_id""".stripMargin)
      case 1 => // translate / lpad / rpad / reverse
        val n = 6 + rng.nextInt(5)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"),
              translate(col("event_type"), "aeiou", "AEIOU").as("tr"),
              lpad(col("event_type"), n, "_").as("lp"),
              rpad(col("event_type"), n, "*").as("rp"),
              reverse(col("event_type")).as("rev"))
            .orderBy("event_id"),
          s"""SELECT event_id,
             |       translate(event_type, 'aeiou', 'AEIOU') AS tr,
             |       lpad(event_type, $n, '_') AS lp,
             |       rpad(event_type, $n, '*') AS rp,
             |       reverse(event_type) AS rev
             |FROM events WHERE $ps ORDER BY event_id""".stripMargin)
      case 2 => // md5-bucketed grouping over a constructed key
        val m = 2 + rng.nextInt(9)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(substring(md5(concat(col("event_type"), lit("_"),
              (col("user_id") % m).cast("string"))), 1, 1).as("bucket"))
            .agg(count(lit(1)).as("ct"),
              min(col("event_id")).as("min_id"),
              max(col("event_id")).as("max_id"))
            .orderBy("bucket"),
          s"""SELECT substring(md5(concat(event_type, '_',
             |         CAST(user_id % $m AS STRING))), 1, 1) AS bucket,
             |       count(*) AS ct, min(event_id) AS min_id,
             |       max(event_id) AS max_id
             |FROM events WHERE $ps
             |GROUP BY 1 ORDER BY bucket""".stripMargin)
      case 3 => // instr / ascii arithmetic
        val subs = Seq("ck", "ic", "err", "vi", "up", "se")
        val sub = subs(rng.nextInt(subs.length))
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"), col("event_type"),
              instr(col("event_type"), sub).as("pos"),
              ascii(col("event_type")).as("first_code"),
              (instr(col("event_type"), sub) > 0).as("has_sub"))
            .orderBy("event_id"),
          s"""SELECT event_id, event_type,
             |       instr(event_type, '$sub') AS pos,
             |       ascii(event_type) AS first_code,
             |       instr(event_type, '$sub') > 0 AS has_sub
             |FROM events WHERE $ps ORDER BY event_id""".stripMargin)
      case 4 => // split_part over a constructed delimited string
        val m = 2 + rng.nextInt(9); val m2 = 2 + rng.nextInt(9)
        Fuzz(name,
          (s, d) => {
            val packed = concat(col("event_type"), lit(","),
              (col("event_id") % m).cast("string"), lit(","),
              (col("user_id") % m2).cast("string"))
            graft.core.Tables.events(s, d)
              .filter(pc)
              .select(col("event_id"),
                split_part(packed, lit(","), lit(1)).as("p1"),
                split_part(packed, lit(","), lit(2)).as("p2"),
                split_part(packed, lit(","), lit(3)).as("p3"))
              .orderBy("event_id")
          },
          s"""SELECT event_id,
             |       split_part(s, ',', 1) AS p1,
             |       split_part(s, ',', 2) AS p2,
             |       split_part(s, ',', 3) AS p3
             |FROM (SELECT event_id,
             |        concat(event_type, ',', CAST(event_id % $m AS STRING),
             |               ',', CAST(user_id % $m2 AS STRING)) AS s
             |      FROM events WHERE $ps) t
             |ORDER BY event_id""".stripMargin)
      case _ => // left/right/repeat + length HAVING
        val k = 2 + rng.nextInt(3); val lo = 1 + rng.nextInt(30)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(expr(s"left(event_type, $k)").as("pre"),
              expr(s"right(event_type, $k)").as("suf"))
            .agg(count(lit(1)).as("ct"),
              sum(length(repeat(col("event_type"), 2)).cast("bigint"))
                .as("len2_sum"))
            .filter(col("ct") >= lo)
            .orderBy("pre", "suf"),
          s"""SELECT left(event_type, $k) AS pre,
             |       right(event_type, $k) AS suf,
             |       count(*) AS ct,
             |       CAST(sum(length(repeat(event_type, 2))) AS BIGINT)
             |         AS len2_sum
             |FROM events WHERE $ps
             |GROUP BY 1, 2 HAVING count(*) >= $lo
             |ORDER BY pre, suf""".stripMargin)
    }
  }

  /** Timestamp/interval/date-arithmetic shapes (index space ≥11000):
    * the classic Spark-vs-DuckDB drift family — date_trunc bucket
    * boundaries (week/month/quarter/year), month arithmetic on
    * month-end days (both engines CLAMP: Jan 31 + 1 month = Feb 28),
    * EXTRACT field grids, interval ladders crossing midnight, and
    * last_day / first-of-next-month derivations. Dialect guard-rails:
    * DuckDB's DATE + INTERVAL returns TIMESTAMP while Spark keeps
    * DATE, so every interval result is re-CAST to DATE before the
    * STRING cast; negative month shifts are written `x - INTERVAL n
    * MONTH` (DuckDB rejects INTERVAL -n); EXTRACT stays on the
    * year/month/day/doy/hour/minute fields both engines agree on
    * (dow excluded: Sunday=1 vs 0); make_date args are CAST to INT;
    * raw sub-second timestamps are never cast to STRING (fraction
    * formatting differs) — only DATE-cast or EXTRACTed values
    * surface. */
  private def genTsArith(i: Int, rng: Random, pc: Column, ps: String,
                         name: String): Fuzz = {
    rng.nextInt(6) match {
      case 0 => // date_trunc bucket aggregate at a drawn granularity
        val unit = Seq("week", "month", "quarter", "year")(rng.nextInt(4))
        val bkt = s"CAST(CAST(date_trunc('$unit', ts) AS DATE) AS STRING)"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(expr(bkt).as("bkt"))
            .agg(count(lit(1)).as("ct"), min(col("event_id")).as("min_id"))
            .orderBy("bkt"),
          s"""SELECT $bkt AS bkt, count(*) AS ct, min(event_id) AS min_id
             |FROM events WHERE $ps
             |GROUP BY 1 ORDER BY bkt""".stripMargin)
      case 1 => // month arithmetic on order dates (month-end clamping)
        val k = 1 + rng.nextInt(24)
        val op = if (rng.nextBoolean()) "+" else "-"
        val m = 2 + rng.nextInt(9); val r = rng.nextInt(m)
        val shifted = s"CAST(CAST(CAST(o_orderdate AS DATE) $op " +
          s"INTERVAL $k MONTH AS DATE) AS STRING)"
        val eom = "CAST(last_day(CAST(o_orderdate AS DATE)) AS STRING)"
        Fuzz(name,
          (s, d) => graft.core.Tables.orders(s, d)
            .filter(col("o_orderkey") % m === r)
            .select(col("o_orderkey"), expr(shifted).as("shifted"),
              expr(eom).as("eom"))
            .orderBy("o_orderkey"),
          s"""SELECT o_orderkey, $shifted AS shifted, $eom AS eom
             |FROM orders WHERE o_orderkey % $m = $r
             |ORDER BY o_orderkey""".stripMargin)
      case 2 => // EXTRACT field grid (year-month rollup + doy/dom)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(expr("EXTRACT(YEAR FROM ts)").as("y"),
              expr("EXTRACT(MONTH FROM ts)").as("mo"))
            .agg(count(lit(1)).as("ct"),
              min(expr("EXTRACT(DOY FROM ts)")).as("min_doy"),
              max(expr("EXTRACT(DAY FROM ts)")).as("max_dom"))
            .orderBy("y", "mo"),
          s"""SELECT EXTRACT(YEAR FROM ts) AS y,
             |       EXTRACT(MONTH FROM ts) AS mo,
             |       count(*) AS ct,
             |       min(EXTRACT(DOY FROM ts)) AS min_doy,
             |       max(EXTRACT(DAY FROM ts)) AS max_dom
             |FROM events WHERE $ps
             |GROUP BY 1, 2 ORDER BY y, mo""".stripMargin)
      case 3 => // interval ladder crossing midnight
        val mi = 30 + rng.nextInt(600)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"),
              expr(s"CAST(CAST(ts + INTERVAL $mi MINUTE AS DATE) " +
                "AS STRING)").as("sd"),
              expr(s"EXTRACT(HOUR FROM ts + INTERVAL $mi MINUTE)").as("sh"),
              expr(s"EXTRACT(MINUTE FROM ts + INTERVAL $mi MINUTE)")
                .as("sm"))
            .orderBy("event_id"),
          s"""SELECT event_id,
             |       CAST(CAST(ts + INTERVAL $mi MINUTE AS DATE) AS STRING) AS sd,
             |       EXTRACT(HOUR FROM ts + INTERVAL $mi MINUTE) AS sh,
             |       EXTRACT(MINUTE FROM ts + INTERVAL $mi MINUTE) AS sm
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case 4 => // make_date month key + greatest/least date pinning
        val pinM = 1 + rng.nextInt(12)
        val pin = f"2024-$pinM%02d-15"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"),
              expr("CAST(make_date(CAST(EXTRACT(YEAR FROM ts) AS INT), " +
                "CAST(EXTRACT(MONTH FROM ts) AS INT), 1) AS STRING)")
                .as("mkey"),
              expr(s"CAST(greatest(CAST(ts AS DATE), DATE '$pin') " +
                "AS STRING)").as("gd"),
              expr(s"CAST(least(CAST(ts AS DATE), DATE '$pin') " +
                "AS STRING)").as("ld"))
            .orderBy("event_id"),
          s"""SELECT event_id,
             |       CAST(make_date(CAST(EXTRACT(YEAR FROM ts) AS INT),
             |         CAST(EXTRACT(MONTH FROM ts) AS INT), 1) AS STRING) AS mkey,
             |       CAST(greatest(CAST(ts AS DATE), DATE '$pin') AS STRING) AS gd,
             |       CAST(least(CAST(ts AS DATE), DATE '$pin') AS STRING) AS ld
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case _ => // month length + first-of-next-month derivation
        val nxt = "CAST(CAST(last_day(CAST(ts AS DATE)) + INTERVAL 1 DAY " +
          "AS DATE) AS STRING)"
        val mlen = "EXTRACT(DAY FROM last_day(CAST(ts AS DATE)))"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(expr(nxt).as("nxt"), expr(mlen).as("mlen"))
            .agg(count(lit(1)).as("ct"), max(col("event_id")).as("max_id"))
            .orderBy("nxt", "mlen"),
          s"""SELECT $nxt AS nxt, $mlen AS mlen,
             |       count(*) AS ct, max(event_id) AS max_id
             |FROM events WHERE $ps
             |GROUP BY 1, 2 ORDER BY nxt, mlen""".stripMargin)
    }
  }

  /** DECIMAL-arithmetic shapes (index space ≥12000): precision/scale
    * propagation in multiply, terminating division, SUM widening,
    * rounding at scale cuts, mixed-scale add chains, and decimal
    * compare/min/max/mod — the classic engine-drift family after
    * timestamps. Dialect guard-rails (each probed empirically):
    * operands derive from BIGINT columns plus exact decimal literals,
    * never from DOUBLE columns (double→decimal conversion at ULP
    * boundaries is its own drift family); every surfaced decimal is
    * CAST to one explicit DECIMAL(p,s) in BOTH renderings (Spark and
    * DuckDB propagate different result types — e.g. sum(DECIMAL(14,3))
    * is DECIMAL(24,3) in Spark but DECIMAL(38,3) in DuckDB — and the
    * driver compares string forms, which carry the scale); division
    * denominators are powers of TWO only (DuckDB decimal division
    * returns DOUBLE, so the quotient must be binary-exact for the
    * explicit re-CAST to agree with Spark's all-decimal path);
    * scale-REDUCING casts are value-exact only — a tie at the cut
    * digit rounds HALF_UP in Spark but HALF_EVEN in DuckDB's CAST
    * (2.5 → 3 vs 2) — while round() ties are fine (both round away
    * from zero); AVG over decimal is excluded (DuckDB returns
    * DOUBLE); decimal overflow is excluded as untestable by oracle
    * (Spark non-ANSI yields NULL, DuckDB raises).
    *
    * RENDERING guard-rail (learned from the r9 driver reds, which the
    * local duckdb-1.0.0 mirror could not reproduce): the driver's
    * oracle materialization coerces DECIMAL results to float64 while
    * Spark's parquet output keeps the declared decimal scale, so a
    * value whose shortest float rendering is shorter than its scale
    * ("12.005" vs "12.00500") hash-mismatches even when numerically
    * identical. Every shape whose surfaced value can carry scale
    * trailing zeros (multiply / divide / SUM-widening) therefore
    * CASTs the final decimal to STRING in BOTH renderings — both
    * engines pad decimal→string to the declared scale, making the
    * comparison rendering-independent. The round / mixed-add /
    * min-max-mod shapes construct values whose final scale digit is
    * provably nonzero (.125/.625/.96875 tails) and stay raw DECIMAL,
    * keeping direct decimal-value coverage (driver-green in r9). */
  private def genDecimal(i: Int, rng: Random, pc: Column, ps: String,
                         name: String): Fuzz = {
    rng.nextInt(6) match {
      case 0 => // multiply propagation: (12,3) x (12,2) -> scale 5 exact
        val m = 7 + rng.nextInt(90)
        val fa = Seq("0.125", "0.375", "0.625", "0.875")(rng.nextInt(4))
        val fb = Seq("0.04", "0.08", "0.16", "0.32")(rng.nextInt(4))
        val a = s"(CAST(user_id % $m AS DECIMAL(12,3)) + " +
          s"CAST($fa AS DECIMAL(12,3)))"
        val b = s"(CAST(event_id % 11 AS DECIMAL(12,2)) + " +
          s"CAST($fb AS DECIMAL(12,2)))"
        // surfaced as STRING: both engines pad CAST(dec AS STRING) to
        // the declared scale ("12.00500"), which survives an oracle
        // materialization that coerces DECIMAL to float64 (where the
        // shortest-repr "12.005" would hash-mismatch the scale-5 form)
        val prod = s"CAST(CAST($a * $b AS DECIMAL(30,5)) AS STRING)"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"), expr(prod).as("prod"))
            .orderBy("event_id"),
          s"""SELECT event_id, $prod AS prod
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case 1 => // terminating division (pow-2 denominators only)
        val den = Seq("2", "4", "8", "16", "32", "0.5", "0.25")(
          rng.nextInt(7))
        val m = 50 + rng.nextInt(400)
        val a = s"CAST(user_id % $m AS DECIMAL(18,3))"
        val quot = s"CAST(CAST($a / CAST($den AS DECIMAL(9,2)) " +
          "AS DECIMAL(24,6)) AS STRING)" // STRING-pinned, see case 0
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"), expr(quot).as("quot"))
            .orderBy("event_id"),
          s"""SELECT event_id, $quot AS quot
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case 2 => // SUM widening: explicit re-CAST pins both engines' types
        val m = 13 + rng.nextInt(200)
        val f = Seq("0.125", "0.250", "0.375")(rng.nextInt(3))
        val a = s"(CAST(user_id % $m AS DECIMAL(14,3)) + " +
          s"CAST($f AS DECIMAL(14,3)))"
        val tot = s"CAST(CAST(SUM($a) AS DECIMAL(38,3)) AS STRING)" // STRING-pinned, see case 0
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(col("event_type"))
            .agg(expr(tot).as("tot"), count(lit(1)).as("ct"))
            .orderBy("event_type"),
          s"""SELECT event_type, $tot AS tot, count(*) AS ct
             |FROM events WHERE $ps
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      case 3 => // round() at a scale cut, ties and negatives included
        val m = 16 + rng.nextInt(160)
        val off = m / 2
        // k/8 has exactly the .x25/.x50/.x75 tails whose round(.,1)
        // drops 0.025/0.050/0.075 — including the exact tie, which
        // both engines' round() takes away from zero
        val a = s"(CAST((user_id % $m) - $off AS DECIMAL(14,3)) / " +
          "CAST(8 AS DECIMAL(4,0)))"
        val r1 = s"CAST(round($a, 1) AS DECIMAL(16,1))"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"), expr(r1).as("r1"))
            .orderBy("event_id"),
          s"""SELECT event_id, $r1 AS r1
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case 4 => // mixed-scale add/subtract chain -> widest scale, exact
        val m = 9 + rng.nextInt(120)
        val a = s"CAST(user_id % $m AS DECIMAL(12,2))"
        val b = s"CAST(event_id % 7 AS DECIMAL(12,5))"
        val c = "CAST(0.03125 AS DECIMAL(8,5))"
        val sumc = s"CAST($a + $b - $c AS DECIMAL(26,5))"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"), expr(sumc).as("mix"))
            .orderBy("event_id"),
          s"""SELECT event_id, $sumc AS mix
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case _ => // decimal compare + min/max/mod aggregate
        val m = 11 + rng.nextInt(140)
        val k = 2 + rng.nextInt(5)
        val a = s"(CAST(user_id % $m AS DECIMAL(16,3)) + " +
          "CAST(0.125 AS DECIMAL(16,3)))"
        val lo = s"CAST(${m / 3} AS DECIMAL(10,2))"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc).filter(expr(s"$a > $lo"))
            .groupBy(expr(s"user_id % $k").as("grp"))
            .agg(expr(s"CAST(min($a) AS DECIMAL(20,3))").as("mn"),
              expr(s"CAST(max($a) AS DECIMAL(20,3))").as("mx"),
              expr(s"CAST(min($a % CAST(2.5 AS DECIMAL(6,1))) " +
                "AS DECIMAL(20,3))").as("mmod"),
              count(lit(1)).as("ct"))
            .orderBy("grp"),
          s"""SELECT user_id % $k AS grp,
             |       CAST(min($a) AS DECIMAL(20,3)) AS mn,
             |       CAST(max($a) AS DECIMAL(20,3)) AS mx,
             |       CAST(min($a % CAST(2.5 AS DECIMAL(6,1))) AS DECIMAL(20,3)) AS mmod,
             |       count(*) AS ct
             |FROM events WHERE $ps AND $a > $lo
             |GROUP BY 1 ORDER BY grp""".stripMargin)
    }
  }

  /** FLOAT/DOUBLE-semantics shapes (index space ≥13000): NaN/Infinity
    * taxonomy (grouping, ordering-as-greatest, aggregate
    * propagation), exact integer-valued double sums, IEEE
    * floor/ceil/abs/sign/round grids on binary-exact k/4 values,
    * transcendentals, greatest/least null-skipping with NaN, and
    * fmod sign behavior. Dialect guard-rails (each probed
    * empirically): NaN/Infinity literals are `CAST('NaN'/'Infinity'
    * AS DOUBLE)` (both engines parse them; both group all NaNs as one
    * key, compare NaN greatest-and-equal-to-itself, and propagate
    * NaN through sum/max); double→INTEGRAL casts are EXCLUDED (Spark
    * truncates, DuckDB rounds half-even: 2.7 → 2 vs 3); x/0.0 is
    * EXCLUDED (Spark IEEE Infinity, DuckDB NULL); sqrt of negatives
    * EXCLUDED (Spark NaN, DuckDB raises); doubles never cast to
    * STRING (formatting drift) — raw doubles surface through the
    * driver's 6-significant-digit normalization, which absorbs libm
    * ULP differences in the transcendental pins; non-integer-valued
    * SUM operands stay binary-exact (k/4, k/8) so accumulation order
    * can't drift the total; signed zero is never surfaced as a group
    * key (Spark normalizes -0.0 to 0.0, DuckDB keeps the sign bit);
    * round() ties on doubles agree (both away from zero — while CAST
    * ties don't, same split the DECIMAL space documents).
    *
    * RENDERING guard-rail (r9 driver reds): surfaced dtypes are pinned
    * wherever the two engines' RESULT TYPES differ even when values
    * agree — Spark floor/ceil(DOUBLE) return BIGINT vs DuckDB DOUBLE,
    * Spark sign returns DOUBLE vs DuckDB integer, and DuckDB widens
    * sum(int) to HUGEINT (float64 after a pandas materialization) vs
    * Spark BIGINT. Such results are CAST to BIGINT in BOTH renderings
    * (value-exact: every pinned cast is over a provably-integral
    * value, so truncation vs half-even rounding agree); the fmod shape
    * surfaces (rem*4) AS BIGINT, which is exact on quarter-grid
    * operands and also absorbs IEEE -0.0 and DuckDB's decimal-typed
    * remainder path. Raw DOUBLE columns (sums of integral doubles,
    * k/4 abs, transcendentals, NaN/Inf extremes) are float64 on both
    * sides and stay unpinned — all driver-green in r9. */
  private def genFloat(i: Int, rng: Random, pc: Column, ps: String,
                       name: String): Fuzz = {
    rng.nextInt(6) match {
      case 0 => // NaN/Infinity taxonomy: grouping + aggregate propagation
        val m = 7 + rng.nextInt(16)
        val y = s"CASE WHEN user_id % $m = 0 THEN CAST('NaN' AS DOUBLE) " +
          s"WHEN user_id % $m = 1 THEN CAST('Infinity' AS DOUBLE) " +
          s"ELSE CAST(user_id % 97 AS DOUBLE) / 8.0 END"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(col("event_type"))
            // integer-operand sums are CAST to BIGINT in BOTH
            // renderings: DuckDB widens sum(int) to HUGEINT, which an
            // oracle materialization through pandas coerces to float64
            // ("5.0") while Spark's BIGINT stays int64 ("5") — the
            // driver-hash drift family behind the r9 nansum reds.
            // count(*) needs no pin (BIGINT in both engines).
            .agg(expr(s"CAST(sum(CASE WHEN isnan($y) THEN 1 ELSE 0 " +
                "END) AS BIGINT)").as("nan_ct"),
              expr(s"CAST(sum(CASE WHEN NOT isnan($y) AND $y > 1.7e308 " +
                "THEN 1 ELSE 0 END) AS BIGINT)").as("inf_ct"),
              expr(s"max($y)").as("mx"), // NaN when any row is NaN
              expr(s"min($y)").as("mn"),
              count(lit(1)).as("ct"))
            .orderBy("event_type"),
          s"""SELECT event_type,
             |       CAST(sum(CASE WHEN isnan($y) THEN 1 ELSE 0 END) AS BIGINT) AS nan_ct,
             |       CAST(sum(CASE WHEN NOT isnan($y) AND $y > 1.7e308 THEN 1 ELSE 0 END) AS BIGINT) AS inf_ct,
             |       max($y) AS mx, min($y) AS mn, count(*) AS ct
             |FROM events WHERE $ps
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      case 1 => // exact integer-valued double sums (order-free)
        val m = 23 + rng.nextInt(300)
        val a = s"CAST(user_id % $m AS DOUBLE)"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(col("event_type"))
            .agg(expr(s"sum($a)").as("tot"),
              expr(s"sum($a * $a)").as("tot_sq"),
              count(lit(1)).as("ct"))
            .orderBy("event_type"),
          s"""SELECT event_type, sum($a) AS tot, sum($a * $a) AS tot_sq,
             |       count(*) AS ct
             |FROM events WHERE $ps
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      case 2 => // IEEE floor/ceil/abs/sign/round grid on exact k/4
        val m = 16 + rng.nextInt(200)
        val off = m / 2
        val x = s"(CAST((user_id % $m) - $off AS DOUBLE) / 4.0)"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            // result dtypes pinned to BIGINT in BOTH renderings: Spark
            // floor/ceil(DOUBLE) already return BIGINT where DuckDB
            // returns DOUBLE ("3" vs "3.0" under the driver hash), and
            // sign is DOUBLE in Spark vs integer in DuckDB — the r9
            // floorgrid reds. The BIGINT casts are value-exact (every
            // surfaced value is integral, so Spark's truncating cast
            // and DuckDB's rounding cast agree); ab stays raw DOUBLE
            // (k/4 is binary-exact, DOUBLE in both engines).
            .select(col("event_id"),
              expr(s"CAST(floor($x) AS BIGINT)").as("fl"),
              expr(s"CAST(ceil($x) AS BIGINT)").as("ce"),
              expr(s"abs($x)").as("ab"),
              expr(s"CAST(sign($x) AS BIGINT)").as("sg"),
              // .5 ties away from zero in both engines
              expr(s"CAST(round($x) AS BIGINT)").as("rd"))
            .orderBy("event_id"),
          s"""SELECT event_id, CAST(floor($x) AS BIGINT) AS fl,
             |       CAST(ceil($x) AS BIGINT) AS ce, abs($x) AS ab,
             |       CAST(sign($x) AS BIGINT) AS sg,
             |       CAST(round($x) AS BIGINT) AS rd
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case 3 => // transcendentals through the 6-sig-digit norm
        val m = 9 + rng.nextInt(40)
        val x = s"(1.0 + CAST(user_id % $m AS DOUBLE) / 8.0)"
        val e = s"(CAST(user_id % 13 AS DOUBLE) / 4.0)"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"),
              expr(s"ln($x)").as("lx"), expr(s"sqrt($x)").as("qx"),
              expr(s"exp($e)").as("ex"),
              expr(s"power($x, 2.0)").as("px"))
            .orderBy("event_id"),
          s"""SELECT event_id, ln($x) AS lx, sqrt($x) AS qx,
             |       exp($e) AS ex, power($x, 2.0) AS px
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case 4 => // greatest/least: null-skipping + NaN-greatest, both
        val m = 9 + rng.nextInt(20)
        val y = s"CASE WHEN user_id % $m = 0 THEN CAST(NULL AS DOUBLE) " +
          s"WHEN user_id % $m = 1 THEN CAST('NaN' AS DOUBLE) " +
          s"ELSE CAST(user_id % 31 AS DOUBLE) / 2.0 END"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"),
              expr(s"greatest($y, 5.0)").as("g5"),
              expr(s"least($y, 5.0)").as("l5"),
              expr(s"coalesce($y, -1.0)").as("co"))
            .orderBy("event_id"),
          s"""SELECT event_id, greatest($y, 5.0) AS g5,
             |       least($y, 5.0) AS l5, coalesce($y, -1.0) AS co
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case _ => // fmod: C-style remainder, sign of the dividend (both)
        val m = 16 + rng.nextInt(120)
        val off = m / 2
        val x = s"(CAST((user_id % $m) - $off AS DOUBLE) / 4.0)"
        val den = Seq("2.0", "4.0", "0.5", "1.5")(rng.nextInt(4))
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            // surfaced as exact quarter-counts: x and every denominator
            // are multiples of 1/4, so the C-style remainder is too —
            // (rem*4) is an exact integer, CAST AS BIGINT is identical
            // under Spark's truncation and DuckDB's rounding, and the
            // pin also normalizes IEEE -0.0 (Spark keeps the sign bit
            // on an exact-multiple remainder; -0.0*4 casts to 0) and
            // DuckDB's decimal-typed remainder path (its "2.0" literal
            // is DECIMAL, so x % den computes in DECIMAL and would
            // otherwise surface float64 vs Spark's DOUBLE) — the r9
            // fmod reds.
            .select(col("event_id"),
              expr(s"CAST(($x % $den) * 4 AS BIGINT)").as("md"),
              expr(s"CAST(abs($x % $den) * 4 AS BIGINT)").as("amd"))
            .orderBy("event_id"),
          s"""SELECT event_id, CAST(($x % $den) * 4 AS BIGINT) AS md,
             |       CAST(abs($x % $den) * 4 AS BIGINT) AS amd
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
    }
  }

  /** Type-coercion + DISTINCT-aggregate shapes (index space ≥14000):
    * numeric↔string comparison coercion, DISTINCT aggregates with
    * NULL operands (both engines exclude them), CASE/COALESCE branch
    * type unification (int↔decimal), binary-collation string min/max
    * (uppercase sorts before lowercase in BOTH engines' default byte
    * order), concat/|| implicit casts, LIKE over stringified numbers,
    * and UNION branch unification. Dialect guard-rails (probed):
    * multi-column `count(DISTINCT a, b)` is EXCLUDED (Spark-only
    * syntax; DuckDB wants a row-value tuple); string→numeric
    * coercion only ever sees well-formed numeric strings built from
    * BIGINT columns (a malformed cast is NULL in Spark, an ERROR in
    * DuckDB); unified branch types are re-CAST to one explicit
    * DECIMAL (the engines unify to different precisions).
    *
    * RENDERING guard-rail (r9 driver reds): surfaced DECIMALs are
    * CAST to STRING (scale-padded identically by both engines) and
    * sum(DISTINCT int) goes through CAST(.. AS BIGINT) then STRING —
    * DuckDB's HUGEINT sum turns into float64 under the driver's
    * oracle materialization ("42.0" vs Spark's int64 "42"), and the
    * union shape's scale-2 sums ("7.50") collapse to shortest-repr
    * floats ("7.5"). count aggregates are BIGINT in both engines and
    * stay raw; string min/max, lex-compare and concat shapes surface
    * strings/small ints and were driver-green unpinned. */
  private def genCoerce(i: Int, rng: Random, pc: Column, ps: String,
                        name: String): Fuzz = {
    rng.nextInt(6) match {
      case 0 => // numeric-string comparisons: lexicographic AND coerced
        val m = 20 + rng.nextInt(80)
        val k = rng.nextInt(10)
        val lex = s"CAST(user_id % $m AS STRING) > '2'"   // byte order
        val num = s"user_id % $m = '$k'"                  // string -> int
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"),
              expr(s"CASE WHEN $lex THEN 1 ELSE 0 END").as("lex_gt"),
              expr(s"CASE WHEN $num THEN 1 ELSE 0 END").as("num_eq"))
            .orderBy("event_id"),
          s"""SELECT event_id,
             |       CASE WHEN $lex THEN 1 ELSE 0 END AS lex_gt,
             |       CASE WHEN $num THEN 1 ELSE 0 END AS num_eq
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case 1 => // DISTINCT aggregates with NULL operands
        val m = 5 + rng.nextInt(9)
        val w = 7 + rng.nextInt(30)
        val x = s"CASE WHEN user_id % $m = 0 THEN NULL " +
          s"ELSE user_id % $w END"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(col("event_type"))
            // dsum is STRING-pinned through an explicit BIGINT: DuckDB
            // widens sum(int) to HUGEINT, which an oracle
            // materialization through pandas coerces to float64
            // ("42.0") while Spark's BIGINT stays int64 ("42") — the
            // r9 distinct-shape reds; the STRING layer also keeps an
            // all-NULL-operand group (NULL sum) dtype-stable. count
            // aggregates are BIGINT in both engines and stay raw.
            .agg(expr(s"count(DISTINCT $x)").as("dct"),
              expr(s"CAST(CAST(sum(DISTINCT $x) AS BIGINT) AS STRING)")
                .as("dsum"),
              expr(s"count($x)").as("ct_x"), // nulls excluded
              count(lit(1)).as("ct_all"))   // nulls counted
            .orderBy("event_type"),
          s"""SELECT event_type, count(DISTINCT $x) AS dct,
             |       CAST(CAST(sum(DISTINCT $x) AS BIGINT) AS STRING) AS dsum,
             |       count($x) AS ct_x, count(*) AS ct_all
             |FROM events WHERE $ps
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      case 2 => // CASE/COALESCE branch unification (int vs decimal)
        val m = 6 + rng.nextInt(20)
        val f = Seq("2.5", "0.25", "7.5")(rng.nextInt(3))
        // STRING-pinned (scale-2 rendering survives a float64-coercing
        // oracle materialization — same family as the DECIMAL space)
        val c = s"CAST(CAST(CASE WHEN user_id % $m = 0 THEN user_id % 9 " +
          s"ELSE $f END AS DECIMAL(12,2)) AS STRING)"
        val co = s"CAST(CAST(coalesce(nullif(user_id % 5, 0), $f) " +
          "AS DECIMAL(12,2)) AS STRING)"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"), expr(c).as("unified"),
              expr(co).as("co"))
            .orderBy("event_id"),
          s"""SELECT event_id, $c AS unified, $co AS co
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case 3 => // binary-collation string min/max over mixed case
        val tag = Seq("Z", "a", "M")(rng.nextInt(3))
        val sfx = s"concat('$tag-', event_type)"
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .groupBy(expr("user_id % 4").as("grp"))
            .agg(expr(s"min($sfx)").as("mn"),
              expr(s"max($sfx)").as("mx"),
              expr("min(event_type)").as("mnt"),
              count(lit(1)).as("ct"))
            .orderBy("grp"),
          s"""SELECT user_id % 4 AS grp, min($sfx) AS mn,
             |       max($sfx) AS mx, min(event_type) AS mnt,
             |       count(*) AS ct
             |FROM events WHERE $ps
             |GROUP BY 1 ORDER BY grp""".stripMargin)
      case 4 => // concat/|| implicit casts + LIKE over stringified ints
        val m = 50 + rng.nextInt(300)
        val p = 1 + rng.nextInt(3)
        Fuzz(name,
          (s, d) => graft.core.Tables.events(s, d)
            .filter(pc)
            .select(col("event_id"),
              expr(s"concat('u', user_id % $m)").as("cc"),
              expr(s"'e' || (event_id % 100)").as("pp"),
              expr(s"CASE WHEN CAST(user_id % $m AS STRING) " +
                s"LIKE '$p%' THEN 1 ELSE 0 END").as("lk"))
            .orderBy("event_id"),
          s"""SELECT event_id, concat('u', user_id % $m) AS cc,
             |       'e' || (event_id % 100) AS pp,
             |       CASE WHEN CAST(user_id % $m AS STRING) LIKE '$p%' THEN 1 ELSE 0 END AS lk
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case _ => // UNION branch unification (int vs decimal), re-CAST
        val m = 4 + rng.nextInt(12)
        val f = Seq("1.25", "3.5")(rng.nextInt(2))
        Fuzz(name,
          (s, d) => {
            val e = graft.core.Tables.events(s, d).filter(pc)
            e.selectExpr("event_id", s"CAST(user_id % $m AS DECIMAL(12,2)) AS v")
              .union(e.selectExpr("event_id",
                s"CAST($f AS DECIMAL(12,2)) AS v"))
              .groupBy(col("event_id")).agg(
                // STRING-pinned: scale-2 rendering ("7.50") survives a
                // float64-coercing oracle materialization ("7.5")
                expr("CAST(CAST(sum(v) AS DECIMAL(20,2)) AS STRING)")
                  .as("sv"),
                count(lit(1)).as("ct"))
              .orderBy("event_id")
          },
          s"""SELECT event_id, CAST(CAST(sum(v) AS DECIMAL(20,2)) AS STRING) AS sv,
             |       count(*) AS ct
             |FROM (
             |  SELECT event_id, CAST(user_id % $m AS DECIMAL(12,2)) AS v
             |  FROM events WHERE $ps
             |  UNION ALL
             |  SELECT event_id, CAST($f AS DECIMAL(12,2)) AS v
             |  FROM events WHERE $ps
             |) GROUP BY event_id ORDER BY event_id""".stripMargin)
    }
  }

  /** String collation / LIKE-escape / regexp-dialect / case-folding
    * shapes (index space ≥15000) — the classic Spark-vs-DuckDB string
    * drift family beyond the plain function grid space 10000 already
    * sweeps. Dialect guard-rails (each probed empirically on both
    * engines): LIKE escapes use ESCAPE '!' — a backslash escape char
    * would itself be consumed by Spark's string-literal parser (Spark
    * treats \ as a literal escape, DuckDB does not), silently changing
    * the pattern text between engines; regex patterns stay in the
    * Java∩RE2 common subset (literal alternation, anchors, character
    * classes, quantifiers — no \d, no backrefs, no lookaround), with
    * the genuine dialect split (Spark RLIKE + always-global
    * regexp_replace vs DuckDB regexp_matches + regexp_replace 'g'
    * flag) carried as twin renderings via `Fuzz.sparkSql`; non-ASCII
    * case folding sticks to accents both engines fold identically
    * (é Ü ç ø å Œ — ß is EXCLUDED: Java uppercases it to "SS",
    * DuckDB 1.0 to "ẞ"); substring position 0 is EXCLUDED (Spark
    * reads it as position 1, DuckDB consumes it from the length);
    * initcap is EXCLUDED (absent in DuckDB 1.0); concat over possible
    * NULLs is EXCLUDED (NULL-propagating in Spark, NULL-skipping in
    * DuckDB). Every surfaced value is a STRING or a flag/position
    * integer — immune by construction to the decimal/HUGEINT
    * rendering drift the 12000–14000 spaces had to pin against. */
  private def genStrEdge(i: Int, rng: Random, pc: Column, ps: String,
                         name: String): Fuzz = {
    rng.nextInt(6) match {
      case 0 => // LIKE: ESCAPE'd literal wildcard vs live wildcard
        val m = 7 + rng.nextInt(50)
        val mark = Seq("%", "_")(rng.nextInt(2))
        val d = rng.nextInt(10)
        val s = s"concat(CAST(user_id % $m AS STRING), '$mark', event_type)"
        // lk: digit d then the LITERAL mark (escaped) — exactly uid%m=d;
        // wk: digit d then a LIVE _ wildcard — any 2+ char tail;
        // nl: digit d absent anywhere. The drift trap is the escape.
        val items = Seq(
          s"CASE WHEN $s LIKE '$d!$mark%' ESCAPE '!' THEN 1 ELSE 0 END AS lk",
          s"CASE WHEN $s LIKE '${d}_%' THEN 1 ELSE 0 END AS wk",
          s"CASE WHEN $s NOT LIKE '%$d%' THEN 1 ELSE 0 END AS nl")
        Fuzz(name,
          (sp, dir) => graft.core.Tables.events(sp, dir)
            .filter(pc)
            .selectExpr(("event_id" +: items): _*)
            .orderBy("event_id"),
          s"""SELECT event_id, ${items.mkString(",\n       ")}
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case 1 => // regexp dialect: RLIKE/regexp_matches + global replace
        val re = Seq("^(click|view)$", "r+o", "[aeiou][aeiou]", "p.r",
          "^s[a-z]+p$")(rng.nextInt(5))
        val duckSql =
          s"""SELECT event_id,
             |       CASE WHEN regexp_matches(event_type, '$re') THEN 1 ELSE 0 END AS rk,
             |       regexp_extract(props, '([0-9]+)', 1) AS dig,
             |       regexp_replace(props, '[0-9]', '#', 'g') AS msk
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin
        val sparkItems = Seq(
          s"CASE WHEN event_type RLIKE '$re' THEN 1 ELSE 0 END AS rk",
          "regexp_extract(props, '([0-9]+)', 1) AS dig",
          "regexp_replace(props, '[0-9]', '#') AS msk")
        Fuzz(name,
          (sp, dir) => graft.core.Tables.events(sp, dir)
            .filter(pc)
            .selectExpr(("event_id" +: sparkItems): _*)
            .orderBy("event_id"),
          duckSql,
          Some(s"""SELECT event_id, ${sparkItems.mkString(",\n       ")}
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin))
      case 2 => // non-ASCII case folding on the agreed accent subset
        val acc = Seq("é", "Ü", "ç", "ø", "å", "Œ")(rng.nextInt(6))
        val s = s"concat('$acc-', event_type)"
        val items = Seq(
          s"upper($s) AS up",
          s"lower($s) AS lo",
          s"length($s) AS ln", // char semantics in both engines
          s"upper(lower(upper($s))) AS rt") // fold round-trip stability
        Fuzz(name,
          (sp, dir) => graft.core.Tables.events(sp, dir)
            .filter(pc)
            .selectExpr(("event_id" +: items): _*)
            .orderBy("event_id"),
          s"""SELECT event_id, ${items.mkString(",\n       ")}
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case 3 => // substring/pad/instr edge indices (negative, past-end,
        // zero-length, truncating pad, absent needle)
        val m = 5 + rng.nextInt(40)
        val p = 2 + rng.nextInt(4)
        val s = s"concat(event_type, '-', CAST(user_id % $m AS STRING))"
        val items = Seq(
          s"substring($s, $p, 3) AS mid",
          s"substring($s, -3, 2) AS tl2", // negative start: from the end
          s"substring($s, 50, 4) AS far", // past the end -> ''
          s"substring($s, $p, 0) AS zed", // zero length -> ''
          s"left($s, 20) AS l20",         // n > len -> whole string
          s"right($s, 2) AS r2",
          "lpad(event_type, 3, '*') AS lp3", // pad-to-shorter truncates
          s"instr($s, 'zz') AS nf")       // absent needle -> 0
        Fuzz(name,
          (sp, dir) => graft.core.Tables.events(sp, dir)
            .filter(pc)
            .selectExpr(("event_id" +: items): _*)
            .orderBy("event_id"),
          s"""SELECT event_id, ${items.mkString(",\n       ")}
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case 4 => // binary-collation comparisons + string greatest/least
        val tag = Seq("Z", "a", "M", "0")(rng.nextInt(4))
        val s = s"concat('$tag', event_type)"
        val items = Seq(
          s"CASE WHEN $s < 'a' THEN 1 ELSE 0 END AS lt",
          s"CASE WHEN $s BETWEEN 'A' AND 'z' THEN 1 ELSE 0 END AS bw",
          "CASE WHEN event_type IN ('click', 'ERROR', 'View') " +
            "THEN 1 ELSE 0 END AS cs", // case-sensitive membership
          s"greatest($s, event_type) AS gr",
          s"least($s, 'm') AS le")
        Fuzz(name,
          (sp, dir) => graft.core.Tables.events(sp, dir)
            .filter(pc)
            .selectExpr(("event_id" +: items): _*)
            .orderBy("event_id"),
          s"""SELECT event_id, ${items.mkString(",\n       ")}
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
      case _ => // standard-syntax TRIM variants + pad round-trip
        val padc = Seq("_", "*", "0")(rng.nextInt(3))
        val s = s"concat('$padc$padc', event_type, '$padc')"
        val items = Seq(
          s"TRIM(LEADING '$padc' FROM $s) AS tl",
          s"TRIM(TRAILING '$padc' FROM $s) AS tt",
          s"TRIM(BOTH '$padc' FROM $s) AS tb",
          s"rpad($s, 14, '$padc') AS rp",
          s"length(TRIM(BOTH '$padc' FROM $s)) AS ln")
        Fuzz(name,
          (sp, dir) => graft.core.Tables.events(sp, dir)
            .filter(pc)
            .selectExpr(("event_id" +: items): _*)
            .orderBy("event_id"),
          s"""SELECT event_id, ${items.mkString(",\n       ")}
             |FROM events WHERE $ps
             |ORDER BY event_id""".stripMargin)
    }
  }

  /** JSON-path extraction shapes (index space ≥16000) over the
    * `props` JSON column and constructed JSON strings — the
    * semi-structured dialect family. The extraction surface is a
    * genuine dialect split carried as twin renderings: Spark
    * `get_json_object(s, '$.path')` vs DuckDB
    * `json_extract_string(s, '$.path')` (both return the unquoted
    * string, NULL on a missing path — probed). Guard-rails: paths
    * stay in the dot + `[index]` common subset (bracket-quoted
    * `$['k']` syntax differs); constructed JSON embeds only
    * digits/letters (no escape-sequence dialect); numeric extraction
    * goes through CAST(... AS BIGINT) on both sides (well-formed by
    * construction); json_array_length is INT in Spark vs UBIGINT in
    * DuckDB but both surface as plain ints; json_valid /
    * json_structure / to_json are EXCLUDED (absent or
    * key-order-dependent in one engine). Every surfaced value is a
    * string, NULL, or integer — rendering-safe. */
  private def genJson(i: Int, rng: Random, pc: Column, ps: String,
                      name: String): Fuzz = {
    // twin-rendered select lists: items as (sparkExpr, duckExpr)
    def mk(items: Seq[(String, String)]): Fuzz = {
      val sparkItems = items.map(_._1)
      val duckItems = items.map(_._2)
      Fuzz(name,
        (sp, dir) => graft.core.Tables.events(sp, dir)
          .filter(pc)
          .selectExpr(("event_id" +: sparkItems): _*)
          .orderBy("event_id"),
        s"""SELECT event_id, ${duckItems.mkString(",\n       ")}
           |FROM events WHERE $ps
           |ORDER BY event_id""".stripMargin,
        Some(s"""SELECT event_id, ${sparkItems.mkString(",\n       ")}
           |FROM events WHERE $ps
           |ORDER BY event_id""".stripMargin))
    }
    def ext(s: String, path: String): (String, String) =
      (s"get_json_object($s, '$path')", s"json_extract_string($s, '$path')")
    rng.nextInt(6) match {
      case 0 => // props extraction + missing path + numeric reuse
        val m = 5 + rng.nextInt(30)
        val (sk, dk) = ext("props", "$.k")
        mk(Seq(
          (s"$sk AS kv", s"$dk AS kv"),
          (s"CAST($sk AS BIGINT) % $m AS kb",
            s"CAST($dk AS BIGINT) % $m AS kb"),
          (s"CASE WHEN ${ext("props", "$.absent")._1} IS NULL " +
            "THEN 1 ELSE 0 END AS miss",
            s"CASE WHEN ${ext("props", "$.absent")._2} IS NULL " +
              "THEN 1 ELSE 0 END AS miss")))
      case 1 => // constructed nested object, two levels + string leaf
        val m = 4 + rng.nextInt(20)
        val j = "concat('{\"a\": {\"b\": ', CAST(user_id % " + m +
          " AS STRING), '}, \"t\": \"', event_type, '\"}')"
        mk(Seq(
          (s"${ext(j, "$.a.b")._1} AS ab", s"${ext(j, "$.a.b")._2} AS ab"),
          (s"${ext(j, "$.t")._1} AS t", s"${ext(j, "$.t")._2} AS t"),
          (s"CASE WHEN ${ext(j, "$.a.c")._1} IS NULL THEN 1 ELSE 0 " +
            "END AS mc",
            s"CASE WHEN ${ext(j, "$.a.c")._2} IS NULL THEN 1 ELSE 0 " +
              "END AS mc")))
      case 2 => // constructed array: varying length + index + past-end
        val k = 2 + rng.nextInt(6)
        val j = "concat('[', CAST(event_id % 7 AS STRING), " +
          s"CASE WHEN user_id % $k = 0 THEN ', 5' ELSE '' END, ']')"
        mk(Seq(
          (s"json_array_length($j) AS al", s"json_array_length($j) AS al"),
          (s"${ext(j, "$[0]")._1} AS e0", s"${ext(j, "$[0]")._2} AS e0"),
          (s"${ext(j, "$[1]")._1} AS e1", // NULL when length 1
            s"${ext(j, "$[1]")._2} AS e1")))
      case 3 => // numeric extraction arithmetic + threshold flags
        val m = 6 + rng.nextInt(40)
        val t = rng.nextInt(50)
        val (sk, dk) = ext("props", "$.k")
        mk(Seq(
          (s"CAST($sk AS BIGINT) % $m AS km",
            s"CAST($dk AS BIGINT) % $m AS km"),
          (s"CASE WHEN CAST($sk AS BIGINT) > $t THEN 1 ELSE 0 END AS gt",
            s"CASE WHEN CAST($dk AS BIGINT) > $t THEN 1 ELSE 0 END AS gt")))
      case 4 => // group by the extracted value
        val k = 2 + rng.nextInt(7)
        val (sk, dk) = ext("props", "$.k")
        Fuzz(name,
          (sp, dir) => graft.core.Tables.events(sp, dir)
            .filter(pc)
            .groupBy(expr(s"CAST($sk AS BIGINT) % $k").as("grp"))
            .agg(count(lit(1)).as("ct"),
              expr("min(event_type)").as("mnt"))
            .orderBy("grp"),
          s"""SELECT CAST($dk AS BIGINT) % $k AS grp, count(*) AS ct,
             |       min(event_type) AS mnt
             |FROM events WHERE $ps
             |GROUP BY 1 ORDER BY grp""".stripMargin,
          Some(s"""SELECT CAST($sk AS BIGINT) % $k AS grp, count(*) AS ct,
             |       min(event_type) AS mnt
             |FROM events WHERE $ps
             |GROUP BY 1 ORDER BY grp""".stripMargin))
      case _ => // extraction composed with string functions
        val j = "concat('{\"x\": {\"y\": \"', event_type, '-', " +
          "CAST(user_id % 9 AS STRING), '\"}}')"
        val (sx, dx) = ext(j, "$.x.y")
        mk(Seq(
          (s"upper($sx) AS uy", s"upper($dx) AS uy"),
          (s"length($sx) AS ly", s"length($dx) AS ly"),
          (s"instr($sx, '-') AS py", s"instr($dx, '-') AS py")))
    }
  }

  def suite(n: Int): Seq[Fuzz] = (0 until n).map(gen)

  /** The cases replayed against the DuckDB oracle every round,
    * pinned to indices VETTED non-empty at sf0.001/0.01/0.1 by
    * `graft.tools.FuzzVet` (random conjunctions can be satisfiable in
    * the abstract yet empty on the 15-user sf0.001 slice — e.g. two
    * user_id modulo atoms whose CRT solution exceeds 14; index 10 is
    * exactly such a case and is skipped, as are 1005 from the
    * event-time space, 4010 from the set-op space, 5008/5010/
    * 5015/5018 from the subquery space, 6013/6015/6019 from the
    * correlated/LATERAL space, and 9014 from the window-frame space
    * (9020 pins in its place); all 20 recursive-CTE cases vetted
    * non-empty — their anchors are spines/key-moduli, satisfiable at
    * every SF by construction; all 20 grouping-sets/FILTER cases
    * vetted non-empty — a rollup/cube over an empty slice still
    * emits its grand-total row; decimal space 12000: 12007/12009/
    * 12010/12020/12025/12029 are empty at sf0.001 and 12013 empty
    * everywhere — all unsatisfiable predicate draws — so the next
    * indices pin in their place; float space 13000: only 13015 is
    * empty, 13016+ pin in its place; coercion space 14000: all of
    * 14000-14024 vetted non-empty — only 14030, outside the pinned
    * range, is empty at sf0.001; string-edge space 15000 and JSON
    * space 16000: all of 15000-15031 / 16000-16031 vetted non-empty
    * at every SF). Re-run FuzzVet and re-pin if the driver
    * regenerates testdata. */
  val vettedIdx: Seq[Int] =
    Seq(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13, 14, 15, 16,
      17, 18, 19, 20,
      1000, 1001, 1002, 1003, 1004, 1006, 1007, 1008,
      1009, 1010, 1011, 1012,
      2000, 2001, 2002, 2003, 2004, 2005, 2006, 2007,
      2008, 2009, 2010, 2011,
      3000, 3001, 3002, 3003, 3004, 3005, 3006, 3007,
      3008, 3009, 3010, 3011, 3012, 3013, 3014, 3015,
      4000, 4001, 4002, 4003, 4004, 4005, 4006, 4007,
      4008, 4009, 4011, 4012, 4013, 4014, 4015,
      5000, 5001, 5002, 5003, 5004, 5005, 5006, 5007,
      5009, 5011, 5012, 5013, 5014, 5016, 5017, 5019,
      6000, 6001, 6002, 6003, 6004, 6005, 6006, 6007,
      6008, 6009, 6010, 6011, 6012, 6014, 6016, 6017, 6018,
      7000, 7001, 7002, 7003, 7004, 7005, 7006, 7007,
      7008, 7009, 7010, 7011, 7012, 7013, 7014, 7015,
      7016, 7017, 7018, 7019,
      8000, 8001, 8002, 8003, 8004, 8005, 8006, 8007,
      8008, 8009, 8010, 8011, 8012, 8013, 8014, 8015,
      8016, 8017, 8018, 8019,
      9000, 9001, 9002, 9003, 9004, 9005, 9006, 9007,
      9008, 9009, 9010, 9011, 9012, 9013, 9015,
      9016, 9017, 9018, 9019, 9020,
      10000, 10001, 10002, 10003, 10004, 10005, 10006, 10007,
      10008, 10009, 10010, 10011, 10012, 10013, 10014, 10015,
      10016, 10017, 10018, 10019,
      11000, 11001, 11002, 11003, 11004, 11005, 11006, 11007,
      11008, 11009, 11010, 11011, 11012, 11013, 11014, 11015,
      11016, 11017, 11018, 11019, 11020, 11021, 11022, 11023,
      12000, 12001, 12002, 12003, 12004, 12005, 12006, 12008,
      12011, 12012, 12014, 12015, 12016, 12017, 12018, 12019,
      12021, 12022, 12023, 12024, 12026, 12027, 12028, 12030,
      12031,
      13000, 13001, 13002, 13003, 13004, 13005, 13006, 13007,
      13008, 13009, 13010, 13011, 13012, 13013, 13014, 13016,
      13017, 13018, 13019, 13020, 13021, 13022, 13023, 13024,
      13025,
      14000, 14001, 14002, 14003, 14004, 14005, 14006, 14007,
      14008, 14009, 14010, 14011, 14012, 14013, 14014, 14015,
      14016, 14017, 14018, 14019, 14020, 14021, 14022, 14023,
      14024,
      15000, 15001, 15002, 15003, 15004, 15005, 15006, 15007,
      15008, 15009, 15010, 15011, 15012, 15013, 15014, 15015,
      15016, 15017, 15018, 15019, 15020, 15021, 15022, 15023,
      15024,
      16000, 16001, 16002, 16003, 16004, 16005, 16006, 16007,
      16008, 16009, 16010, 16011, 16012, 16013, 16014, 16015,
      16016, 16017, 16018, 16019, 16020, 16021, 16022, 16023,
      16024)

  def driverSuite: Seq[Fuzz] = vettedIdx.map(gen)
}
