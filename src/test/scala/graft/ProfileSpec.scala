package graft

import org.apache.spark.sql.functions._
import graft.operators.quality.Profile

/** Table-profiling invariants: the per-column single-pass aggregate
  * and the fixed-bound histogram. */
class ProfileSpec extends SparkTestBase {

  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, Some("b"), Some(20.0)),
    (3L, None, Some(20.0)),
    (4L, Some("a"), None),
    (5L, None, Some(700.0))
  ).toDF("id", "s", "v")

  test("profile: nulls, exact distinct, min/max per column") {
    val out = Profile.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("id") == ("id", 5L, 0L, 5L, "1", "5"))
    // distinct ignores NULLs; min/max skip them
    assert(out("s") == ("s", 5L, 2L, 2L, "a", "b"))
  }

  test("profileApprox: counts exact, cardinality within the rsd band") {
    val out = Profile.profileApprox(df, Seq("id", "s"), rsd = 0.02)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("s")._2 == 5L && out("s")._3 == 2L)
    // 5 and 2 distinct at 2% rsd: HLL++ is exact at these cardinalities
    assert(out("id")._4 == 5L && out("s")._4 == 2L)
    assert(out("id")._5 == "1" && out("id")._6 == "5")
  }

  test("histogram: clamping keeps all mass, empty buckets zero-pad") {
    // bounds [0, 100) x 4 buckets; 700.0 clamps into the top bucket,
    // the NULL row drops, bucket 2 is empty and must still appear
    val h = Profile.histogram(df, "v", 0.0, 100.0, 4)
      .as[(Long, Double, Double, Long)].collect().toSeq
    // 10, 20, 20 → bucket 0; 700 clamps into bucket 3; NULL drops
    assert(h == Seq(
      (0L, 0.0, 25.0, 3L),
      (1L, 25.0, 50.0, 0L),
      (2L, 50.0, 75.0, 0L),
      (3L, 75.0, 100.0, 1L)))
    assert(h.map(_._4).sum == 4L, "no mass dropped")
  }

  test("histogram: below-lo values clamp into bucket 0") {
    val neg = Seq(-5.0, 1.0, 9.0).toDF("v")
    val h = Profile.histogram(neg, "v", 0.0, 10.0, 2)
      .as[(Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(h == Map(0L -> 2L, 1L -> 1L))
  }

  test("robust stats: MAD outliers; zero-MAD flags every deviation") {
    def o(grp: String, xs: Seq[Double]) =
      xs.map(x => (grp, x))
    val orders = (o("X", Seq.fill(6)(10.0) :+ 1000.0) ++
      o("Y", (1 to 9).map(_.toDouble) :+ 100.0))
      .toDF("o_orderpriority", "o_totalprice")
    val out = graft.operators.quality.Drift.robustStats(orders)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // X: median 10, MAD 0 — the 1000 deviates from a flat baseline
    assert(out("X") == ((7L, 10.0, 0.0, 1L)))
    // Y: median 5.5, MAD 2.5, threshold 11.1195 — only 100 crosses
    assert(out("Y") == ((10L, 5.5, 2.5, 1L)))
  }

  test("psi: planted regime swap yields the hand-computed index") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val orders = (Seq.fill(3)(("1994-06-01 00:00:00", 10.0)) ++
      Seq.fill(3)(("1996-06-01 00:00:00", 90.0)))
      .map { case (d, v) => (ts(d), v) }
      .toDF("o_orderdate", "o_totalprice")
    val out = graft.operators.quality.Drift
      .psiReport(orders, lo = 0.0, hi = 100.0, bins = 2)
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // p = (3+1)/(3+2) = 0.8 vs q = (0+1)/5 = 0.2; PSI contributions
    // are symmetric here: ±0.6·ln 4 → both bins contribute +c
    val c = math.rint(0.6 * math.log(4.0) * 1e6) / 1e6
    assert(out(0)._6 == c && out(1)._6 == c, out)
    assert(out(0)._7 == 2 * c, s"psi ${out(0)._7} != ${2 * c}")
    assert(out(0)._2 == 3L && out(0)._3 == 0L, "regime A mass in bin 0")
  }

  test("expectations: every planted violation is counted, nulls included") {
    val orders = Seq(
      (1L, Option(10L), "O", Option(100.0)),
      (1L, Option(11L), "F", Option(50.0)),   // duplicate PK
      (2L, None, "P", Option(25.0)),          // null custkey
      (3L, Option(12L), "X", Option(-5.0)),   // bad status AND bad price
      (4L, Option(13L), "O", None)            // null price → range violation
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val lineitem = Seq(
      (1L, Option(5.0), 10.0),
      (2L, Option(80.0), 20.0),   // quantity out of range
      (9L, Option(3.0), 30.0),    // orphan orderkey
      (3L, None, 40.0)            // null quantity → range violation
    ).toDF("l_orderkey", "l_quantity", "l_extendedprice")
    val out = graft.operators.quality.Expectations
      .orderSuite(orders, lineitem)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("orders.o_orderkey is unique") == ((5L, 1L, false)))
    assert(out("orders.o_custkey is complete") == ((5L, 1L, false)))
    assert(out("orders.o_totalprice > 0") == ((5L, 2L, false)),
      "a NULL price is a range violation, not a pass")
    assert(out("orders.o_orderstatus in {O,F,P}") == ((5L, 1L, false)))
    assert(out("lineitem.l_quantity in [1,50]") == ((4L, 2L, false)))
    assert(out("lineitem.l_extendedprice > 0") == ((4L, 0L, true)))
    assert(out("lineitem.l_orderkey references orders") == ((4L, 1L, false)))
  }

  test("benford audit: hand-built digit distribution and expectations") {
    import graft.operators.quality.Drift
    val orders = Seq(1.5, 19.0, 250.0, 3000.0, 0.5)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("o_orderkey", "o_totalprice")
    val out = Drift.benfordAudit(orders).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // 0.5 is excluded (< 1); digits: 1,1,2,3 over total 4
    assert(out.keySet == Set(1, 2, 3), out.keySet)
    val b1 = math.rint(math.log10(2.0) * 1e6).toLong       // 301030
    val b2 = math.rint(math.log10(1.5) * 1e6).toLong       // 176091
    val b3 = math.rint(math.log10(4.0 / 3) * 1e6).toLong   // 124939
    assert(out(1) == ((2L, 500000L, b1, 500000L - b1)), out(1).toString)
    assert(out(2) == ((1L, 250000L, b2, math.abs(250000L - b2))))
    assert(out(3) == ((1L, 250000L, b3, math.abs(250000L - b3))))
  }

  test("grouped quantiles approx: rank drift bounded vs the exact twin") {
    import graft.operators.quality.Profile
    val orders = graft.core.Tables.orders(spark, sf0001)
    val exact = Profile.groupedQuantiles(orders).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val approx = Profile.groupedQuantilesApprox(orders).collect()
    assert(approx.length == exact.size)
    // GK at accuracy 10^4 guarantees rank error ≤ n/10^4; convert to a
    // value tolerance by checking the approx value's true rank window
    val vals = orders
      .select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    approx.foreach { r =>
      val (g, p, got, n) = (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      val sortedVals = vals(g)
      val targetRank = math.ceil(p * n / 100.0).toLong
      val tol = math.max(1L, n / 10000L) + 1
      val lo = sortedVals(math.max(0, targetRank - tol - 1).toInt)
      val hi = sortedVals(math.min(n - 1, targetRank + tol - 1).toInt)
      assert(got >= lo && got <= hi,
        s"$g p$p: approx $got outside rank window [$lo, $hi]")
    }
  }

  test("key skew report: hand-built frame matches the Gini definition") {
    import graft.operators.quality.Profile
    // counts 1,1,2,4 over 4 keys: sorted ranks 1·1+2·1+3·2+4·4 = 25
    // G = (2·25 − 5·8) / (4·8) = 10/32 = 0.3125
    val df = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(2)("c")
      ++ Seq.fill(4)("d")).map(k => (k, 1)).toDF("k", "v")
    val out = Profile.keySkewReport(df, "k").collect().head
    assert(out.getAs[Long]("n_keys") == 4L)
    assert(out.getAs[Long]("total_rows") == 8L)
    assert(out.getAs[Long]("max_key_rows") == 4L)
    assert(out.getAs[Double]("gini_6") == 0.3125)
  }

  test("key skew report: a uniform frame has Gini 0") {
    import graft.operators.quality.Profile
    val df = (1 to 6).flatMap(k => Seq.fill(3)((s"k$k", 1)))
      .toDF("k", "v")
    val out = Profile.keySkewReport(df, "k").collect().head
    assert(out.getAs[Double]("gini_6") == 0.0)
  }
}
