package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.dws.AdvancedWindows
import graft.operators.llm.Retrieval

/** Semantics checks for the trailing RANGE window, resample/ffill,
  * and PMI collocation operators. */
class TimeSeriesSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("trailing window: 7-day bound is inclusive, 8-day is out") {
    val orders = Seq(
      (1L, 10L, "X", 100.0, ts("2024-01-01 00:00:00"), "P"),
      (2L, 10L, "X", 50.0, ts("2024-01-08 00:00:00"), "P"), // exactly 7d → in
      (3L, 10L, "X", 25.0, ts("2024-01-16 00:00:00"), "P"), // 8d after #2 → out
      (4L, 20L, "X", 10.0, ts("2024-01-08 00:00:00"), "P")  // other key
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val out = AdvancedWindows.trailingOrderWindow(orders)
      .select("o_orderkey", "trailing_ct", "trailing_sum")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1L, 100.0)))
    assert(out(2L) == ((2L, 150.0)), "order exactly 7 days prior must count")
    assert(out(3L) == ((1L, 25.0)), "orders 8+ days prior must not count")
    assert(out(4L) == ((1L, 10.0)), "frames never cross keys")
  }

  test("ewma: alpha=0.5 closed forms; leading rows renormalize") {
    val s = Seq((1, 10L), (2, 20L), (3, 40L)).toDF("t", "x")
    val out = AdvancedWindows.ewma(s, Seq.empty, "t", "x")
      .select("t", "ewma").as[(Int, Double)].collect().toMap
    // t=1: only itself → 10; t=2: (20 + 10·0.5)/1.5; t=3:
    // (40 + 20·0.5 + 10·0.25)/1.75
    assert(out(1) == 10.0)
    assert(out(2) == math.rint((20 + 5.0) / 1.5 * 1e4) / 1e4)
    assert(out(3) == math.rint((40 + 10 + 2.5) / 1.75 * 1e4) / 1e4)
  }

  test("ewma: truncation at k — lag k carries no weight") {
    val s = (1 to 10).map(t => (t, if (t == 1) 1000000L else 0L))
      .toDF("t", "x")
    val out = AdvancedWindows.ewma(s, Seq.empty, "t", "x", k = 4)
      .select("t", "ewma").as[(Int, Double)].collect().toMap
    assert(out(4) > 0.0, "lag 3 still inside the window")
    assert(out(5) == 0.0, "lag 4 must be truncated away")
  }

  test("ewma: partitions never leak across keys") {
    val s = Seq(("a", 1, 100L), ("b", 2, 0L)).toDF("k", "t", "x")
    val out = AdvancedWindows.ewma(s, Seq("k"), "t", "x")
      .select("k", "ewma").as[(String, Double)].collect().toMap
    assert(out("b") == 0.0, "b's series must not see a's value")
  }

  test("rolling z-score: trailing frame excludes self, flags the spike") {
    // stable series then a spike: the spike's own value must not
    // dilute the baseline it is scored against
    val s = ((1 to 9).map(t => (1L, t, 10L)) :+ (1L, 10, 100L))
      .toDF("k", "t", "x")
    val out = AdvancedWindows.rollingZscore(s, Seq("k"), "t", "x",
      n = 8, threshold = 2.0)
      .select("t", "z", "is_anomaly")
      .as[(Int, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1)._1.isEmpty && !out(1)._2, "no history → null z, no flag")
    assert(out(2)._1.isEmpty && !out(2)._2, "one point → stddev undefined")
    assert(out(10)._2, "the spike must flag")
    // steady rows score z = NaN (0/0) or 0 depending on history; they
    // must never flag
    assert((3 to 9).forall(t => !out(t)._2))
  }

  test("resample/ffill: grid spans truncated bounds, fill carries forward") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:30:00"), 10L, "view", 1.5, "{}"),
      (2L, ts("2024-01-01 02:15:00"), 10L, "view", 2.5, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AdvancedWindows.resampleFfill(ev)
      .select("hour_ts", "src_event_id", "ffill_value")
      .as[(String, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set("2024-01-01 00:00:00", "2024-01-01 01:00:00",
      "2024-01-01 02:00:00"), s"grid must span floor(min)..floor(max): $out")
    assert(out("2024-01-01 00:00:00") == ((None, None)),
      "leading boundary before the first event stays null")
    assert(out("2024-01-01 01:00:00") == ((Some(1L), Some(1.5))))
    assert(out("2024-01-01 02:00:00") == ((Some(1L), Some(1.5))),
      "an event after the boundary must not fill it")
  }

  test("resample/ffill on real events: every user spans its hour range") {
    val ev = Tables.events(spark, sf0001)
    val out = AdvancedWindows.resampleFfill(ev)
    val perUser = out.groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val expect = ev.groupBy("user_id")
      .agg(((unix_timestamp(date_trunc("hour", max(col("ts")))) -
        unix_timestamp(date_trunc("hour", min(col("ts"))))) / 3600 + 1).as("n"))
      .as[(Long, Double)].collect().toMap
    assert(perUser.keySet == expect.keySet)
    perUser.foreach { case (u, n) => assert(n == expect(u).toLong, s"user $u") }
  }

  test("seasonality: planted weekday effect; slot 0 anchors to Thursday") {
    // 1970-01-01 is a Thursday → slot 0; 1970-01-02 → slot 1
    val orders = Seq(
      (1L, ts("1970-01-01 00:00:00"), 100.0),
      (2L, ts("1970-01-08 00:00:00"), 300.0), // second Thursday
      (3L, ts("1970-01-02 00:00:00"), 400.0)
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = graft.operators.dws.TimeSeries.seasonalityIndex(orders)
      .select("dow", "day_ct", "avg_rev", "seasonal_idx")
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // slot 0 mean 200, slot 1 mean 400, overall mean 800/3
    assert(out(0) == ((2L, 200.0, 0.75)))
    assert(out(1) == ((1L, 400.0, 1.5)))
    assert(out.keySet == Set(0, 1))
  }

  test("autocorr: alternating series gives exactly -1 at lag 1, +1 at lag 2") {
    val li = (0 until 8).map { i =>
      (ts(f"2024-01-${i + 1}%02d 00:00:00"),
        if (i % 2 == 0) 2.0 else 12.0)
    }.toDF("l_shipdate", "l_quantity")
    val out = graft.operators.dws.TimeSeries.autocorrelation(li, maxLag = 2)
      .select("lag", "n_pairs", "autocorr")
      .as[(Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // integer sufficient statistics make these EXACT, not approximate
    assert(out(1) == ((7L, -1.0)))
    assert(out(2) == ((6L, 1.0)))
  }

  test("cusum: mean shift flags the last pre-shift day; ties flag earliest only") {
    val li = (0 until 8).map { i =>
      (ts(f"2024-02-${i + 1}%02d 00:00:00"),
        if (i < 4) 1.0 else 11.0)
    }.toDF("l_shipdate", "l_quantity")
    val out = graft.operators.dws.TimeSeries.cusumChangepoint(li)
      .select("day_s", "cusum_fp", "is_changepoint")
      .as[(String, Long, Boolean)].collect()
    // n=8, T=48: low days contribute 8·1−48=−40, high days +40
    val byDay = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byDay("2024-02-04") == ((-160L, true)),
      "max |cusum| sits at the last day of the old regime")
    assert(out.count(_._3) == 1, "exactly one changepoint")
    assert(byDay("2024-02-08")._1 == 0L, "cusum returns to zero at the end")
    // a flat series ties everywhere → only the earliest day flags
    val flat = (0 until 5).map(i =>
      (ts(f"2024-03-${i + 1}%02d 00:00:00"), 7.0))
      .toDF("l_shipdate", "l_quantity")
    val f = graft.operators.dws.TimeSeries.cusumChangepoint(flat)
      .select("day_s", "is_changepoint").as[(String, Boolean)].collect()
    assert(f.count(_._2) == 1 && f.find(_._2).get._1 == "2024-03-01")
  }

  test("pmi: a planted always-together pair dominates; cap excludes mega-docs") {
    val base = (0 until 40).map { i =>
      // 'alpha beta' co-occur in every doc; 'gamma' in half of them
      val extra = if (i % 2 == 0) " gamma" else ""
      (i.toLong, s"alpha beta$extra filler$i")
    }
    // a doc over the vocab cap containing a pair seen nowhere else
    val mega = (1000L, (0 until 600).map(j => s"tok$j").mkString(" ") +
      " uniqA uniqB")
    val docs = (base :+ mega).toDF("doc_id", "text")
    val out = Retrieval.pmiCooccurrence(docs, minCount = 5, k = 10,
      maxDocVocab = 512)
      .select("w_a", "w_b", "pmi").as[(String, String, Double)].collect()
    val byPair = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(byPair.contains(("alpha", "beta")))
    // P(alpha,beta)=P(alpha)=P(beta)=1 → pmi = ln(1) = 0; gamma pairs
    // have pmi 0 too (gamma⊂alpha docs); filler pairs never reach
    // minCount, so nothing outranks the planted pair's pmi
    assert(out.forall(_._3 <= byPair(("alpha", "beta")) + 1e-9))
    assert(!out.exists(r => r._1 == "uniqA" || r._2 == "uniqB"),
      "pairs only inside the capped mega-doc must be excluded")
  }

  test("holt: hand-walked recurrence; same-day orders aggregate first") {
    import graft.operators.dws.TimeSeries
    val orders = Seq(
      ("1-URGENT", ts("2024-01-01 00:00:00"), 1.0),
      ("1-URGENT", ts("2024-01-02 00:00:00"), 2.0),
      ("1-URGENT", ts("2024-01-03 00:00:00"), 3.0),
      ("2-HIGH", ts("2024-01-05 00:00:00"), 7.0),
      ("2-HIGH", ts("2024-01-05 00:00:00"), 3.0)
    ).toDF("o_orderpriority", "o_orderdate", "o_totalprice")
    val out = TimeSeries.holtForecast(orders).collect()
      .map(r => r.getString(0) -> r).toMap
    // cents 100,200,300: l1=100,b1=0; l2=.5·200+.5·100=150,
    // b2=.25·50=12.5; l3=.5·300+.5·162.5=231.25,
    // b3=.25·81.25+.75·12.5=29.6875 — all dyadic, so == is exact
    val u = out("1-URGENT")
    assert(u.getInt(1) == 3)
    assert(u.getDouble(2) == 231.25 && u.getDouble(3) == 29.6875, u.toString)
    assert(u.getDouble(4) == 260.9375, "fc_1 = l + b")
    assert(u.getDouble(5) == 439.0625, "fc_7 = l + 7b")
    // one day, two orders: series [1000]; level = y, trend = 0
    val h = out("2-HIGH")
    assert(h.getInt(1) == 1 && h.getDouble(2) == 1000.0 &&
      h.getDouble(3) == 0.0 && h.getDouble(5) == 1000.0, h.toString)
  }
}
