package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.dws.{Behavior, TimeSeries, TrendTests}
import graft.operators.graph.PageRank
import graft.operators.quality.Integrity

/** Semantics checks for the round-7 additions: Mann–Kendall,
  * Theil–Sen, Holt–Winters, clamped inventory, attribution,
  * referential integrity, personalized PageRank. */
class TrendAttributionSpec extends SparkTestBase {

  import spark.implicits._

  private def date(s: String) = java.sql.Date.valueOf(s)

  /** orders-shaped frame: one order per (priority, day) × cnt. */
  private def ordersOf(rows: Seq[(String, String, Int)]) =
    rows.flatMap { case (grp, day, cnt) =>
      (1 to cnt).map(_ => (grp, date(day), 100.0))
    }.toDF("o_orderpriority", "o_orderdate", "o_totalprice")

  test("mann-kendall: strictly increasing series is significant with S = n(n-1)/2") {
    // 12 months, counts 1..12 → S = 66, no ties
    val rows = (1 to 12).map(m => ("P", f"2024-$m%02d-01", m))
    val out = TrendTests.mannKendall(ordersOf(rows)).collect().head
    assert(out.getAs[Long]("n_months") == 12L)
    assert(out.getAs[Long]("s_stat") == 66L)
    // var18 = 12·11·29 = 3828; 180000·65² > 38416·3828 → significant
    assert(out.getAs[Long]("var18") == 3828L)
    assert(out.getAs[String]("trend") == "increasing")
  }

  test("mann-kendall: constant series is all ties — var18 = 0, no trend") {
    val rows = (1 to 10).map(m => ("P", f"2024-$m%02d-01", 3))
    val out = TrendTests.mannKendall(ordersOf(rows)).collect().head
    assert(out.getAs[Long]("s_stat") == 0L)
    assert(out.getAs[Long]("var18") == 0L)
    assert(out.getAs[String]("trend") == "no_trend")
    assert(out.getAs[Double]("z_6") == 0.0)
  }

  test("theil-sen: exact linear series recovers the slope exactly") {
    // counts 5, 8, 11, 14, 17 → slope 3 everywhere → median 3
    val rows = (1 to 5).map(m => ("P", f"2024-$m%02d-01", 2 + 3 * m))
    val out = TrendTests.theilSen(ordersOf(rows)).collect().head
    assert(out.getAs[Long]("n_pairs") == 10L)
    assert(out.getAs[Double]("slope_med6") == 3.0)
  }

  test("holt-winters: constant series → level = y, trend = 0, seasonals = 0") {
    val rows = (0 until 28).map(i =>
      ("P", java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString, 2))
    val out = TimeSeries.holtWintersForecast(ordersOf(rows))
      .collect().head
    assert(out.getAs[Int]("n_days") == 28)
    assert(out.getAs[Double]("level_4") == 20000.0) // 2 orders × 100.00
    assert(out.getAs[Double]("trend_4") == 0.0)
    assert(out.getAs[Double]("s_next_4") == 0.0)
    assert(out.getAs[Double]("fc_1") == 20000.0)
    assert(out.getAs[Double]("fc_7") == 20000.0)
  }

  test("clamped inventory: both clamps fire and the fold saturates") {
    // median of (1,1,1,30,30) = 1; nets: 0,0,0,+29,+29 → cap binds
    // twice; then a crash day would underflow — add cnt high first
    val rows = Seq(
      ("P", "2024-01-01", 30), ("P", "2024-01-02", 30),
      ("P", "2024-01-03", 1), ("P", "2024-01-04", 1),
      ("P", "2024-01-05", 1))
    val out = TimeSeries.clampedInventory(ordersOf(rows)).collect().head
    assert(out.getAs[Long]("med") == 1L)
    // day1 raw 29 → cap 25 (hi), day2 raw 25+29=54 → cap 25 (hi),
    // days 3-5 net 0 → stays 25
    assert(out.getAs[Long]("cap_clamps") == 2L)
    assert(out.getAs[Long]("final_balance") == 25L)
  }

  test("attribution: linear credits sum exactly to cents per conversion") {
    val events = Tables.events(spark, sf0001)
    val out = Behavior.attributionCredit(events)
    val byModel = out.groupBy("model")
      .agg(sum("credit_cents").as("total"), sum("n_conv").as("nc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every model distributes the SAME total purchase cents
    assert(byModel.size == 3)
    assert(byModel.values.toSet.size == 1,
      s"models must conserve cents: $byModel")
    // and that total equals the sum over all purchases
    val cents = events.filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("bigint")))
      .head().getLong(0)
    assert(byModel("linear") == cents)
  }

  test("attribution: first/last pick the window-bounded extremes") {
    val e = Seq(
      (1L, tsOf("2024-01-01T00:00:00Z"), 7L, "view", 0.0),
      (2L, tsOf("2024-01-02T00:00:00Z"), 7L, "click", 0.0),
      (3L, tsOf("2024-01-03T00:00:00Z"), 7L, "purchase", 3.0),
      // a touch OUTSIDE the 7-day lookback of any purchase
      (4L, tsOf("2023-12-01T00:00:00Z"), 8L, "view", 0.0),
      (5L, tsOf("2024-01-05T00:00:00Z"), 8L, "purchase", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Behavior.attributionCredit(e)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_conv"), r.getAs[Long]("credit_cents"))).toMap
    assert(out(("first_touch", "view")) == ((1L, 300L)))
    assert(out(("last_touch", "click")) == ((1L, 300L)))
    // linear: 300 = 150 + 150 across view and click
    assert(out(("linear", "view")) == ((1L, 150L)))
    assert(out(("linear", "click")) == ((1L, 150L)))
    // user 8's purchase has no in-window touch → direct, all models
    assert(out(("first_touch", "direct")) == ((1L, 100L)))
    assert(out(("linear", "direct")) == ((1L, 100L)))
  }

  test("attribution: integer split leaves no lost pennies on odd cents") {
    val e = Seq(
      (1L, tsOf("2024-01-01T00:00:00Z"), 1L, "view", 0.0),
      (2L, tsOf("2024-01-02T00:00:00Z"), 1L, "view", 0.0),
      (3L, tsOf("2024-01-02T12:00:00Z"), 1L, "click", 0.0),
      (4L, tsOf("2024-01-03T00:00:00Z"), 1L, "purchase", 1.00)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Behavior.attributionCredit(e)
      .filter(col("model") === "linear")
      .agg(sum("credit_cents")).head().getLong(0)
    // 100 cents over 3 touches: 33+33+34 — remainder to the last
    assert(out == 100L)
    val last = Behavior.attributionCredit(e)
      .filter(col("model") === "linear" && col("channel") === "click")
      .head().getAs[Long]("credit_cents")
    assert(last == 34L, "the last touch (click) absorbs the remainder")
  }

  test("referential integrity: relational edges have zero orphans at sf0.001") {
    val out = Integrity.audit(spark, sf0001).collect()
    assert(out.length == 8)
    val relational = out.filterNot(
      _.getString(0).startsWith("embeddings."))
    relational.foreach { r =>
      assert(r.getAs[Long]("child_rows") > 0, r.getString(0))
      assert(r.getAs[Long]("orphan_ct") == 0L,
        s"${r.getString(0)} has orphans")
      assert(r.getAs[Long]("null_fks") == 0L, r.getString(0))
    }
  }

  test("activity islands: consecutive-day runs split exactly at gaps") {
    val e = Seq("2024-01-01", "2024-01-02", "2024-01-03",
        "2024-01-07", "2024-01-08")
      .zipWithIndex.map { case (d, i) =>
        (i.toLong, tsOf(s"${d}T10:00:00Z"), 5L, "view", 1.0)
      } :+ ((9L, tsOf("2024-01-01T23:00:00Z"), 5L, "click", 1.0))
    val out = graft.operators.dws.Behavior.activityIslands(
        e.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().head
    // two events on day 1 dedupe; islands = {1-3}, {7-8}
    assert(out.getAs[Long]("n_islands") == 2L)
    assert(out.getAs[Long]("max_streak") == 3L)
    assert(out.getAs[Long]("active_days") == 5L)
  }

  test("classical decomposition: constant series has zero seasonal and residual") {
    val rows = (0 until 21).map(i =>
      ("P", java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
        .toString, 2))
    val out = graft.operators.dws.TimeSeries.classicalDecompose(
      ordersOf(rows)).collect()
    // 21 days, interior = days 4..18 → 15 rows
    assert(out.length == 15)
    out.foreach { r =>
      assert(r.getAs[Long]("trend7") == 7L * 20000L)
      assert(r.getAs[Double]("seasonal_4") == 0.0)
      assert(r.getAs[Double]("resid_4") == 0.0)
    }
  }

  test("kaplan-meier: hand-built cohort matches the product-limit definition") {
    // cust A orders day 0/10/20 → two t=10 events + a t=0 censor at
    // the horizon (20); cust B orders day 0 only → t=20 censor
    val orders = Seq(
      (1L, 10L, "2024-01-01"), (2L, 10L, "2024-01-11"),
      (3L, 10L, "2024-01-21"), (4L, 20L, "2024-01-01")
    ).map { case (k, c, d) => (k, c, date(d), 100.0) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = graft.operators.dws.Survival.kaplanMeierRepurchase(orders)
      .collect()
    assert(out.length == 1) // only t=10 carries events
    val r = out.head
    assert(r.getAs[Long]("t_days") == 10L)
    assert(r.getAs[Long]("d") == 2L)
    assert(r.getAs[Long]("c") == 0L)
    assert(r.getAs[Long]("n") == 3L) // at risk: both gaps + B's censor
    assert(r.getAs[Double]("surv_6") == 0.333333)
  }

  test("ab test: hand-built arms match the pooled z² definition") {
    // purchase counts u0:3 u1:1 u2:0 u3:1 → median 1, converted = {u0}
    // arm0 (u0,u2): n=2 x=1; arm1 (u1,u3): n=2 x=0
    // z² = 4·(1·2−0·2)² / (2·2·1·3) = 16/12
    val rows = Seq.fill(3)((0L, "purchase")) ++ Seq((1L, "purchase")) ++
      Seq((2L, "view")) ++ Seq((3L, "purchase"))
    val events = rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, tsOf("2024-01-01T00:00:00Z"), u, t, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.ml.Experiment.abTestConversion(events)
      .collect().head
    assert(out.getAs[Long]("n1") == 2L && out.getAs[Long]("x1") == 1L)
    assert(out.getAs[Long]("n2") == 2L && out.getAs[Long]("x2") == 0L)
    assert(out.getAs[Double]("z2_6") ==
      math.rint(16.0 / 12.0 * 1e6) / 1e6)
    assert(!out.getAs[Boolean]("significant"))
  }

  test("ab test: degenerate all-converted split yields NULL z², not an error") {
    // both users above a median impossible: all pc equal → none > med
    val events = Seq(
      (1L, tsOf("2024-01-01T00:00:00Z"), 0L, "purchase", 1.0),
      (2L, tsOf("2024-01-01T00:00:00Z"), 1L, "purchase", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.ml.Experiment.abTestConversion(events)
      .collect().head
    assert(out.isNullAt(out.fieldIndex("z2_6")))
    assert(!out.getAs[Boolean]("significant"))
  }

  test("clamped balance stream: replay matches the in-memory fold") {
    val events = Tables.events(spark, sf0001)
    val out = graft.streaming.TwsStreams.clampedBalanceReplay(spark, events)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def us(t: java.sql.Timestamp) =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val pts = events.filter(col("user_id") % 4 === 0)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2),
        r.getLong(3)))
    val expected = pts.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      var (b, lo, hi) = (0L, 0L, 0L)
      rows.sortBy(r => (r._2, r._3)).toSeq.map { r =>
        val raw = b + r._4 - 5000L
        if (raw < 0) lo += 1
        if (raw > 100000L) hi += 1
        b = math.max(0L, math.min(100000L, raw))
        (uid, r._3) -> ((b, lo, hi))
      }
    }.toMap
    assert(out.size == expected.size)
    expected.foreach { case (k, v) =>
      assert(out(k) == v, s"key $k: stream ${out(k)} vs model $v")
    }
  }

  test("clamped balance stream: batch count does not change the result") {
    val events = Tables.events(spark, sf0001)
    val one = graft.streaming.TwsStreams
      .clampedBalanceReplay(spark, events, batches = 1)
    val five = graft.streaming.TwsStreams
      .clampedBalanceReplay(spark, events, batches = 5)
    assertSameRows(one, five)
  }

  test("personalized pagerank: mass stays near Scale and concentrates on seeds") {
    val ranks = PageRank.copurchasePpr(
      Tables.lineitem(spark, sf0001), Tables.orders(spark, sf0001),
      iters = 4)
    val rows = ranks.collect().map(r => r.getLong(0) -> r.getLong(1))
    val total = rows.map(_._2).sum
    // integer DIV loses a little mass each round, never gains
    assert(total <= PageRank.Scale)
    assert(total > (PageRank.Scale * 8) / 10, s"lost too much mass: $total")
    val (seedRanks, otherRanks) = rows.partition(_._1 % 100 == 0)
    assert(seedRanks.nonEmpty)
    val seedAvg = seedRanks.map(_._2).sum / seedRanks.length
    val otherAvg = otherRanks.map(_._2).sum / otherRanks.length
    assert(seedAvg > otherAvg * 10,
      s"teleport must concentrate mass on seeds: $seedAvg vs $otherAvg")
  }
}
