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
}
