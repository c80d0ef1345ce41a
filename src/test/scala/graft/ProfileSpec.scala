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
}
