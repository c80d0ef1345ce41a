package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.dws.{Behavior, TimeSeries, TrendTests}

/** Property-based laws of the trend/attribution/clamp kernels against
  * plain-Scala models (generated inputs, ScalaCheck — the KernelProps
  * convention). */
object TrendProps extends Properties("trend") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSession.spark
  import spark.implicits._

  /** A per-day count series for one key, as an orders-shaped frame. */
  private def ordersOf(counts: List[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      val day = java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong))
      (0 until c).map(_ => ("P", day, 100.0))
    }.toDF("o_orderpriority", "o_orderdate", "o_totalprice")

  private val seriesGen: Gen[List[Int]] =
    Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 40)))

  property("clampedInventory == the plain-Scala saturating fold") =
    forAll(seriesGen) { counts =>
      val out = TimeSeries.clampedInventory(ordersOf(counts))
        .collect().head
      // model: lower median by (cnt, day) order — day order is list
      // order, so stable sort by cnt preserves it
      val n = counts.length
      val sorted = counts.zipWithIndex.sortBy(t => (t._1, t._2))
      val med = sorted((n + 1) / 2 - 1)._1.toLong
      var (inv, lo, hi) = (0L, 0L, 0L)
      counts.foreach { c =>
        val raw = inv + c - med
        if (raw < 0) lo += 1
        if (raw > 25) hi += 1
        inv = math.max(0L, math.min(25L, raw))
      }
      out.getAs[Long]("med") == med &&
        out.getAs[Long]("final_balance") == inv &&
        out.getAs[Long]("floor_clamps") == lo &&
        out.getAs[Long]("cap_clamps") == hi
    }

  /** Monthly count series (Mann–Kendall / Theil–Sen group on months). */
  private def monthlyOrdersOf(counts: List[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      val day = java.sql.Date.valueOf(
        java.time.LocalDate.of(2023, 1, 1).plusMonths(i.toLong))
      (0 until c).map(_ => ("P", day, 100.0))
    }.toDF("o_orderpriority", "o_orderdate", "o_totalprice")

  property("mannKendall S and var18 == the O(n²) definition") =
    forAll(seriesGen) { counts =>
      val out = TrendTests.mannKendall(monthlyOrdersOf(counts))
        .collect().head
      val n = counts.length
      val s = (for {
        i <- 0 until n; j <- i + 1 until n
      } yield math.signum(counts(j) - counts(i)).toLong).sum
      val tie18 = counts.groupBy(identity).values.map(_.size.toLong)
        .filter(_ > 1).map(t => t * (t - 1) * (2 * t + 5)).sum
      val var18 = n.toLong * (n - 1) * (2L * n + 5) - tie18
      out.getAs[Long]("s_stat") == s && out.getAs[Long]("var18") == var18
    }

  property("theilSen == the lower median of all pairwise slopes") =
    forAll(seriesGen) { counts =>
      val out = TrendTests.theilSen(monthlyOrdersOf(counts))
        .collect().head
      val n = counts.length
      val slopes = (for {
        i <- 0 until n; j <- i + 1 until n
      } yield ((counts(j) - counts(i)).toDouble / (j - i),
          i + 1, j + 1)).sortBy(identity)
      val med = slopes((slopes.length + 1) / 2 - 1)._1
      out.getAs[Long]("n_pairs") == slopes.length.toLong &&
        out.getAs[Double]("slope_med6") == math.rint(med * 1e6) / 1e6
    }

  /** Random event stream: ~1/4 purchases, touches before/after. */
  private val eventsGen: Gen[List[(Long, Int, Int, Int)]] =
    Gen.choose(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(
        Gen.choose(0L, 5L),      // user
        Gen.choose(0, 3),        // 0=view 1=click 2,3=purchase-ish
        Gen.choose(0, 20 * 24),  // hour offset inside 20 days
        Gen.choose(1, 9999))))   // cents

  property("attribution conserves purchase cents under EVERY model") =
    forAll(eventsGen) { rows =>
      val df = rows.zipWithIndex.map { case ((u, t, h, c), i) =>
        val typ = t match {
          case 0 => "view"
          case 1 => "click"
          case _ => if (i % 2 == 0) "purchase" else "view"
        }
        (i.toLong, new java.sql.Timestamp(
          java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
            + h * 3600000L),
          u, typ, c / 100.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val cents = rows.zipWithIndex.collect {
        case ((_, t, _, c), i) if t >= 2 && i % 2 == 0 => c.toLong
      }.sum
      val byModel = Behavior.attributionCredit(df)
        .groupBy("model").agg(sum("credit_cents"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      if (cents == 0L) byModel.isEmpty
      else byModel == Map("first_touch" -> cents, "last_touch" -> cents,
        "linear" -> cents)
    }
}
