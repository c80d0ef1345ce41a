package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.dwd.AsofJoin
import graft.operators.dws.{AdvancedWindows, Behavior}

/** Scale soak for the r4 behavior/time-series surface (ad hoc, not
  * driver contract): as-of attribution, trailing RANGE window, hourly
  * resample+ffill, funnel and retention on a synthetically inflated
  * events table (default 10× sf0.1), with wall-clock + shuffle bytes
  * from a stage listener. Results recorded in SCALE.md.
  *
  * Replicas get DISJOINT user spaces (user_id + r·10^6), so every
  * per-user result must scale EXACTLY ×copies — the soak validates
  * that invariant for funnel users, retention cells, and as-of edge
  * counts, proving the operators' semantics survive the scale-up
  * rather than merely not crashing.
  *
  * usage: runMain graft.tools.BehaviorSoak [sfDir] [copies]
  */
object BehaviorSoak {

  def inflate(events: DataFrame, copies: Int): DataFrame = {
    val reps = (1 until copies).map { r =>
      events.select(
        (col("event_id") + lit(r.toLong * 1000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(r.toLong * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    reps.foldLeft(
      events.select("event_id", "ts", "user_id", "event_type", "value",
        "props"))(_.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.core.Sessions.local("32")
    val shuffleTotal = new java.util.concurrent.atomic.AtomicLong
    val shufflePeak = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val w = s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shuffleTotal.addAndGet(w)
        shufflePeak.getAndUpdate(p => math.max(p, w))
        ()
      }
    })
    def mb(b: Long): String = f"${b / 1048576.0}%.0f MB"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[soak] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(shuffle total=${mb(shuffleTotal.get)} peakStage=${mb(shufflePeak.get)})")
      r
    }

    val base = Tables.events(spark, sfDir)
    val big = inflate(base, copies)
    val t0 = System.nanoTime()
    val nEv = time("inflate+count")(big.count())

    val asofRows = time("asof attribution")(
      AsofJoin.purchaseAttribution(big).count())
    val baseAsof = AsofJoin.purchaseAttribution(base).count()
    require(asofRows == baseAsof * copies,
      s"asof edges $asofRows != $copies × $baseAsof — replica isolation broken")

    time("resample+ffill")(AdvancedWindows.resampleFfill(big).count())

    val funnel = time("funnel")(
      Behavior.funnel(big).select("step", "users")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
    val funnelBase = Behavior.funnel(base).select("step", "users")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    require(funnel == funnelBase.view.mapValues(_ * copies).toMap,
      s"funnel $funnel != $copies × $funnelBase")

    val retention = time("retention cohorts")(
      Behavior.retentionCohorts(big))
    val mismatch = retention
      .join(Behavior.retentionCohorts(base)
          .withColumnRenamed("active_users", "base_users"),
        Seq("cohort_date", "day_offset"), "full")
      .filter(coalesce(col("active_users"), lit(-1)) =!=
        coalesce(col("base_users"), lit(-1)) * copies)
      .count()
    require(mismatch == 0, s"$mismatch retention cells broke ×$copies scaling")

    println(f"[soak] DONE events=$nEv copies=$copies " +
      f"total=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"shuffle=${mb(shuffleTotal.get)} peakStage=${mb(shufflePeak.get)}")
    spark.stop()
  }
}
