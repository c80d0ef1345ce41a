package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.dwd.AsofJoin

/** Measures the as-of join's design claim — one key exchange, no
  * range blow-up — against the naive range-join + keep-latest
  * reformulation. Events are amplified IN-KEY (same users, `copies`×
  * the rows), so per-user click counts grow linearly and the range
  * join's intermediate (every purchase × every earlier click of its
  * user) grows quadratically while the union-tag form stays linear.
  * Results are required identical.
  *
  * usage: runMain graft.tools.AsofSoak [sfDir] [copies]
  */
object AsofSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.core.Sessions.local("32")
    val shuffle = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shuffle.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    val base = Tables.events(spark, sfDir)
    val big = (1 until copies).foldLeft(base) { (acc, r) =>
      acc.unionByName(base.select(
        (col("event_id") + lit(r.toLong * 1000000000L)).as("event_id"),
        // jitter inside the same second keeps ordering interesting
        (col("ts") + expr(s"make_interval(0, 0, 0, 0, 0, 0, 0.0${r}1)"))
          .as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props")))
    }
    big.write.mode("overwrite").parquet("/tmp/asof-soak-events")
    val events = spark.read.parquet("/tmp/asof-soak-events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id"), col("ts"),
        col("value"))
    println(s"[soak] purchases=${purchases.count()} clicks=${clicks.count()}")

    def measure(name: String)(f: => Long): Unit = {
      shuffle.set(0)
      val t0 = System.nanoTime()
      val rows = f
      println(f"[soak] $name: $rows rows, " +
        f"${shuffle.get / 1048576.0}%.1f MB shuffle, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val args6 = ("user_id", "ts", "user_id", "ts", Seq("cid", "value"), "cid")
    measure("union-tag carry-forward") {
      AsofJoin.asofJoin(purchases, clicks, args6._1, args6._2, args6._3,
        args6._4, args6._5, args6._6).count()
    }
    measure("range join + keep-latest") {
      AsofJoin.asofViaRangeJoin(purchases, clicks, args6._1, args6._2,
        args6._3, args6._4, args6._5, args6._6).count()
    }
    val a = AsofJoin.asofJoin(purchases, clicks, args6._1, args6._2,
      args6._3, args6._4, args6._5, args6._6)
    val b = AsofJoin.asofViaRangeJoin(purchases, clicks, args6._1, args6._2,
      args6._3, args6._4, args6._5, args6._6)
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "forms disagree")
    println("[soak] DONE results identical")
    spark.stop()
  }
}
