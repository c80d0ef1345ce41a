package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.dwd.SetOps

/** Measures the per-group top-k claim: the bounded typed Aggregator
  * ships ≤k rows per key out of the partial aggregation, while the
  * window-rank form shuffles and sorts EVERY row. Runs both on an
  * amplified orders table (replicated rows per key, so per-key row
  * counts grow while the key space stays fixed) and requires
  * identical results.
  *
  * usage: runMain graft.tools.TopKSoak [sfDir] [copies]
  */
object TopKSoak {
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
    // amplify per-key rows: same custkeys, shifted orderkeys/prices
    val base = Tables.orders(spark, sfDir)
    val big = (1 until copies).foldLeft(base) { (acc, r) =>
      acc.unionByName(base.select(
        (col("o_orderkey") + lit(r.toLong * 100000000L)).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"),
        (col("o_totalprice") + lit(r * 0.01)).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority")))
    }
    big.write.mode("overwrite")
      .parquet("/tmp/topk-soak-orders")
    val orders = spark.read.parquet("/tmp/topk-soak-orders")
    val n = orders.count()

    def measure(name: String)(f: => Long): (Long, Long) = {
      shuffle.set(0)
      val t0 = System.nanoTime()
      val rows = f
      println(f"[soak] $name: $rows rows, " +
        f"${shuffle.get / 1048576.0}%.1f MB shuffle, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      (rows, shuffle.get)
    }

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val (wRows, wBytes) = measure("window row_number form") {
      orders.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).count()
    }
    val (aRows, aBytes) = measure("bounded aggregator form") {
      SetOps.topKPerGroup(orders, k = 3).count()
    }
    require(wRows == aRows, s"forms disagree: $wRows vs $aRows")
    println(f"[soak] DONE rows=$n copies=$copies shuffle " +
      f"${wBytes / 1048576.0}%.1f MB -> ${aBytes / 1048576.0}%.1f MB " +
      f"(${100.0 * (wBytes - aBytes) / math.max(wBytes, 1)}%.0f%% saved)")
    spark.stop()
  }
}
