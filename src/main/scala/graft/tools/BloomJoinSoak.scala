package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.dwd.Joins

/** Measures what the bloom prune actually saves in the regime it
  * exists for: broadcast disabled (the dim is "too big"), so both
  * variants run shuffle joins, and the only difference is whether the
  * fact side is bloom-filtered BEFORE its exchange. Reports shuffle
  * bytes and fact rows exchanged for plain vs bloom-pruned at sf0.1.
  *
  * usage: runMain graft.tools.BloomJoinSoak [sfDir]
  */
object BloomJoinSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("32")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val shuffle = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shuffle.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    def measure(name: String)(f: => Long): (Long, Long) = {
      shuffle.set(0)
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[soak] $name: $rows rows, ${shuffle.get / 1048576.0}%.1f MB " +
        f"shuffle, $sec%.1f s")
      (rows, shuffle.get)
    }

    val li = Tables.lineitem(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val dim = orders.filter(month(col("o_orderdate")) === 1)
      .select(col("o_orderkey"), col("o_custkey"))

    val (plainRows, plainBytes) = measure("plain shuffle join") {
      li.select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .join(dim, col("l_orderkey") === col("o_orderkey")).count()
    }
    val (bloomRows, bloomBytes) = measure("bloom-pruned shuffle join") {
      Joins.bloomPrunedJoin(li, orders).count()
    }
    require(plainRows == bloomRows,
      s"bloom prune changed the result: $plainRows vs $bloomRows")
    println(f"[soak] DONE shuffle ${plainBytes / 1048576.0}%.1f MB -> " +
      f"${bloomBytes / 1048576.0}%.1f MB " +
      f"(${100.0 * (plainBytes - bloomBytes) / math.max(plainBytes, 1)}%.0f%% saved)")
    spark.stop()
  }
}
