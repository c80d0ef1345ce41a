package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.{DwsJob, Ev}

/** End-to-end DWS streaming job + the approx-distinct 100 TB swap. */
class DwsJobSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("DWS job: stream -> windowed agg -> upsert store == batch agg") {
    val base = Files.createTempDirectory("dws").toString
    val store = s"$base/store"
    val ckpt = Some(s"$base/ckpt")
    val evs = Seq(
      Ev(1, tsOf("2024-01-01T00:00:01Z"), 1, "view", 10.0),
      Ev(2, tsOf("2024-01-01T00:00:04Z"), 2, "view", 20.0),
      Ev(3, tsOf("2024-01-01T00:00:11Z"), 1, "click", 5.0),
      Ev(4, tsOf("2024-01-01T00:01:00Z"), 1, "view", 2.0),
      // watermark sentinel
      Ev(99, tsOf("2030-01-01T00:00:00Z"), 999, "sentinel", 0.0))
    // two runs against one checkpoint: the restart resumes window state
    // and offsets, so windows spanning the stop/start boundary survive
    val ms = MemoryStream[Ev]
    ms.addData(evs.take(3): _*)
    DwsJob.run(spark, ms.toDF(), store, ckpt)
    ms.addData(evs.drop(3): _*)
    DwsJob.run(spark, ms.toDF(), store, ckpt)

    val got = spark.read.parquet(store)
      .filter(col("event_type") =!= "sentinel")
      .select("stt", "event_type", "pv_ct", "val_sum")
    val want = graft.operators.dws.TrafficWindows
      .keyedWindow(evs.take(4).toDF())
      .select("stt", "event_type", "pv_ct", "val_sum")
    assertSameRows(got, want)
  }

  test("approx_count_distinct swap stays within HLL error bound") {
    val d = sf0001
    val exact = graft.operators.dws.ProvinceOrderWindow(
      Tables.lineitem(spark, d), Tables.orders(spark, d),
      Tables.customer(spark, d), Tables.nation(spark, d))
      .select(col("stt"), col("province_name"), col("order_count"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val approx = graft.operators.dws.ProvinceOrderWindow.approx(
      Tables.lineitem(spark, d), Tables.orders(spark, d),
      Tables.customer(spark, d), Tables.nation(spark, d))
      .select(col("stt"), col("province_name"), col("order_count"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex) <= math.max(2.0, ex * 0.10),
        s"$k: exact=$ex approx=$ap")
    }
  }
}
