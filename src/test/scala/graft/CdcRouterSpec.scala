package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.CdcRouter

/** Config-driven DIM routing (J5/K5/K6): broadcast-join routing,
  * dynamic column pruning, last-wins upsert by PK, per-table sinks. */
class CdcRouterSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private case class Cdc(source_table: String, id: String, name: String,
                         extra: String, ver: Long)

  private val config = Seq(
    ("dim_a", "sink_a", "id,name", "id"),
    ("dim_b", "sink_b", "id,extra", "id")
  ).toDF("source_table", "sink_table", "sink_columns", "sink_pk")

  test("streaming fan-out: routes, prunes, upserts last-wins by pk") {
    val out = Files.createTempDirectory("cdc_router").toString
    val ms = MemoryStream[(String, String, String, String, Long)]
    ms.addData(
      ("dim_a", "1", "alice", "x", 1L),
      ("dim_a", "1", "alice2", "x", 2L), // update → last-wins
      ("dim_a", "2", "bob", "x", 1L),
      ("dim_b", "9", "n", "payload", 1L),
      ("unknown", "z", "n", "x", 1L))    // unknown table → dropped
    val cdcStream = ms.toDF()
      .toDF("source_table", "id", "name", "extra", "ver")
    CdcRouter.run(spark, cdcStream, config, "source_table", "ver", out)

    val a = spark.read.parquet(s"$out/sink_a")
    assert(a.columns.toSet == Set("id", "name", "ver")) // pruned + version ("dynamic DDL")
    val rows = a.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(rows == Map("1" -> "alice2", "2" -> "bob"))

    val b = spark.read.parquet(s"$out/sink_b")
    assert(b.columns.toSet == Set("id", "extra", "ver"))
    assert(b.count() == 1)
    assert(!new java.io.File(s"$out/unknown").exists())
  }

  test("multi-batch fan-out merges across batches; empty slice is a no-op") {
    val out = Files.createTempDirectory("cdc_router2").toString
    val ms = MemoryStream[(String, String, String, String, Long)]
    val cdcStream = ms.toDF().toDF("source_table", "id", "name", "extra", "ver")
    // batch 1: rows for both tables
    ms.addData(("dim_a", "1", "alice", "x", 1L), ("dim_b", "9", "n", "p", 1L))
    CdcRouter.run(spark, cdcStream, config, "source_table", "ver", out)
    // batch 2 (separate query run): only dim_a rows — dim_b must survive
    ms.addData(("dim_a", "2", "bob", "x", 2L), ("dim_a", "1", "alice2", "x", 3L))
    CdcRouter.run(spark, cdcStream, config, "source_table", "ver", out)

    val a = spark.read.parquet(s"$out/sink_a").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("name"))).toMap
    assert(a == Map("1" -> "alice2", "2" -> "bob")) // merged, last-wins by ver
    assert(spark.read.parquet(s"$out/sink_b").count() == 1) // not wiped
  }

  test("sink_columns already containing the version column stays unambiguous") {
    val out = Files.createTempDirectory("cdc_router3").toString
    val cfgWithVer = Seq(("dim_a", "sink_a", "id,name,ver", "id"))
      .toDF("source_table", "sink_table", "sink_columns", "sink_pk")
    val ms = MemoryStream[(String, String, String, String, Long)]
    val cdcStream = ms.toDF().toDF("source_table", "id", "name", "extra", "ver")
    ms.addData(("dim_a", "1", "alice", "x", 1L), ("dim_a", "1", "alice2", "x", 2L))
    CdcRouter.run(spark, cdcStream, cfgWithVer, "source_table", "ver", out)
    val a = spark.read.parquet(s"$out/sink_a")
    assert(a.columns.count(_ == "ver") == 1)
    assert(a.collect().map(r => (r.getAs[String]("id"), r.getAs[String]("name")))
      .toMap == Map("1" -> "alice2"))
  }
}
