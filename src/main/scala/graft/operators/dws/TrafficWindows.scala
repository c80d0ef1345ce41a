package graft.operators.dws

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TimeFns, Tokenize}

/** DWS windowed traffic aggregates (SURVEY §2.5 A1/A5/A6/A10) over the
  * `events` stream stand-in.
  *
  * The reference computes 10 s event-time tumbling windows with
  * incremental reduce (e.g. `DwsTrafficVcChArIsNewPageViewWindow
  * .java:133-178`); Spark's `groupBy(window(...)).agg` gives the same
  * semantics with partial aggregation (map-side combine) before the
  * single shuffle — the property that keeps this plan viable at 100 TB.
  * The global `windowAll` variants (A5, parallelism-1 in Flink) become
  * ordinary windowed groupBys: Spark still computes them in parallel
  * via partial aggregation; only the final merge per window is single-
  * threaded, and there are few windows.
  */
object TrafficWindows {

  /** A1 — keyed 10 s tumbling window: per event_type counts + sums
    * (`DwsTrafficVcChArIsNewPageViewWindow.java:133-178`). */
  def keyedWindow(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("pv_ct"),
        round(sum(col("value")), 2).as("val_sum"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("event_type"), col("pv_ct"), col("val_sum"))
      .orderBy("stt", "event_type")

  /** A5 — global (un-keyed) tumbling window, 1 h: totals + exact uu
    * (`DwsTradeOrderWindow.java:172-192` windowAll shape). */
  def globalWindow(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("ev_ct"),
        round(sum(col("value")), 2).as("val_sum"),
        countDistinct(col("user_id")).as("uu_ct"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("ev_ct"), col("val_sum"), col("uu_ct"))
      .orderBy("stt")

  /** A10 — daily unique visitors (`DwdTrafficUniqueVisitorDetail
    * .java:76-105`: per-mid per-day dedup; batch twin = exact distinct
    * per day). */
  def dailyUv(events: DataFrame): DataFrame =
    events
      .groupBy(TimeFns.toDateStr(col("ts")).as("cur_date"))
      .agg(countDistinct(col("user_id")).as("uv_ct"),
        count(lit(1)).as("pv_ct"))
      .orderBy("cur_date")

  /** U1+A6 — tokenizer + keyword frequency
    * (`DwsTrafficSourceKeywordPageViewWindow.java:57-89`: LATERAL
    * TABLE(SplitFunction) → group window count). Tokenization uses the
    * codegen'd built-ins; `explode` is Spark's Generator twin of the
    * reference's UDTF. */
  def keywordFrequency(documents: DataFrame): DataFrame =
    graft.core.Tables.spread(documents)
      .select(col("doc_id"), explode(Tokenize.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("word_ct"),
        countDistinct(col("doc_id")).as("doc_ct"))
      .orderBy(desc("word_ct"), asc("word"))

  /** Deterministic CJK fixture (original sample phrases; the driver's
    * documents table is ASCII-only) routed through the same U1+A6
    * pipeline — proves the Han-run bigram segmentation end-to-end
    * against a DuckDB oracle applying the identical rule in SQL. */
  def cjkFixture(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "实时数据仓库 spark 构建"),
      (2L, "数据仓库 与 流处理 平台"),
      (3L, "大数据 实时 分析 引擎"),
      (4L, "spark 流处理 引擎 构建"),
      (5L, "数据 分析 平台"),
      (6L, "实时计算 与 大数据 平台")
    ).toDF("doc_id", "text")
  }
}
