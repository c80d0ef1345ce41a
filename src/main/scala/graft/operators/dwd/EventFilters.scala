package graft.operators.dwd

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.functions.JsonFns

/** DWD projection/filter pipelines (SURVEY §2.3, P1–P12) over the
  * driver's `events`/`orders` stand-ins (FIXTURES.md §2).
  *
  * Every operator here is a plain declarative `filter`/`select` so
  * Catalyst pushes predicates and column pruning into the parquet scan
  * (`PushedFilters` in `.explain("formatted")`) — the reference
  * hand-performs this pushdown by filtering each CDC sub-stream before
  * use (`DwdTradeOrderPreProcess.java:45-135`); in Spark it is free.
  */
object EventFilters {

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  /** P1 — JSON parse + quarantine split (`BaseLogApp.java:54-69`).
    * Deterministically corrupts every 10th record to exercise the dirty
    * path, then reports clean/dirty counts per event_type. */
  def jsonQuarantine(events: DataFrame): DataFrame = {
    val corrupted = events.withColumn("payload",
      when(col("event_id") % 10 === 0, substring(col("props"), 1, 3))
        .otherwise(col("props")))
    JsonFns.parseWithQuarantine(corrupted, col("payload"), propsSchema)
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("is_dirty"), 1L).otherwise(0L)).as("dirty_ct"),
        sum(when(!col("is_dirty"), 1L).otherwise(0L)).as("clean_ct"),
        sum(when(!col("is_dirty"), col("parsed.k")).otherwise(0L)).as("k_sum"))
      .orderBy("event_type")
  }

  /** P2 — op-type whitelist filter (`DimApp.java:53-72` keeps
    * insert/update/bootstrap-insert). */
  def opTypeFilter(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin("purchase", "signup", "click"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
      .orderBy("event_id")

  /** P3 — CDC `data['x'] AS x` projection
    * (`DwdTradeOrderPreProcess.java:45-99`) over the JSON props map. */
  def cdcExtract(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        col("event_type").as("table_name"),
        JsonFns.jsonField(col("props"), "k").cast("int").as("k"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_time"))
      .filter(col("k").isNotNull && col("k") > 50)
      .orderBy("event_id")

  /** P4 — state-transition detection over the CDC `old` map
    * (`DwdTradeCancelDetail.java:86-113`: `table='order_info' and
    * type='update' and data['order_status']='1003' and
    * old['order_status'] is not null`). The envelope is reconstructed
    * deterministically from `orders` (finished orders become `update`
    * rows whose `old` map carries the prior status), then filtered via
    * genuine map-column access. */
  def stateTransition(orders: DataFrame): DataFrame = {
    val envelope = orders.select(
      lit("order_info").as("table"),
      when(col("o_orderstatus") === "F", lit("update"))
        .otherwise(lit("insert")).as("type"),
      map(lit("id"), col("o_orderkey").cast("string"),
        lit("order_status"), col("o_orderstatus"),
        lit("total"), col("o_totalprice").cast("string")).as("data"),
      when(col("o_orderstatus") === "F",
        map(lit("order_status"), lit("O"))).as("old"))
    envelope
      .filter(col("table") === "order_info" && col("type") === "update" &&
        col("data")("order_status") === "F" &&
        col("old")("order_status").isNotNull)
      .select(col("data")("id").cast("long").as("order_id"),
        col("old")("order_status").as("prev_status"),
        col("data")("order_status").as("cur_status"))
      .orderBy("order_id")
  }

  /** P5 — conditional computed column (cart-add delta,
    * `DwdTradeCartAdd.java:40-63`): signed value by op type, then a
    * daily rollup. */
  def conditionalDelta(events: DataFrame): DataFrame =
    events
      .withColumn("signed_value",
        when(col("event_type") === "purchase", col("value"))
          .when(col("event_type") === "error", -col("value"))
          .otherwise(lit(0.0)))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("cur_date"))
      .agg(round(sum(col("signed_value")), 2).as("net_value"),
        count(lit(1)).as("event_ct"))
      .orderBy("cur_date")

  /** P7–P11 — representative compound predicate (status + amount;
    * shape of `DwdTradeCancelDetail.java:86-113`,
    * `DwsUserUserLoginWindow.java:67-78`). */
  def compoundFilter(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderstatus") === "O" &&
        col("o_totalprice") > 100000 &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("o_orderpriority"))
      .orderBy("o_orderkey")

  /** P8 — keyword-search filter shape
    * (`DwsTrafficSourceKeywordPageViewWindow.java:57-65`: page =
    * 'search' AND item_type = 'keyword' AND item IS NOT NULL): triple
    * conjunct ending in a payload null test. */
  def searchKeywordFilter(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "click" &&
        col("user_id").isNotNull &&
        JsonFns.jsonField(col("props"), "k").isNotNull)
      .select(col("event_id"), col("user_id"),
        JsonFns.jsonField(col("props"), "k").cast("int").as("k"))
      .orderBy("event_id")

  /** P9 — page-id whitelist
    * (`DwsTrafficPageViewWindow.java:68-81`: home | good_detail). */
  def pageWhitelistFilter(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
      .orderBy("event_id")

  /** P10 — login filter (`DwsUserUserLoginWindow.java:67-78`: uid IS
    * NOT NULL AND (last_page_id IS NULL OR last_page_id = 'login')):
    * conjunct of a null test with a null-tolerant disjunction. */
  def loginFilter(events: DataFrame): DataFrame =
    events
      .filter(col("user_id").isNotNull &&
        (JsonFns.jsonField(col("props"), "k").isNull ||
          col("event_type") === "signup"))
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")

  /** P11 — status-code equality filter
    * (`DwdTradePayDetailSuc.java:43-53`: payment_status = '1602'). */
  def paySuccessFilter(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "purchase" &&
        JsonFns.jsonField(col("props"), "k").cast("int") % 16 === 2)
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("value"))
      .orderBy("event_id")

  /** P12 — disjunctive filter with un-cancel semantics
    * (`DwdInteractionFavorAdd.java:55-64`: insert OR (update AND
    * is_cancel='0')). */
  def favorAddFilter(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "click" ||
        (col("event_type") === "error" && col("value") < 50))
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
      .orderBy("event_id")

  /** §2.7 — scalar-function surface: date/string/conditional built-ins
    * that cover the reference's utility layer (`DateFormatUtil`,
    * `TimestampLtz3CompareUtil`, `StringUtils.join`, casts). */
  def scalarFns(events: DataFrame): DataFrame =
    events
      .filter(col("event_id") < 100)
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        date_format(col("ts"), "yyyy-MM-dd").as("dt"),
        hour(col("ts")).cast("int").as("hr"),
        floor(unix_timestamp(col("ts"))).cast("long").as("epoch_s"),
        concat_ws("-", col("event_type"), col("user_id")).as("joined"),
        upper(col("event_type")).as("upper_type"),
        length(col("event_type")).cast("int").as("type_len"),
        split_part(col("event_type"), lit("i"), lit(1)).as("first_part"),
        when(col("value") > 100, lit("high")).otherwise(lit("low")).as("band"),
        coalesce(JsonFns.jsonField(col("props"), "missing"),
          lit("none")).as("missing_prop"))
      .orderBy("event_id")

  /** The array / higher-order-function surface in one query: per row,
    * a deterministic integer array (sequence keyed off event_id) run
    * through transform, filter, fold (aggregate), zip_with, exists,
    * sort and slice — every lambda kernel a pipeline leans on, in
    * pure integer arithmetic so the oracle's list functions replay
    * them exactly. */
  def arrayFns(events: DataFrame): DataFrame = {
    val arr = sequence(lit(1), col("event_id") % 7 + 2) // 2..8 elements
    events
      .filter(col("event_id") < 200)
      .select(
        col("event_id"),
        size(arr).cast("int").as("n"),
        aggregate(transform(arr, x => x * x), lit(0L),
          (acc, v) => acc + v).as("sum_sq"),
        size(filter(arr, x => x % 2 === 0)).cast("int").as("even_ct"),
        aggregate(zip_with(arr, reverse(arr), (a, b) => a * b), lit(0L),
          (acc, v) => acc + v).as("dot_rev"),
        exists(arr, x => x === 5).as("has_five"),
        array_join(slice(sort_array(arr, asc = false), 1, 3), ",")
          .as("top3"),
        array_join(transform(arr, x => concat(lit("e"), x)), ",")
          .as("tagged"))
      .orderBy("event_id")
  }
}
