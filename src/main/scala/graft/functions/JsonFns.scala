package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON parse + dirty-data quarantine.
  *
  * Reference P1: `BaseLogApp.java:54-69` parses each Kafka record with
  * fastjson and routes unparseable rows to a `Dirty` side output.
  * Spark has no side outputs; the idiomatic re-expression is a single
  * `from_json` pass producing a `parsed` struct plus an `is_dirty`
  * flag, from which callers take the two filtered projections (clean /
  * quarantine). One scan, no shuffle, fully codegen'd.
  */
object JsonFns {

  /** Adds `parsed` (struct) and `is_dirty` columns. PERMISSIVE
    * `from_json` returns an all-null struct for malformed input, so the
    * reliable dirty signal is the documented `_corrupt_record` idiom:
    * extend the schema with the corrupt-record column and check it —
    * the exact Spark twin of the reference's try/catch → side-output
    * contract. */
  def parseWithQuarantine(df: DataFrame, jsonCol: Column,
                          schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", StringType)
    df.withColumn("parsed", from_json(jsonCol, withCorrupt,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")))
      // null, empty, and whitespace-only input are dirty too — the
      // reference's JSON.parseObject throws on all three into the side
      // output. `from_json("")` returns a NULL struct WITHOUT setting
      // _corrupt_record (the parser sees no token, so PERMISSIVE
      // corrupt handling never fires — verified on Spark 4.1.2), so
      // dirtiness must also test the struct itself: treating these as
      // clean would let them fail every split filter and vanish from
      // all outputs including the quarantine.
      .withColumn("is_dirty",
        jsonCol.isNull || col("parsed").isNull ||
          col("parsed._corrupt_record").isNotNull)
  }

  /** CDC-style map access `data['k']` (P3, e.g.
    * `DwdTradeOrderPreProcess.java:45-99`) over a JSON-string column. */
  def jsonField(jsonCol: Column, field: String): Column =
    get_json_object(jsonCol, s"$$.$field")

  /** Semi-structured payload aggregation through Spark 4's VARIANT
    * type: `parse_json` ONCE into a binary variant column, then typed
    * `variant_get` path extraction — the schema-free alternative to
    * `from_json`+StructType ([[parseWithQuarantine]]) for payloads
    * whose shape isn't declared up front (the reference's fastjson
    * `JSONObject.get` style, but engine-native). At 100 TB the
    * parse-once contract is the point: every additional extracted
    * path reads the already-decoded binary variant instead of
    * re-tokenizing the JSON string per field the way chained
    * `get_json_object` calls do, and the whole pipeline stays inside
    * whole-stage codegen (no UDF). Output contract (integer-exact in
    * both engines — the DuckDB oracle extracts the same path with
    * `json_extract_string` + CAST): per event_type, row count and
    * sum/min/max of the `$.k` payload field. */
  def variantPropsAgg(events: DataFrame): DataFrame =
    events
      .withColumn("__v", parse_json(col("props")))
      .withColumn("__k", expr("variant_get(__v, '$.k', 'bigint')"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("ct"),
        sum(col("__k")).cast("bigint").as("k_sum"),
        min(col("__k")).as("k_min"),
        max(col("__k")).as("k_max"))
      .orderBy("event_type")
}
