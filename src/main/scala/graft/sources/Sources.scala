package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source builders (SURVEY §2.1, S1–S6).
  *
  * The reference consumes Kafka topics (string + JSON-table + CDC
  * envelope), a MySQL CDC config stream, a JDBC lookup dim, and socket
  * streams in tests. Spark twins below; the Kafka/JDBC builders
  * construct the standard plans and need the matching connector jar on
  * the deploy classpath (not shipped in this offline build — the
  * file/rate/memory paths are fully exercised in tests instead).
  */
object Sources {

  /** S1/S2 — Kafka string/JSON source
    * (`MyKafkaUtil.java:26-53,82-89`): value bytes → string column,
    * optional JSON schema applied. Requires spark-sql-kafka at deploy. */
  def kafkaJson(spark: SparkSession, bootstrap: String, topic: String,
                groupId: String, schema: Option[StructType] = None): DataFrame = {
    val raw = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("kafka.group.id", groupId)
      .option("startingOffsets", "earliest")
      .load()
      .selectExpr("CAST(value AS STRING) AS value")
    schema.fold(raw)(s =>
      raw.select(from_json(col("value"), s).as("parsed"), col("value")))
  }

  /** S3 — CDC-envelope schema (Maxwell format, FIXTURES.md §1.2):
    * struct<database,table,type,data map,old map> + processing time. */
  val cdcEnvelopeSchema: StructType = StructType.fromDDL(
    "database STRING, `table` STRING, type STRING, ts STRING, " +
      "data MAP<STRING,STRING>, old MAP<STRING,STRING>")

  /** S3 — parse a raw JSON stream into the CDC envelope + `pt`
    * processing time (`MyKafkaUtil.java:128-137`). */
  def cdcEnvelope(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.select(from_json(col(jsonCol), cdcEnvelopeSchema).as("e"))
      .select(col("e.*"), current_timestamp().as("pt"))

  /** S4 — CDC config stream stand-in: snapshot-per-micro-batch re-read
    * (SURVEY S4 choice — no native Spark CDC). `refresh` is called in
    * each `foreachBatch`, giving the same freshness as the reference's
    * snapshot-then-binlog with per-batch granularity. */
  def snapshotPerBatch(refresh: () => DataFrame): () => DataFrame = refresh

  /** S5 — JDBC lookup dim (`MysqlUtil.java:10-35`): a static frame
    * re-read per micro-batch ≈ the reference's 1 h-TTL lookup cache.
    * Requires a JDBC driver jar at deploy. */
  def jdbcDim(spark: SparkSession, url: String, table: String,
              props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S6 — socket text source (tests only in the reference,
    * `Flink04_DataStreamJoinTest.java:25`). */
  def socket(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** File-based stream over a directory of parquet/json — the
    * replayable source used to drive every streaming job in this repo
    * (and the natural 100 TB lakehouse ingest path). */
  def fileStream(spark: SparkSession, schema: StructType, path: String,
                 format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(path)
}
