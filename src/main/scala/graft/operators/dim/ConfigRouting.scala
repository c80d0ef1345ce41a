package graft.operators.dim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-deterministic view of the config-driven DIM routing (J5):
  * events stand in for the CDC stream (event_type = source table), a
  * literal config frame stands in for `table_process`
  * (`TableProcess.java:11-22`), and per-row column pruning follows the
  * config's `sink_columns` string exactly like
  * `TableProcessFunction.java:157-175`. Unknown tables drop out of the
  * inner broadcast join (`:146-149` logs and drops them).
  */
object ConfigRouting {

  def configFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("click", "dwd_click", "event_id,user_id", "event_id"),
      ("purchase", "dwd_purchase", "event_id,user_id,value", "event_id"),
      ("signup", "dwd_signup", "event_id", "event_id")
    ).toDF("source_table", "sink_table", "sink_columns", "sink_pk")
  }

  def apply(events: DataFrame, config: DataFrame): DataFrame = {
    def keep(c: String, v: org.apache.spark.sql.Column) =
      when(array_contains(split(col("sink_columns"), ","), c), v)
    events
      .join(broadcast(config), col("event_type") === col("source_table"))
      .select(col("sink_table"), col("event_id"),
        keep("user_id", col("user_id")).as("user_id"),
        keep("value", round(col("value"), 2)).as("value"))
      .orderBy("sink_table", "event_id")
  }
}
