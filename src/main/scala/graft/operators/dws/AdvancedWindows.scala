package graft.operators.dws

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** Windowing capabilities beyond the reference's fixed 10 s tumble
  * (the reference has no sliding/session windows or rollups —
  * SURVEY §2.6/§2.8 — but an engine replacing it should): native
  * `session_window`, sliding `window`, and `rollup` aggregates.
  */
object AdvancedWindows {

  /** Gap-based session windows (native `session_window`, 30 min gap):
    * per-user sessions with bounds and event counts — the declarative
    * form of the CEP sessionization kernel. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("ev_ct"),
        round(sum(col("value")), 2).as("val_sum"))
      .select(
        TimeFns.stt(col("w")).as("stt"),
        TimeFns.edt(col("w")).as("edt"),
        col("user_id"), col("ev_ct"), col("val_sum"))

  /** Sliding (hopping) windows: 1 h length, 30 min slide — each event
    * lands in exactly two windows. */
  def slidingWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("ev_ct"),
        countDistinct(col("user_id")).as("uu_ct"))
      .select(TimeFns.stt(col("w")).as("stt"), TimeFns.edt(col("w")).as("edt"),
        col("ev_ct"), col("uu_ct"))
      .orderBy("stt")

  /** ROLLUP over the snowflake dims: (region, brand) → region → grand
    * total; subtotal rows labeled via `grouping()` so genuine NULL
    * group values can never collide with rollup totals. */
  def regionBrandRollup(lineitem: DataFrame, part: DataFrame,
                        supplier: DataFrame, nation: DataFrame,
                        region: DataFrame): DataFrame =
    graft.operators.dwd.Joins
      .snowflakeBase(lineitem, part, supplier, nation, region)
      .rollup(col("r_name"), col("p_brand"))
      .agg(count(lit(1)).as("line_ct"),
        round(sum(col("l_extendedprice")), 2).as("amount_sum"),
        grouping(col("r_name")).as("__gr"),
        grouping(col("p_brand")).as("__gb"))
      .select(
        when(col("__gr") === 1, lit("ALL"))
          .otherwise(coalesce(col("r_name"), lit("NULL"))).as("r_name"),
        when(col("__gb") === 1, lit("ALL"))
          .otherwise(coalesce(col("p_brand"), lit("NULL"))).as("p_brand"),
        col("line_ct"), col("amount_sum"))
      .orderBy("r_name", "p_brand")
}
