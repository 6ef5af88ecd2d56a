package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The dashboard's query surface
  * (`/root/reference/streamlit_dashboard.py` — SURVEY §3.3: ~8
  * filter→join→groupBy→orderBy→limit compositions, one fresh connection
  * per widget in the reference; here one long-lived SparkSession serves
  * them over the warehouse outputs, ideally the materialized views of
  * [[MaterializedViews]]).
  */
object DashboardQueries {
  import GtfsEtl.WarehouseTables

  /** KPI header (`:84-129`): totals + today's stats in one pass. */
  def kpis(wh: WarehouseTables): DataFrame =
    wh.factDelayEvents.agg(
      count(lit(1)).as("total_delays"),
      countDistinct(col("trip_id")).as("delayed_trips"),
      round(avg(col("delay_minutes")), 2).as("avg_delay"),
      count(when(col("is_severe_delay"), 1)).as("severe_delays"))

  /** Daily trend (`:151-161`). */
  def dailyTrend(wh: WarehouseTables, lastNDays: Int = 30): DataFrame =
    wh.factDelayEvents
      .join(broadcast(wh.dimDate.select("date_key", "full_date")), Seq("date_key"))
      .groupBy(col("full_date"))
      .agg(count(lit(1)).as("n_delays"),
           round(avg(col("delay_minutes")), 2).as("avg_delay"))
      .orderBy(col("full_date").desc)
      .limit(lastNDays)

  /** Top-10 worst routes (`:205-216`). */
  def topRoutes(wh: WarehouseTables): DataFrame =
    wh.factDelayEvents
      .join(broadcast(wh.dimRoute.select("route_key", "route_short_name")),
            Seq("route_key"))
      .groupBy(col("route_short_name"))
      .agg(count(lit(1)).as("n_delays"),
           round(avg(col("delay_minutes")), 2).as("avg_delay"))
      .orderBy(col("avg_delay").desc, col("route_short_name"))
      .limit(10)

  /** Hourly pattern (`:250-258`). */
  def hourlyPattern(wh: WarehouseTables): DataFrame =
    wh.factDelayEvents
      .join(broadcast(wh.dimTime.select("time_key", "hour")), Seq("time_key"))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n_delays"),
           round(avg(col("delay_minutes")), 2).as("avg_delay"))
      .orderBy(col("hour"))

  /** Weather impact (`:287-297`) — fact rows carry no weather column in
    * our fact; join back through the event source the way the reference
    * joins dim_weather. */
  def weatherImpact(delayEvents: DataFrame): DataFrame =
    delayEvents
      .groupBy(col("weather_condition"))
      .agg(count(lit(1)).as("n_delays"),
           round(avg(col("delay_minutes")), 2).as("avg_delay"),
           max(col("delay_minutes")).as("max_delay"))
      .orderBy(col("avg_delay").desc, col("weather_condition"))

  /** Recent predictions table (`:378-389`) over an Evaluation-shaped
    * predictions frame. */
  def recentPredictions(preds: DataFrame, k: Int = 20): DataFrame =
    preds
      .withColumn("risk_level",
        graft.functions.GtfsFunctions.riskLevel(col("predicted")))
      .orderBy(col("predicted").desc, col("trip_id"))
      .limit(k)
}
