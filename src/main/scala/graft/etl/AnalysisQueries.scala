package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 8 analytics queries
  * (`/root/reference/sql/analysis_queries.sql`) over the warehouse star,
  * re-expressed as DataFrame functions (SURVEY.md §3.3: the dashboard's
  * queries are the same compositions).
  *
  * Scale notes: every query aggregates the fact table FIRST (shrinking to
  * group grain) before windows/rankings run, so window partitions are
  * small; dims join via broadcast; top-k goes through orderBy+limit
  * (TakeOrderedAndProject).
  */
object AnalysisQueries {
  import GtfsEtl.WarehouseTables

  /** Q1 (:1-50) — weekly route ranking with LAG trend + ROW_NUMBER rank. */
  def routePerformanceRanking(wh: WarehouseTables): DataFrame = {
    val weekly = wh.factDelayEvents
      .join(broadcast(wh.dimRoute.select("route_key", "route_short_name",
        "route_long_name")), Seq("route_key"))
      .join(broadcast(wh.dimDate.select("date_key", "week_of_year", "year")),
        Seq("date_key"))
      .groupBy(col("route_short_name"), col("route_long_name"),
               col("week_of_year"), col("year"))
      .agg(count(lit(1)).as("total_delays"),
           avg(col("delay_minutes")).as("avg_delay_minutes"),
           sum(when(col("is_severe_delay"), 1).otherwise(0)).as("severe_delays"))
    val wTrend = Window.partitionBy(col("route_short_name"))
      .orderBy(col("year"), col("week_of_year"))
    val wRank = Window.partitionBy(col("year"), col("week_of_year"))
      .orderBy(col("avg_delay_minutes").desc, col("route_short_name"))
    weekly
      .withColumn("prev_week_avg_delay", lag(col("avg_delay_minutes"), 1).over(wTrend))
      .withColumn("performance_rank", row_number().over(wRank))
      .filter(col("performance_rank") <= 5)
      .select(col("route_short_name"), col("route_long_name"),
        col("week_of_year"), col("year"), col("total_delays"),
        round(col("avg_delay_minutes"), 2).as("avg_delay"),
        col("severe_delays"),
        round(coalesce(col("prev_week_avg_delay"), lit(0.0)), 2).as("prev_week_avg"),
        round(col("avg_delay_minutes") -
          coalesce(col("prev_week_avg_delay"), col("avg_delay_minutes")), 2).as("change"),
        col("performance_rank"))
      .orderBy(col("year").desc, col("week_of_year").desc, col("performance_rank"))
      .limit(20)
  }

  /** Q2 (:52-68) — rush-hour vs off-peak with exact percentiles. */
  def rushHourAnalysis(wh: WarehouseTables): DataFrame =
    wh.factDelayEvents
      .join(broadcast(wh.dimTime.select("time_key", "rush_hour_period")),
        Seq("time_key"))
      .groupBy(col("rush_hour_period"))
      .agg(count(lit(1)).as("total_delays"),
        round(avg(col("delay_minutes")), 2).as("avg_delay"),
        round(percentile(col("delay_minutes"), lit(0.5)), 2).as("median_delay"),
        round(percentile(col("delay_minutes"), lit(0.95)), 2).as("p95_delay"),
        max(col("delay_minutes")).as("max_delay"),
        round(count(when(col("delay_minutes") > 15, 1)).cast("double") /
          count(lit(1)) * 100, 2).as("pct_over_15min"))
      .orderBy(col("rush_hour_period"))

  /** Q3 (:70-100) — weather impact with a 7-day moving average (W6). */
  def weatherImpactTrend(wh: WarehouseTables, factWeather: DataFrame): DataFrame = {
    val daily = factWeather
      .groupBy(col("weather_condition"), to_date(col("actual_arrival")).as("day"))
      .agg(count(lit(1)).as("n_delays"),
           avg(col("delay_minutes")).as("avg_delay"))
    val w = Window.partitionBy(col("weather_condition")).orderBy(col("day"))
    daily
      .withColumn("ma7", round(avg(col("avg_delay")).over(w.rowsBetween(-6, 0)), 2))
      .withColumn("avg_delay", round(col("avg_delay"), 2))
      .orderBy(col("weather_condition"), col("day"))
  }

  /** Q4 (:102-130) — stop ranking with cumulative share (W7, PG RANGE
    * frame) and PERCENT_RANK (W5). */
  def stopCumulativeAnalysis(wh: WarehouseTables): DataFrame = {
    val perStop = wh.factDelayEvents
      .join(broadcast(wh.dimStop.select("stop_key", "stop_name", "stop_area")),
        Seq("stop_key"))
      .groupBy(col("stop_name"), col("stop_area"))
      .agg(count(lit(1)).as("total_delays"),
           sum(col("delay_minutes")).as("total_delay_minutes"))
    val byDelays = Window.orderBy(col("total_delays").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    perStop
      .withColumn("cumulative_delays", sum(col("total_delays")).over(byDelays))
      .withColumn("cumulative_pct", round(col("cumulative_delays") /
        sum(col("total_delays")).over(Window.partitionBy()) * 100, 2))
      .withColumn("delay_percentile",
        round(percent_rank().over(Window.orderBy(col("total_delays").desc)), 4))
      .orderBy(col("total_delays").desc, col("stop_name"))
      .limit(15)
  }

  /** Q5 (:132-156) — day-of-week patterns with whole-partition average
    * (W8) comparison. */
  def dayOfWeekPatterns(wh: WarehouseTables): DataFrame =
    wh.factDelayEvents
      .join(broadcast(wh.dimDate.select("date_key", "day_of_week", "day_name")),
        Seq("date_key"))
      .groupBy(col("day_of_week"), col("day_name"))
      .agg(count(lit(1)).as("total_delays"),
           avg(col("delay_minutes")).as("avg_delay"),
           stddev_samp(col("delay_minutes")).as("stddev_delay"))
      .withColumn("overall_avg",
        avg(col("avg_delay")).over(Window.partitionBy()))
      .select(col("day_of_week"), col("day_name"), col("total_delays"),
        round(col("avg_delay"), 2).as("avg_delay"),
        round(coalesce(col("stddev_delay"), lit(0.0)), 2).as("stddev_delay"),
        round(col("avg_delay") - col("overall_avg"), 2).as("vs_overall"))
      .orderBy(col("day_of_week"))

  /** Q6 (:158-191) — monthly trend: LAG month-over-month, 3-month MA,
    * NTILE quartiles (W1/W6/W4). */
  def monthlyTrend(wh: WarehouseTables): DataFrame = {
    val monthly = wh.factDelayEvents
      .join(broadcast(wh.dimDate.select("date_key", "year", "month", "month_name")),
        Seq("date_key"))
      .groupBy(col("year"), col("month"), col("month_name"))
      .agg(count(lit(1)).as("total_delays"),
           avg(col("delay_minutes")).as("avg_delay"))
    val wSeq = Window.orderBy(col("year"), col("month"))
    monthly
      .withColumn("prev_month_avg", lag(col("avg_delay"), 1).over(wSeq))
      .withColumn("ma3", round(avg(col("avg_delay")).over(wSeq.rowsBetween(-2, 0)), 2))
      // (year, month) tiebreak: ntile is order-sensitive and two months
      // CAN tie on avg_delay — without it quartile assignment on a tied
      // corpus would be engine-arbitrary (tie-break class T)
      .withColumn("quartile", ntile(4).over(
        Window.orderBy(col("avg_delay"), col("year"), col("month"))))
      .withColumn("avg_delay", round(col("avg_delay"), 2))
      .withColumn("prev_month_avg", round(col("prev_month_avg"), 2))
      .orderBy(col("year"), col("month"))
  }

  /** Q7 (:193-240) — route×stop hotspot matrix with DENSE_RANK (W3). */
  def hotspotMatrix(wh: WarehouseTables): DataFrame = {
    val cell = wh.factDelayEvents
      .join(broadcast(wh.dimRoute.select("route_key", "route_short_name")),
        Seq("route_key"))
      .join(broadcast(wh.dimStop.select("stop_key", "stop_name")), Seq("stop_key"))
      .groupBy(col("route_short_name"), col("stop_name"))
      .agg(count(lit(1)).as("n_delays"),
           avg(col("delay_minutes")).as("avg_delay"))
      .filter(col("n_delays") >= 1)
    cell
      .withColumn("rank_in_route", dense_rank().over(
        Window.partitionBy(col("route_short_name"))
          .orderBy(col("avg_delay").desc)))
      .withColumn("global_rank", dense_rank().over(
        Window.orderBy(col("avg_delay").desc)))
      .withColumn("avg_delay", round(col("avg_delay"), 2))
      .orderBy(col("global_rank"), col("route_short_name"), col("stop_name"))
      .limit(25)
  }

  /** Q8 (:242-283) — delay cascade: per-trip LAG over stop sequence. */
  def delayCascade(factWithSeq: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("trip_id")).orderBy(col("stop_sequence"))
    factWithSeq
      .withColumn("prev_stop_delay", lag(col("delay_minutes"), 1).over(w))
      .withColumn("cascade_delta",
        col("delay_minutes") - coalesce(col("prev_stop_delay"), lit(0)))
      .filter(col("prev_stop_delay").isNotNull)
      .orderBy(col("trip_id"), col("stop_sequence"))
  }
}
