package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Expression library mirroring the reference's scalar semantics
  * (SURVEY.md §2.8/§2.12).
  *
  * `gtfsTimeToSeconds` re-expresses `staging.gtfs_time_to_interval`
  * (`/root/reference/sql/create_schema.sql:199-221`): GTFS "H:MM:SS" /
  * "HH:MM:SS" where hours may exceed 24 (times past midnight are legal),
  * NULL/empty/malformed → NULL (the plpgsql EXCEPTION→NULL path). The
  * reference stores INTERVAL and always consumes it as epoch seconds
  * (`sql/fact_dim_tables.sql:272`), so LongType seconds-since-midnight is
  * the faithful Spark type (SURVEY §1.2: CalendarIntervalType is not
  * orderable/aggregatable).
  *
  * Pure expressions, not UDFs: everything here stays inside whole-stage
  * codegen and remains visible to Catalyst (constant folding, pushdown).
  * A registered-UDF variant is provided only to demonstrate that surface.
  */
object GtfsFunctions {

  /** "H+:MM:SS" → seconds since midnight; null on NULL/empty/malformed.
    * Hour capped at 9 digits: the regex must not admit strings whose cast
    * would overflow Long and throw under ANSI mode (EXCEPTION→NULL means
    * NULL, never a task failure). The split is
    * [[graft.ops.bindOnce bound once]]; a named split Column referenced
    * three times would re-run the regex split per field. */
  def gtfsTimeToSeconds(timeStr: Column): Column =
    when(timeStr.isNull || !timeStr.rlike("^[0-9]{1,9}:[0-9]{2}:[0-9]{2}$"), lit(null))
      .otherwise(graft.ops.bindOnce(split(timeStr, ":")) { p =>
        element_at(p, 1).cast("long") * 3600 +
        element_at(p, 2).cast("long") * 60 +
        element_at(p, 3).cast("long")
      })

  /** Same semantics as a registered Scala UDF (demonstrates the UDF
    * surface; prefer the expression form in real plans). */
  def registerGtfsTimeUdf(spark: SparkSession): Unit =
    spark.udf.register("gtfs_time_to_seconds", (s: String) => {
      // ASCII-digit + nonempty + length guards: Char.isDigit accepts
      // Unicode digits that toLong rejects, "".forall is vacuously true,
      // and >18-digit hours overflow — all must map to None (the plpgsql
      // EXCEPTION->NULL path), never throw in a task
      def digits(x: String) =
        x.nonEmpty && x.length <= 9 && x.forall(c => c >= '0' && c <= '9')
      if (s == null) None
      else s.split(":", -1) match {
        case Array(h, m, sec) if digits(h) &&
            m.length == 2 && digits(m) && sec.length == 2 && digits(sec) =>
          Some(h.toLong * 3600 + m.toLong * 60 + sec.toLong)
        case _ => None
      }
    })

  /** Delay categories, warehouse variant (`fact_dim_tables.sql:335-340`:
    * BETWEEN bins — note 0 and negatives fall into 'Extreme' exactly as in
    * the reference). */
  def delayCategoryWarehouse(mins: Column): Column =
    when(mins.between(1, 5), "Minor")
      .when(mins.between(6, 15), "Moderate")
      .when(mins.between(16, 30), "Severe")
      .otherwise("Extreme")

  /** Delay categories, ML variant (`ml_feature_engineering.sql:156-161`).
    * Same labels as the warehouse variant but <= bins instead of BETWEEN —
    * the two layers deliberately disagree on bin edges (0/negative is
    * 'Minor' here, 'Extreme' there); preserve both. */
  def delayCategoryMl(mins: Column): Column =
    when(mins <= 5, "Minor")
      .when(mins <= 15, "Moderate")
      .when(mins <= 30, "Severe")
      .otherwise("Extreme")

  /** Season from month (`fact_dim_tables.sql:173-178`). */
  def season(month: Column): Column =
    when(month.isin(12, 1, 2), "Winter")
      .when(month.isin(3, 4, 5), "Spring")
      .when(month.isin(6, 7, 8), "Summer")
      .otherwise("Fall")

  /** Time-of-day bucket (`fact_dim_tables.sql:200-205`). */
  def timeOfDay(hour: Column): Column =
    when(hour.between(5, 11), "Morning")
      .when(hour.between(12, 16), "Afternoon")
      .when(hour.between(17, 20), "Evening")
      .otherwise("Night")

  /** Rush-hour flag + period (`fact_dim_tables.sql:206-213`). */
  def isRushHour(hour: Column): Column =
    hour.between(7, 9) || hour.between(17, 19)

  def rushHourPeriod(hour: Column): Column =
    when(hour.between(7, 9), "Morning Rush")
      .when(hour.between(17, 19), "Evening Rush")
      .otherwise("Off Peak")

  /** PostgreSQL DOW convention (0=Sunday) from a Spark date/timestamp
    * (Spark `dayofweek` is 1=Sunday — SURVEY §2.8 F1 trap). */
  def dowPg(d: Column): Column = dayofweek(d) - 1

  /** Route-type description (`fact_dim_tables.sql:255-265`). */
  def routeTypeDesc(routeType: Column): Column =
    when(routeType === 0, "Tram/Light Rail")
      .when(routeType === 1, "Subway/Metro")
      .when(routeType === 2, "Rail")
      .when(routeType === 3, "Bus")
      .when(routeType === 4, "Ferry")
      .when(routeType === 5, "Cable Car")
      .when(routeType === 6, "Gondola")
      .when(routeType === 7, "Funicular")
      .otherwise("Other")

  /** Risk buckets (`predict_delays.py:348-352` pd.cut bins
    * (-inf,5],(5,10],(10,20],(20,inf)). */
  def riskLevel(predictedDelay: Column): Column =
    when(predictedDelay <= 5, "Low")
      .when(predictedDelay <= 10, "Medium")
      .when(predictedDelay <= 20, "High")
      .otherwise("Severe")
}
