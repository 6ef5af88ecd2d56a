package graft

import graft.functions.GtfsFunctions._
import org.apache.spark.sql.functions._

/** Edge cases of the GTFS scalar library (SURVEY.md §5.2): times past
  * midnight, malformed → null, bin edges, PG dow convention. */
class GtfsFunctionsSpec extends SparkSpec {
  import org.scalatest.matchers.should.Matchers._

  private def parse(ss: String*): Seq[Any] = {
    import spark.implicits._
    ss.toDF("t").select(gtfsTimeToSeconds(col("t"))).collect().map(_.get(0)).toSeq
  }

  test("gtfsTimeToSeconds parses plain and past-midnight times") {
    parse("08:00:00", "23:59:59", "24:15:00", "25:01:30") shouldBe
      Seq(8 * 3600L, 23 * 3600L + 59 * 60 + 59, 24 * 3600L + 15 * 60,
          25 * 3600L + 60 + 30)
  }

  test("gtfsTimeToSeconds single-digit hour (GTFS H:MM:SS) parses") {
    parse("8:05:00") shouldBe Seq(8 * 3600L + 5 * 60)
  }

  test("gtfsTimeToSeconds rejects malformed/empty like the plpgsql EXCEPTION path") {
    parse("bad:time", "", "12:3:04", "1230:00", "12:30", "::", ":30:00",
          "99999999999999999999:00:00", "١٢:00:00") shouldBe
      Seq(null, null, null, null, null, null, null, null, null)
  }

  test("gtfsTimeToSeconds null-safe") {
    import spark.implicits._
    Seq(Option.empty[String]).toDF("t")
      .select(gtfsTimeToSeconds(col("t"))).collect().map(_.get(0)).toSeq shouldBe Seq(null)
  }

  test("UDF variant agrees with expression variant") {
    import spark.implicits._
    registerGtfsTimeUdf(spark)
    val in = Seq("08:00:00", "25:01:30", "bad:time", "8:05:00", "12:3:04",
                 ":30:00", "99999999999999999999:00:00", "١٢:00:00", "::")
    val df = in.toDF("t")
    val expr = df.select(gtfsTimeToSeconds(col("t"))).collect().map(_.get(0)).toSeq
    val udf = df.selectExpr("gtfs_time_to_seconds(t)").collect().map(_.get(0)).toSeq
    udf shouldBe expr
  }

  test("delay category bin edges: warehouse BETWEEN vs ML <= variants differ at 0") {
    import spark.implicits._
    val df = Seq(-2, 0, 1, 5, 6, 15, 16, 30, 31).toDF("m")
    val wh = df.select(delayCategoryWarehouse(col("m"))).collect().map(_.getString(0)).toSeq
    wh shouldBe Seq("Extreme", "Extreme", "Minor", "Minor", "Moderate",
                    "Moderate", "Severe", "Severe", "Extreme")
    val ml = df.select(delayCategoryMl(col("m"))).collect().map(_.getString(0)).toSeq
    ml shouldBe Seq("Minor", "Minor", "Minor", "Minor", "Moderate",
                    "Moderate", "Severe", "Severe", "Extreme")
  }

  test("dowPg matches PostgreSQL 0=Sunday convention") {
    import spark.implicits._
    // 2024-01-07 is a Sunday, 2024-01-08 a Monday
    Seq("2024-01-07", "2024-01-08").toDF("d")
      .select(dowPg(col("d").cast("date"))).collect().map(_.getInt(0)).toSeq shouldBe Seq(0, 1)
  }

  test("season / timeOfDay / rush-hour bins mirror fact_dim_tables.sql") {
    import spark.implicits._
    Seq(12, 1, 3, 6, 9).toDF("m").select(season(col("m")))
      .collect().map(_.getString(0)).toSeq shouldBe
      Seq("Winter", "Winter", "Spring", "Summer", "Fall")
    Seq(4, 5, 11, 12, 16, 17, 20, 21).toDF("h").select(timeOfDay(col("h")))
      .collect().map(_.getString(0)).toSeq shouldBe
      Seq("Night", "Morning", "Morning", "Afternoon", "Afternoon",
          "Evening", "Evening", "Night")
    Seq(6, 7, 9, 10, 17, 19, 20).toDF("h").select(rushHourPeriod(col("h")))
      .collect().map(_.getString(0)).toSeq shouldBe
      Seq("Off Peak", "Morning Rush", "Morning Rush", "Off Peak",
          "Evening Rush", "Evening Rush", "Off Peak")
  }
}
