package graft

import graft.etl.{AnalysisQueries, FeatureBuild, GtfsEtl}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers._

/** Feature matrix + split + encode/scale + the analysis queries, run over
  * the GTFS fixture warehouse (SURVEY.md §3.2: everything up to the
  * feature matrix is engine surface). */
class FeatureBuildSpec extends SparkSpec {

  private lazy val op = GtfsEtl.operational(
    GtfsEtl.staging(spark, getClass.getResource("/gtfs").getPath))

  private lazy val delayEvents = {
    import spark.implicits._
    Seq(
      ("T1", "S1", "2024-01-06 08:03:00", 3, "clear", true),
      ("T1", "S2", "2024-01-06 08:22:00", 7, "clear", true),
      ("T1", "S3", "2024-01-08 08:47:00", 17, "rainy", false),
      ("T2", "S3", "2024-01-08 17:10:00", 5, "rainy", false),
      ("T2", "S1", "2024-01-09 17:55:00", 34, "snow", false),
      ("T3", "S1", "2024-01-09 23:52:00", 2, "clear", false),
      ("T3", "S4", "2024-01-10 00:20:00", 5, "clear", false),
      ("T5", "S1", "2024-01-13 12:35:00", 1, "fog", false)
    ).toDF("trip_id", "stop_id", "arrival_str", "delay_minutes",
           "weather_condition", "is_holiday")
      .withColumn("actual_arrival", col("arrival_str").cast("timestamp"))
      .drop("arrival_str")
  }

  private lazy val wh = GtfsEtl.warehouse(spark, op, delayEvents)
  private lazy val emptyWeather = {
    import spark.implicits._
    Seq.empty[(java.sql.Timestamp, Double, Double, Double)]
      .toDF("recorded_at", "temperature", "precipitation", "wind_speed")
  }
  private lazy val feats = FeatureBuild.features(
    op, wh.dimStop, delayEvents, emptyWeather,
    java.sql.Date.valueOf("2024-01-14"))

  test("feature matrix: one row per event, 40 columns, reference defaults applied") {
    feats.count() shouldBe 8
    feats.columns.length should be >= 40
    val r = feats.filter(col("trip_id") === "T2" && col("delay_minutes") === 34).first()
    r.getAs[String]("delay_category") shouldBe "Extreme"   // ML <= bins (34 > 30)
    r.getAs[Boolean]("is_rush_hour") shouldBe true         // 17:55
    r.getAs[Double]("temperature") shouldBe 15.0           // empty weather -> default
    r.getAs[Double]("precipitation") shouldBe 3.0          // snow fallback
    r.getAs[Int]("weather_severity") shouldBe 3            // snow -> 3
    r.getAs[Int]("weather_rush_hour_interaction") shouldBe 3
    r.getAs[Double]("rush_hour_delay_multiplier") shouldBe 1.5
  }

  test("historical 7d windows respect the pinned asOf date") {
    // asOf 2024-01-14: events on Jan 6 (both) are outside the 7d window
    val jan6 = feats.filter(col("trip_id") === "T1" && col("stop_id") === "S1").first()
    jan6.getAs[Long]("delay_count_same_route_stop_7d") shouldBe 0L
    val jan9 = feats.filter(col("trip_id") === "T2" && col("stop_id") === "S1").first()
    jan9.getAs[Long]("delay_count_same_route_stop_7d") shouldBe 1L
    jan9.getAs[Double]("avg_delay_same_route_stop_7d") shouldBe 34.0
  }

  test("prev-stop cascade feature uses the 1-PRECEDING frame") {
    val t1s2 = feats.filter(col("trip_id") === "T1" && col("stop_id") === "S2").first()
    t1s2.getAs[Double]("prev_stop_delay") shouldBe 3.0 // T1 S1 (seq 1) delay
  }

  test("multiple delay events per (trip,stop) keep one feature row per event; " +
       "prev-stop chains stay within the service day") {
    import spark.implicits._
    // (T1,S1) and (T1,S2) each appear on TWO days — the normal multi-day
    // case that a (trip_id, stop_id)-only join-back would fan out n×n
    val multi = Seq(
      ("T1", "S1", "2024-01-08 08:02:00", 2, "clear", false),
      // exact-duplicate event identity with a conflicting delay report:
      // must not multiply feature rows; the chain uses min(delay)
      ("T1", "S1", "2024-01-08 08:02:00", 8, "clear", false),
      ("T1", "S2", "2024-01-08 08:20:00", 6, "clear", false),
      ("T1", "S1", "2024-01-09 08:04:00", 4, "rainy", false),
      ("T1", "S2", "2024-01-09 08:25:00", 9, "rainy", false),
      ("T1", "S3", "2024-01-09 08:40:00", 12, "rainy", false)
    ).toDF("trip_id", "stop_id", "arrival_str", "delay_minutes",
           "weather_condition", "is_holiday")
      .withColumn("actual_arrival", col("arrival_str").cast("timestamp"))
      .drop("arrival_str")
    val f = FeatureBuild.features(op, wh.dimStop, multi, emptyWeather,
      java.sql.Date.valueOf("2024-01-14"))
    f.count() shouldBe 6 // one row per input event row, no fan-out
    def at(stop: String, dom: Int) =
      f.filter(col("stop_id") === stop && col("day_of_month") === dom).first()
    at("S2", 8).getAs[Double]("prev_stop_delay") shouldBe 2.0 // min of 2,8
    at("S2", 9).getAs[Double]("prev_stop_delay") shouldBe 4.0 // Jan-9 chain
    at("S3", 9).getAs[Double]("prev_stop_delay") shouldBe 9.0
    // first stop of a day never inherits the previous day's tail
    at("S1", 9).getAs[Double]("prev_stop_delay") shouldBe 0.0
  }

  test("80/20 split is deterministic, disjoint, and exhaustive") {
    val (train, test) = FeatureBuild.split(feats)
    train.count() shouldBe 6 // floor semantics: rn <= 8*0.8=6.4
    test.count() shouldBe 2
    val keys = (df: org.apache.spark.sql.DataFrame) =>
      df.select("trip_id", "stop_id", "date").collect().toSet
    keys(train).intersect(keys(test)) shouldBe Set.empty
  }

  test("label encoder: fit on train, unseen value encodes to -1") {
    import spark.implicits._
    val train = Seq("clear", "rainy", "snow").toDF("weather_condition")
    val vocab = FeatureBuild.fitLabelEncoder(train, "weather_condition")
    val applied = FeatureBuild.applyLabelEncoder(
      Seq("clear", "fog", "snow").toDF("weather_condition"),
      vocab, "weather_condition")
    applied.orderBy("weather_condition").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq shouldBe
      Seq(("clear", 0), ("fog", -1), ("snow", 2))
  }

  test("standard scaler: (x-mean)/std on train stats; zero-variance guarded") {
    import spark.implicits._
    val train = Seq(1.0, 2.0, 3.0).toDF("x").withColumn("c", lit(5.0))
    val params = FeatureBuild.fitScaler(train, Seq("x", "c"))
    params("x")._1 shouldBe 2.0
    params("c")._2 shouldBe 0.0
    val applied = FeatureBuild.applyScaler(train, params)
    applied.select("x_scaled").collect().map(_.getDouble(0)).sum shouldBe 0.0 +- 1e-12
    applied.select("c_scaled").collect().map(_.getDouble(0)).toSeq shouldBe Seq(0.0, 0.0, 0.0)
  }

  test("dashboard queries run over the fixture warehouse with sane KPIs") {
    import graft.etl.DashboardQueries
    val k = DashboardQueries.kpis(wh).first()
    k.getAs[Long]("total_delays") shouldBe 8
    k.getAs[Long]("severe_delays") shouldBe 1 // the 34-min delay
    DashboardQueries.dailyTrend(wh).count() should be > 0L
    DashboardQueries.topRoutes(wh).count() should be > 0L
    DashboardQueries.hourlyPattern(wh).count() should be > 0L
    DashboardQueries.weatherImpact(delayEvents).count() shouldBe 4
    import spark.implicits._
    val preds = Seq(("T1", 3.0, 22.0), ("T2", 5.0, 4.0))
      .toDF("trip_id", "actual", "predicted")
    val recent = DashboardQueries.recentPredictions(preds).collect()
    recent.head.getAs[String]("risk_level") shouldBe "Severe"
  }

  test("all 8 analysis queries run over the fixture warehouse and return rows") {
    AnalysisQueries.routePerformanceRanking(wh).count() should be > 0L
    AnalysisQueries.rushHourAnalysis(wh).count() should be > 0L
    val factWeather = delayEvents // carries weather_condition + actual_arrival
    AnalysisQueries.weatherImpactTrend(wh, factWeather).count() should be > 0L
    AnalysisQueries.stopCumulativeAnalysis(wh).count() should be > 0L
    AnalysisQueries.dayOfWeekPatterns(wh).count() should be > 0L
    AnalysisQueries.monthlyTrend(wh).count() should be > 0L
    AnalysisQueries.hotspotMatrix(wh).count() should be > 0L
    val factWithSeq = delayEvents.join(
      op.stopTimes.select("trip_id", "stop_id", "stop_sequence"),
      Seq("trip_id", "stop_id"))
    val cascade = AnalysisQueries.delayCascade(factWithSeq)
    cascade.count() should be > 0L
    // T1: S1(3) -> S2(7): delta +4
    cascade.filter(col("trip_id") === "T1" && col("stop_id") === "S2")
      .select("cascade_delta").first().getInt(0) shouldBe 4
  }
}
