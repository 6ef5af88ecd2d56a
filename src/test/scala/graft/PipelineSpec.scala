package graft

import graft.etl.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers._

/** The DAG-as-code runner: stage ordering, output capture, and
  * upstream-failure skip semantics. */
class PipelineSpec extends SparkSpec {

  private def delays = {
    import spark.implicits._
    Seq(("T1", "S1", "2024-01-06 08:03:00", 3, "clear", true),
        ("T1", "S2", "2024-01-06 08:22:00", 7, "clear", true),
        ("T2", "S1", "2024-01-09 17:55:00", 34, "snow", false))
      .toDF("trip_id", "stop_id", "a", "delay_minutes",
            "weather_condition", "is_holiday")
      .withColumn("actual_arrival", col("a").cast("timestamp")).drop("a")
  }

  private def noWeather = {
    import spark.implicits._
    Seq.empty[(java.sql.Timestamp, Double, Double, Double)]
      .toDF("recorded_at", "temperature", "precipitation", "wind_speed")
  }

  test("daily pipeline runs all stages and captures outputs") {
    val out = collection.mutable.Map.empty[String, DataFrame]
    val report = Pipeline.runDaily(spark,
      getClass.getResource("/gtfs").getPath, delays, noWeather,
      java.sql.Date.valueOf("2024-01-14"), out)
    val rows = report.collect().map(r => r.getString(0) -> r.getString(1))
    rows.map(_._1).toSeq shouldBe Seq(
      "staging_load", "check_data_quality", "operational_load",
      "warehouse_build", "feature_build", "predict", "evaluate",
      "monitoring_gate")
    rows.foreach { case (_, status) => status shouldBe "success" }
    out("features").count() shouldBe 3
    out("metrics").first().getAs[Long]("n") shouldBe 3
    out.contains("gate_passed") shouldBe true
  }

  test("a failing stage marks downstream stages skipped") {
    val out = collection.mutable.Map.empty[String, DataFrame]
    val report = Pipeline.runDaily(spark, "/nonexistent/gtfs", delays,
      noWeather, java.sql.Date.valueOf("2024-01-14"), out)
    val byStage = report.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // staging now materializes inside its own stage (cache+count), so the
    // missing path fails exactly where it belongs and the rest skip
    byStage("staging_load") shouldBe "failed"
    val statuses = report.collect().map(_.getString(1))
    statuses.count(_ == "skipped") shouldBe 7
    byStage("monitoring_gate") shouldBe "skipped"
  }
}
