package graft

import graft.etl.{Evaluation, SyntheticGen}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers._

/** Synthetic generator distribution properties (mirrors
  * generate_synthetic_data.py's model) + evaluation metrics. */
class SyntheticEvalSpec extends SparkSpec {

  private lazy val events =
    SyntheticGen.delayEvents(spark, nTrips = 200, days = 30,
      startDate = "2024-03-01", seed = 7L).cache()

  test("generator is deterministic per seed and differs across seeds") {
    val a = SyntheticGen.delayEvents(spark, 50, 5, "2024-03-01", 7L)
    val b = SyntheticGen.delayEvents(spark, 50, 5, "2024-03-01", 7L)
    val c = SyntheticGen.delayEvents(spark, 50, 5, "2024-03-01", 8L).count()
    // full row-set equality, not just counts
    a.collect().toSet shouldBe b.collect().toSet
    (a.count() == c) shouldBe false
    // rand(seed) reseeds per partition, so determinism across deployments
    // requires the generator to pin its own partition count rather than
    // inherit defaultParallelism — pinning differently changes the sample
    a.rdd.getNumPartitions shouldBe 32
    val p8 = SyntheticGen.delayEvents(spark, 50, 5, "2024-03-01", 7L,
      partitions = 8)
    p8.rdd.getNumPartitions shouldBe 8
    (p8.collect().toSet == a.collect().toSet) shouldBe false
  }

  test("delay rate and magnitudes respect the reference's model") {
    val n = events.count().toDouble
    val total = 200.0 * 30
    // base prob 0.15 scaled by multipliers: overall rate must sit between
    // the holiday-dampened floor and the 0.8 cap
    n / total should (be > 0.10 and be < 0.45)
    // magnitude clamp [1, 120]
    val mm = events.agg(min("delay_minutes"), max("delay_minutes")).first()
    mm.getInt(0) should be >= 1
    mm.getInt(1) should be <= 120
    // snow rows must delay more than clear rows on average
    val byWeather = events.groupBy("weather_condition")
      .agg(avg("delay_minutes").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    byWeather("snow") should be > byWeather("clear")
    // rush hours see a higher event rate than the 0-6 off-peak band
    val rushRate = events.filter(hour(col("actual_arrival")).isin(7, 8, 9)).count() / 3.0
    val offRate = events.filter(hour(col("actual_arrival")).isin(1, 2, 3)).count() / 3.0
    rushRate should be > offRate
  }

  test("weather series is hourly, seasonal, and condition-consistent") {
    val w = SyntheticGen.weather(spark, 10, "2024-03-01", 7L)
    w.count() shouldBe 240
    w.select(countDistinct(date_trunc("hour", col("recorded_at"))))
      .first().getLong(0) shouldBe 240
    w.filter(col("weather_condition") === "clear" && col("precipitation") =!= 0.0)
      .count() shouldBe 0
  }

  test("evaluation metrics match hand-computed values; gates behave") {
    import spark.implicits._
    val preds = Seq(
      ("T1", 10.0, 12.0), ("T2", 20.0, 14.0), ("T3", 5.0, 5.0),
      ("T4", 40.0, 52.0), ("T5", 8.0, 9.0))
      .toDF("trip_id", "actual", "predicted")
    val m = Evaluation.metrics(preds).first()
    m.getAs[Double]("mae") shouldBe ((2 + 6 + 0 + 12 + 1) / 5.0) +- 1e-9
    m.getAs[Double]("accuracy_within_5min") shouldBe 0.6
    m.getAs[Double]("accuracy_within_10min") shouldBe 0.8
    m.getAs[Double]("r2") should be > 0.5
    Evaluation.monitoringGate(preds, floor = 0.75) shouldBe true
    Evaluation.monitoringGate(preds, floor = 0.9) shouldBe false
    val (best, worst) = Evaluation.bestWorst(preds, 2)
    best.collect().map(_.getString(0)).toSeq shouldBe Seq("T3", "T5")
    worst.collect().map(_.getString(0)).toSeq shouldBe Seq("T4", "T2")
    val risk = Evaluation.riskReport(preds)
    risk.filter(col("risk_level") === "Severe").first()
      .getAs[Long]("n_trips") shouldBe 1
  }
}
