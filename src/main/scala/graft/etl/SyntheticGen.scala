package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed re-expression of the reference's synthetic-data driver
  * (`/root/reference/generate_synthetic_data.py` — one of its four Python
  * entry points): seeded delay-event and hourly-weather generation with
  * the same probability model, entirely as seeded `rand()`/`randn()`
  * column expressions (SURVEY §2.8 F8).
  *
  * The reference loops row-by-row in Python and batch-inserts 1000 rows
  * at a time (`:321-364`); here each row is generated independently
  * inside codegen from `spark.range`, so generation parallelizes and
  * scales to arbitrary row counts with zero driver involvement — the
  * difference between "generate 60 days" and "generate 100 TB".
  *
  * Probability model mirrored from the reference:
  *  - base delay prob 0.15; rush hours [7,8,9,17,18,19] ×1.8; weather
  *    multipliers clear 1.0 … snow 2.5; holiday ×0.7; cap 0.8 (`:195-220`)
  *  - delay magnitude: two INDEPENDENT coin flips exactly as the
  *    reference writes them (`if rand<0.6 … elif rand2<0.85 …`), which
  *    yields 60% → 1–5 min, 34% → 6–15, 6% → 16–45 (not the 60/25/15 the
  *    reference's comments imply — we mirror the code, not the comment);
  *    weather amplifiers ×1.0–2.0; rush [8,9,17,18] ×U(1.0,1.5); clamp
  *    [1,120] (`:222-243`)
  */
object SyntheticGen {

  val weatherConditions: Seq[String] = Seq(
    "clear", "partly_cloudy", "cloudy", "rainy",
    "heavy_rain", "snow", "fog", "windy")

  private val probMult = Map(
    "clear" -> 1.0, "partly_cloudy" -> 1.1, "cloudy" -> 1.2, "rainy" -> 1.5,
    "heavy_rain" -> 2.0, "snow" -> 2.5, "fog" -> 1.8, "windy" -> 1.3)

  private val ampMult = Map(
    "clear" -> 1.0, "partly_cloudy" -> 1.1, "cloudy" -> 1.2, "rainy" -> 1.4,
    "heavy_rain" -> 1.8, "snow" -> 2.0, "fog" -> 1.5, "windy" -> 1.2)

  private def mapLookup(m: Map[String, Double], key: org.apache.spark.sql.Column) =
    m.foldLeft(lit(1.0)) { case (acc, (k, v)) => when(key === k, v).otherwise(acc) }

  /** Candidate arrivals for `nTrips` trips × `days` days starting at
    * `startDate`; rows where the delay coin-flip fires carry the generated
    * delay. Deterministic per (seed, partitions): `rand(seed)` reseeds per
    * partition index, so the base range pins its partition count instead
    * of inheriting `defaultParallelism` — the same seed yields the same
    * rows under local[4] tests and local[32] bench runs alike. Raise
    * `partitions` for huge n; changing it changes the drawn sample. */
  def delayEvents(spark: SparkSession, nTrips: Int, days: Int,
                  startDate: String, seed: Long,
                  partitions: Int = 32): DataFrame = {
    val n = nTrips.toLong * days
    val base = spark.range(0L, n, 1L, partitions)
      .withColumn("day_idx", (col("id") / nTrips).cast("int"))
      .withColumn("trip_idx", (col("id") % nTrips).cast("int"))
      .withColumn("hour", (rand(seed + 1) * 24).cast("int"))
      .withColumn("minute", (rand(seed + 2) * 60).cast("int"))
      .withColumn("weather_condition",
        element_at(array(weatherConditions.map(lit): _*),
          (rand(seed + 3) * weatherConditions.size).cast("int") + 1))
      .withColumn("is_holiday", rand(seed + 4) < 0.05)
    val withTs = base
      .withColumn("actual_arrival", timestamp_seconds(
        unix_timestamp(to_timestamp(date_add(lit(startDate).cast("date"),
          col("day_idx")))) + col("hour") * 3600 + col("minute") * 60))
    val rush = col("hour").isin(7, 8, 9, 17, 18, 19)
    val prob = least(lit(0.8),
      lit(0.15) * when(rush, 1.8).otherwise(1.0) *
        mapLookup(probMult, col("weather_condition")) *
        when(col("is_holiday"), 0.7).otherwise(1.0))
    val u = rand(seed + 5)
    val baseDelay =
      when(rand(seed + 6) < 0.6, (u * 5).cast("int") + 1)          // 1-5
        .when(rand(seed + 7) < 0.85, (u * 10).cast("int") + 6)     // 6-15
        .otherwise((u * 30).cast("int") + 16)                      // 16-45
    val amplified = (baseDelay * mapLookup(ampMult, col("weather_condition")))
      .cast("int")
    val rushAmp = when(col("hour").isin(8, 9, 17, 18),
        (amplified * (rand(seed + 8) * 0.5 + 1.0)).cast("int"))
      .otherwise(amplified)
    withTs
      .filter(rand(seed + 9) < prob)
      .select(
        concat(lit("T"), col("trip_idx")).as("trip_id"),
        concat(lit("S"), (rand(seed + 10) * 50).cast("int")).as("stop_id"),
        col("actual_arrival"),
        greatest(lit(1), least(lit(120), rushAmp)).as("delay_minutes"),
        col("weather_condition"),
        col("is_holiday"))
  }

  /** Hourly weather series (`generate_synthetic_data.py:127-191`):
    * seasonal sine temperature + condition-correlated precipitation.
    * Partition count pinned for the same (seed, partitions) determinism
    * as [[delayEvents]]. */
  def weather(spark: SparkSession, days: Int, startDate: String,
              seed: Long, partitions: Int = 32): DataFrame =
    spark.range(0L, days.toLong * 24, 1L, partitions)
      .withColumn("recorded_at", timestamp_seconds(
        unix_timestamp(to_timestamp(date_add(lit(startDate).cast("date"),
          (col("id") / 24).cast("int")))) + (col("id") % 24) * 3600))
      .withColumn("condition",
        element_at(array(weatherConditions.map(lit): _*),
          (rand(seed + 1) * weatherConditions.size).cast("int") + 1))
      .select(
        col("recorded_at"),
        col("condition").as("weather_condition"),
        round(lit(12.0) +
          lit(10.0) * sin(col("id") / lit(24.0 * 365) * lit(2 * math.Pi)) +
          randn(seed + 2) * 3.0, 2).as("temperature"),
        round(when(col("condition").isin("rainy", "heavy_rain"),
            rand(seed + 3) * 10)
          .when(col("condition") === "snow", rand(seed + 3) * 5)
          .otherwise(0.0), 2).as("precipitation"),
        round(rand(seed + 4) * 30, 2).as("wind_speed"))
}
