package graft.etl

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine trainer substitute for the reference's XGBoost stage
  * (`/root/reference/train_delay_model.py:274-355`): spark.ml
  * GBTRegressor — the idiomatic gradient-boosted-tree twin SURVEY §3.2
  * named — fit on [[FeatureBuild.split]]'s 80% side, with the reference's
  * GridSearchCV/3-fold model selection re-expressed as a
  * `CrossValidator(numFolds = 3)` over a small `ParamGridBuilder` grid,
  * evaluated by [[Evaluation.metrics]] and gated at the reference's
  * ≥85%-within-10-minutes training-success shape
  * (`train_delay_model.py:583-587`).
  *
  * Model internals are engine-specific, so nothing here is oracle-bound
  * (DuckDB has no trainer); the spec closes the loop end-to-end on the
  * seeded synthetic fixture: generate → features → split → encode/scale →
  * fit → predict → metrics → gate.
  *
  * Scale notes: spark.ml GBTs train distributed (per-iteration jobs over
  * the cached feature frame) — the 100 TB posture is the same as the
  * reference's: the FEATURE MATRIX is the big object and it never leaves
  * the cluster (the reference caps training at 100k pandas rows for
  * driver-memory reasons; here the cap is unnecessary). Prediction is a
  * pure map stage.
  */
object Trainer {

  /** Numeric model inputs from [[FeatureBuild.features]] — the
    * reference's feature list (`train_delay_model.py:154-189`) minus
    * string categoricals, which enter via
    * [[FeatureBuild.fitLabelEncoder]] as `*_encoded` columns. */
  val defaultFeatureCols: Seq[String] = Seq(
    "hour_of_day", "minute_of_hour", "day_of_week", "day_of_month",
    "week_of_year", "month", "is_weekend", "is_holiday", "is_rush_hour",
    "route_total_stops", "stop_sequence", "stops_remaining",
    "temperature", "precipitation", "wind_speed", "weather_severity",
    "is_major_hub", "rush_hour_delay_multiplier",
    "weather_rush_hour_interaction", "weekend_weather_interaction",
    "avg_delay_same_route_stop_7d", "delay_count_same_route_stop_7d",
    "max_delay_same_route_stop_7d", "avg_delay_route_7d",
    "stddev_delay_route_7d", "avg_delay_stop_7d", "avg_delay_same_hour_7d",
    "avg_delay_same_dow_7d", "avg_delay_same_weather_7d",
    "avg_delay_same_route_stop_30d", "avg_delay_route_30d",
    "avg_delay_stop_30d", "avg_delay_same_hour_30d",
    "delay_trend_7d", "delay_volatility_7d", "prev_stop_delay")

  /** Booleans → doubles (VectorAssembler takes numeric inputs only),
    * everything else cast double for a uniform vector. */
  private def numeric(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((acc, c) => acc.withColumn(c, col(c).cast("double")))

  /** Assemble `featureCols` into a `features` vector column. Nulls are
    * upstream's concern — FeatureBuild COALESCEs every historical column,
    * matching the reference's fillna(0). */
  def assemble(df: DataFrame, featureCols: Seq[String] = defaultFeatureCols)
      : DataFrame =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .transform(numeric(df, featureCols))

  /** Plain fit — the reference's single-model path. */
  def fit(train: DataFrame, featureCols: Seq[String] = defaultFeatureCols,
          labelCol: String = "delay_minutes", maxIter: Int = 20,
          maxDepth: Int = 4, seed: Long = 42L): GBTRegressionModel =
    new GBTRegressor()
      .setLabelCol(labelCol)
      .setFeaturesCol("features")
      .setMaxIter(maxIter)
      .setMaxDepth(maxDepth)
      .setSeed(seed)
      .fit(assemble(train, featureCols))

  /** The reference's GridSearchCV(cv=3) re-expressed: 3-fold
    * CrossValidator over (maxDepth × maxIter), RMSE objective — returns
    * the refit-on-all-train best model, exactly sklearn's contract. */
  def fitGridSearch3Fold(train: DataFrame,
                         featureCols: Seq[String] = defaultFeatureCols,
                         labelCol: String = "delay_minutes",
                         seed: Long = 42L): GBTRegressionModel = {
    val gbt = new GBTRegressor()
      .setLabelCol(labelCol).setFeaturesCol("features").setSeed(seed)
    val grid = new ParamGridBuilder()
      .addGrid(gbt.maxDepth, Array(3, 5))
      .addGrid(gbt.maxIter, Array(10, 20))
      .build()
    val cv = new CrossValidator()
      .setEstimator(gbt)
      .setEvaluator(new RegressionEvaluator()
        .setLabelCol(labelCol).setPredictionCol("prediction")
        .setMetricName("rmse"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(3)
      .setSeed(seed)
      .setParallelism(4)
    cv.fit(assemble(train, featureCols)).bestModel
      .asInstanceOf[GBTRegressionModel]
  }

  /** Score `df` and shape the result for [[Evaluation]]: every input
    * column plus (actual, predicted). */
  def predict(model: GBTRegressionModel, df: DataFrame,
              featureCols: Seq[String] = defaultFeatureCols,
              labelCol: String = "delay_minutes"): DataFrame =
    model.transform(assemble(df, featureCols))
      .withColumn("actual", col(labelCol).cast("double"))
      .withColumn("predicted", col("prediction"))
      .drop("features", "prediction")

  /** The reference's training-success gate
    * (`train_delay_model.py:583-587`): accuracy-within-10-min on the
    * held-out split must reach `threshold` (0.85). Returns (metrics row,
    * gate verdict). */
  def evaluateGate(model: GBTRegressionModel, test: DataFrame,
                   featureCols: Seq[String] = defaultFeatureCols,
                   threshold: Double = 0.85): (DataFrame, Boolean) = {
    val m = Evaluation.metrics(predict(model, test, featureCols))
    val acc = m.select(col("accuracy_within_10min")).first().getDouble(0)
    (m, acc >= threshold)
  }
}
