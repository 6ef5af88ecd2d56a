package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's Airflow DAG re-expressed as a typed stage runner
  * (`/root/reference/airflow/dags/ml_pipeline_dag.py`: check_data_quality
  * → incremental feature build → predict → evaluate → monitor → alert,
  * with task-level logging and failure propagation).
  *
  * Airflow exists in the reference because each stage is a separate psql/
  * python process; here the stages are functions over DataFrames in one
  * session, so orchestration reduces to ordinary control flow plus
  * timing/status capture. An external scheduler (or
  * `Trigger.ProcessingTime`) supplies the cadence — ST4 is out of engine
  * core (SURVEY §2.10).
  *
  * Each stage records (name, status, seconds, detail); a failed stage
  * marks downstream stages skipped, like depends_on_past/upstream_failed.
  */
object Pipeline {

  case class StageResult(stage: String, status: String, seconds: Double,
                         detail: String)

  class Runner(spark: SparkSession) {
    private val results = scala.collection.mutable.ListBuffer.empty[StageResult]
    private var failed = false

    def stage[A](name: String)(body: => A): Option[A] = {
      if (failed) {
        results += StageResult(name, "skipped", 0.0, "upstream failure")
        None
      } else {
        val t0 = System.nanoTime()
        try {
          val r = body
          results += StageResult(name, "success",
            (System.nanoTime() - t0) / 1e9, "")
          Some(r)
        } catch {
          case e: Exception =>
            failed = true
            results += StageResult(name, "failed",
              (System.nanoTime() - t0) / 1e9, String.valueOf(e.getMessage))
            None
        }
      }
    }

    def report: DataFrame = {
      import spark.implicits._
      results.toSeq.toDF()
        .select(col("stage"), col("status"), round(col("seconds"), 3).as("seconds"),
                col("detail"))
    }
  }

  /** The daily flow over GTFS inputs: DQ gate → operational load →
    * warehouse → features → (stub scores) → evaluation → monitoring.
    * Returns the per-stage report; stage outputs land in `out`. */
  def runDaily(spark: SparkSession, gtfsDir: String, delayEvents: DataFrame,
               weather: DataFrame, asOf: java.sql.Date,
               out: collection.mutable.Map[String, DataFrame] =
                 collection.mutable.Map.empty): DataFrame = {
    val r = new Runner(spark)

    val staging = r.stage("staging_load") { GtfsEtl.staging(spark, gtfsDir) }

    r.stage("check_data_quality") {
      val dq = GtfsEtl.dataQuality(staging.get)
      val fatal = dq.filter(col("check_name") === "orphan_stop_times" &&
                            col("n_bad") > 0).count()
      require(fatal == 0, "orphan stop_times present")
      out("dq") = dq
    }

    val op = r.stage("operational_load") { GtfsEtl.operational(staging.get) }

    val wh = r.stage("warehouse_build") {
      val w = GtfsEtl.warehouse(spark, op.get, delayEvents)
      out("fact") = w.factDelayEvents
      w
    }

    val feats = r.stage("feature_build") {
      val f = FeatureBuild.features(op.get, wh.get.dimStop, delayEvents,
        weather, asOf)
      out("features") = f
      f
    }

    val preds = r.stage("predict") {
      // model scoring is out-of-engine (SURVEY §3.2); the stand-in score
      // is the 7-day route-stop average — exactly the baseline a model
      // must beat — which exercises the full relational path around it
      val p = feats.get.select(
        col("trip_id"), col("stop_id"),
        col("delay_minutes").cast("double").as("actual"),
        col("avg_delay_same_route_stop_7d").as("predicted"))
      out("predictions") = p
      p
    }

    r.stage("evaluate") {
      out("metrics") = Evaluation.metrics(preds.get)
      out("risk") = Evaluation.riskReport(preds.get)
    }

    r.stage("monitoring_gate") {
      // reference floor is 75% over the trailing window; baseline scores
      // won't clear it on fresh data — record, don't fail the DAG
      val ok = Evaluation.monitoringGate(preds.get)
      out("gate_passed") = spark.range(1)
        .select(lit(ok).as("accuracy_gate_passed"))
    }

    r.report
  }
}
