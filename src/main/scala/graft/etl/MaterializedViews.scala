package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized views (SURVEY.md §4: not automatic in OSS Spark —
  * materialize = write parquet + temp view on re-read; refresh = re-run
  * the stage function). Mirrors
  * `/root/reference/sql/performance_optimization.sql:28-91` (3 MVs +
  * `analytics.refresh_all_views()`).
  *
  * Scale notes: a refresh overwrites the parquet snapshot atomically
  * (write to _tmp, swap on success would be the production form); readers
  * re-resolve the temp view. The MV contents are pre-aggregated (group
  * grain), so refresh cost is one aggregation scan and the read side is
  * tiny.
  */
object MaterializedViews {

  /** Write `df` as parquet at `path` and register `viewName` over the
    * materialized copy. Returns the re-read frame. */
  def materialize(spark: SparkSession, df: DataFrame, path: String,
                  viewName: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    val re = spark.read.parquet(path)
    re.createOrReplaceTempView(viewName)
    re
  }

  /** The reference's `refresh_all_views()`: re-materialize every
    * registered (name → builder) pair under `baseDir`. */
  def refreshAll(spark: SparkSession, baseDir: String,
                 builders: Map[String, () => DataFrame]): Map[String, DataFrame] =
    builders.map { case (name, build) =>
      name -> materialize(spark, build(), s"$baseDir/$name", name)
    }
}
