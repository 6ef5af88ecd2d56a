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

  /** Write `df` as a NEW versioned parquet snapshot under `path` and
    * re-point `viewName` at it. Versioning (not overwrite-in-place) gives
    * snapshot isolation: DataFrames handed out before a refresh keep
    * reading their own snapshot instead of failing on deleted files —
    * the behavior `REFRESH MATERIALIZED VIEW` readers get in PostgreSQL. */
  def materialize(spark: SparkSession, df: DataFrame, path: String,
                  viewName: String): DataFrame = {
    val dir = new java.io.File(path)
    val next = Option(dir.listFiles())
      .map(_.toSeq.map(_.getName).collect {
        case n if n.startsWith("v") => n.drop(1).toIntOption.getOrElse(0)
      }).filter(_.nonEmpty).map(_.max + 1).getOrElse(1)
    val snapshot = s"$path/v$next"
    df.write.mode("errorifexists").parquet(snapshot)
    val re = spark.read.parquet(snapshot)
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
