package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet layout — the Spark answer to the reference's 23
  * btree indexes (SURVEY.md §4: high-selectivity access paths become
  * partition pruning + row-group skipping, not secondary indexes).
  *
  * The reference indexes `delay_events(recorded_at)` and reads "recent
  * events" constantly (`airflow/dags/ml_pipeline_dag.py:56`); at 100 TB
  * the equivalent is day-partitioned parquet where a date predicate
  * prunes directories BEFORE any I/O. `EventsStream`'s growing-directory
  * source and this layout are the same thing — ingest writes into
  * `day=...` partitions, queries prune to the days they touch.
  */
object PartitionedLayout {

  /** Write events day-partitioned (`outDir/day=YYYY-MM-DD/...`). */
  def writeEventsByDay(spark: SparkSession, sfDir: String, outDir: String): Unit =
    graft.Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(outDir)

  /** Read with a day predicate — Catalyst prunes partitions; verify via
    * `df.inputFiles` (only the matching day directories appear). */
  def readDays(spark: SparkSession, dir: String,
               from: String, to: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("day").between(lit(from).cast("date"), lit(to).cast("date")))
}
