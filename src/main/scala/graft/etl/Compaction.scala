package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the unglamorous operation every long-running
  * ingest needs (the reference's batch-appended `delay_events` table,
  * `airflow/dags/ml_pipeline_dag.py:104-283`, accretes one file per run;
  * a streaming file sink accretes one per micro-batch per partition).
  * At 100 TB, millions of kilobyte files turn listing and task scheduling
  * into the bottleneck long before scan bandwidth matters.
  *
  * `compact` rewrites a parquet directory into ⌈bytes / targetBytes⌉
  * evenly-sized files via a round-robin `repartition(n)` (no shuffle key
  * needed — the goal is size, not order), writing to a NEW directory and
  * only then swapping, the same write-new-then-switch discipline as
  * [[MaterializedViews]]: readers of the old layout are never broken
  * mid-rewrite. Row content is preserved exactly (asserted by spec via
  * count + checksum); file-internal order is NOT (parquet readers never
  * assume it).
  *
  * Scale notes: sizing uses the source's actual on-disk bytes (summed
  * from the file listing, not a heuristic), so compression survives the
  * round trip approximately; `repartition` is one all-to-all of the data
  * being compacted — the unavoidable cost, paid once per compaction
  * window, typically off-peak per day-partition rather than
  * whole-table. */
object Compaction {

  /** Parquet data files under `dir` (ignores _SUCCESS/metadata). */
  private def dataFiles(dir: String): Seq[java.io.File] = {
    val fs = new java.io.File(dir).listFiles()
    (if (fs == null) Array.empty[java.io.File] else fs)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
  }

  /** Number of output files compaction would produce for `dir`. */
  def plannedFileCount(dir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val total = dataFiles(dir).map(_.length()).sum
    math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
  }

  /** Rewrite `dir` into ~targetBytes files at `outDir` (must differ from
    * `dir`); returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetBytes: Long): (Int, Int) = {
    require(new java.io.File(outDir).getCanonicalPath !=
            new java.io.File(dir).getCanonicalPath,
            "compact writes to a NEW directory (write-new-then-switch)")
    val before = dataFiles(dir).size
    val n = plannedFileCount(dir, targetBytes)
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    (before, dataFiles(outDir).size)
  }

  /** Order-independent content checksum for rewrite verification: sum of
    * per-row 64-bit hashes over all columns — identical iff the row
    * multisets match (up to astronomically unlikely collision). Decimal
    * accumulation: a long sum of 2⁶³-range hashes overflows under ANSI. */
  def checksum(df: DataFrame): java.math.BigDecimal =
    df.select(xxhash64(df.columns.map(col): _*)
        .cast("decimal(38,0)").as("h"))
      .agg(sum(col("h"))).first().getDecimal(0)
}
