package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for two-dimensional file pruning.
  *
  * A single-column sort gives parquet min/max pruning on that column
  * only; sorting by the INTERLEAVED bits of two columns clusters rows so
  * every output file covers a small box in (x, y) space — a predicate on
  * EITHER or both dimensions then skips most files on their min/max
  * footer stats alone. This is the standard layout trick behind
  * Delta/Iceberg `ZORDER BY`, re-expressed with nothing but
  * `sortWithinPartitions`/`repartitionByRange` and bit arithmetic — no
  * table format required.
  *
  * The curve here interleaves 16 bits per dimension (65536 buckets each
  * — file-pruning granularity, not row precision). Inputs must be
  * rank-normalized to [0, 65535] by the caller: `zvalue` MASKS to the
  * low 16 bits (a 65536 wraps to bucket 0, it is not clamped), which is
  * correct only after normalization. The interleave itself is pure
  * column arithmetic (codegen'd, no UDF).
  *
  * Scale notes: `repartitionByRange(zvalue)` is one range shuffle of the
  * data being laid out — the same cost as any global sort, paid once at
  * write time; every subsequent box query pays only file-listing +
  * pruned scans. The spec measures the payoff directly: per-file
  * (min, max) boxes from the written layout, and a box query that must
  * intersect a small fraction of files.
  */
object ZOrder {

  /** Morton interleave of two 16-bit-clamped ints: bit i of x lands at
    * even position 2i, bit i of y at odd position 2i+1. Pure column
    * shifts/masks — stays in whole-stage codegen. */
  def zvalue(x: Column, y: Column): Column = {
    // spread 16 bits to even positions (the classic mask ladder),
    // expressed on longs: x16 -> x with 0 interleaved between bits
    def spread(c: Column): Column = {
      val c0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
      val c1 = (c0.bitwiseOR(shiftleft(c0, 8))).bitwiseAND(lit(0x00FF00FFL))
      val c2 = (c1.bitwiseOR(shiftleft(c1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      val c3 = (c2.bitwiseOR(shiftleft(c2, 2))).bitwiseAND(lit(0x33333333L))
      (c3.bitwiseOR(shiftleft(c3, 1))).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** Write `df` z-ordered on the two given integer-ranged columns into
    * `nFiles` range-partitioned files at `outDir`. */
  def writeZOrdered(spark: SparkSession, df: DataFrame,
                    xCol: String, yCol: String,
                    nFiles: Int, outDir: String): Unit =
    df.withColumn("__z", zvalue(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /** Per-file bounding boxes of the written layout:
    * (file, min_x, max_x, min_y, max_y) — what a footer-stats pruner
    * sees. */
  def fileBoxes(spark: SparkSession, dir: String,
                xCol: String, yCol: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
           min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
}
