package graft

import org.apache.spark.sql.SparkSession

/** r14 floor decomposition: what a trivial entry's wall clock is made of.
  * Times (a) bare spark.read.parquet() construction (listing + footer
  * schema inference, driver-side), (b) re-read of the same path, (c) a
  * count() on the loaded frame, (d) a full trivial entry. Dev only. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"FLOOR $label t=${(System.nanoTime() - t0) / 1e9}%.4f")
    }
    for (r <- 1 to 3) {
      println(s"== round $r")
      time("read_lineitem_cold")(spark.read.parquet(s"$sfDir/lineitem.parquet"))
      time("read_lineitem_again")(spark.read.parquet(s"$sfDir/lineitem.parquet"))
      time("read_all_10_tables")(
        Tables.allNames.foreach(n => Tables.table(spark, sfDir, n)))
      time("lineitem_scan_count")(
        spark.read.parquet(s"$sfDir/lineitem.parquet").count())
      time("agg_basic_entry")(
        SparkEntry.queries("agg_basic")(spark, sfDir).count())
      time("fn_datetime_extract_entry")(
        SparkEntry.queries("fn_datetime_extract")(spark, sfDir).count())
      time("filter_nulls_entry")(
        SparkEntry.queries("filter_nulls")(spark, sfDir).count())
    }
    spark.stop()
  }
}
