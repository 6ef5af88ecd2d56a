package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM/codegen/parquet-reader initialization happens once here
    // instead of inflating whichever query runs first
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // min of two runs per query: single-shot numbers on a shared box are
    // ±2× noisy (see PLANS.md); the min is the stable signal. A failed
    // query must NOT report its (fast) exception time as a result — it is
    // marked -1 and listed under "errors".
    var errors = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      if (times.exists(!_._1)) { errors ::= name; name -> -1.0 }
      else name -> times.map(_._2).min
    }
    // 0.1 ms per-query precision and sorted keys: the driver captures a
    // bounded TAIL of stdout, so the line must stay compact and
    // deterministic for ALL queries to be visible/parseable (round-2 tails
    // truncated ~18 of 82 entries). The identical JSON also lands in a
    // file as a truncation-proof artifact.
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/target/bench_full.json"),
      line.getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
