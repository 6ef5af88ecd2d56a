package graft

import org.apache.spark.sql.SparkSession

/** Dev instrument (r15, verdict ask #2): interleaved one-JVM A/B of a
  * RUNTIME conf set against the default, over named entries — the
  * clean instrument for the deferred preferSortMergeJoin/SHJ question
  * (two separate sessions drift ±15% on this box; flipping a runtime
  * SQLConf between interleaved runs shares every warm-up and box
  * condition). Each iteration runs every entry under both variants,
  * ALTERNATING which goes first per iteration: a back-to-back second
  * run of the same entry is systematically faster (measured ×0.64 with
  * B == A — JIT/GC/page-cache position bias), so min-of-N is only fair
  * when each variant gets first and second positions. Min per
  * (entry, variant) reported.
  *
  *   GRAFT_CONF_B="k=v;k=v" SPARK_GRAFT_SF_DIR=... \
  *     sbt "Test/runMain graft.ConfABProbe <iters> <name>..."
  */
object ConfABProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: ConfABProbe <iters> <name>...")
    val confB = sys.env.getOrElse("GRAFT_CONF_B",
      "spark.sql.join.preferSortMergeJoin=false;" +
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64MB")
      .split(';').iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }.toSeq
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
    def withConf[T](on: Boolean)(f: => T): T =
      if (!on) f
      else {
        val prev = confB.map { case (k, _) => (k, spark.conf.getOption(k)) }
        confB.foreach { case (k, v) => spark.conf.set(k, v) }
        try f finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      }
    def run(name: String, b: Boolean): (Double, Long) = withConf(b) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm both variants once
    names.foreach { n => run(n, b = false); run(n, b = true) }
    val minA = collection.mutable.Map.empty[String, Double]
    val minB = collection.mutable.Map.empty[String, Double]
    for (i <- 1 to iters; name <- names) {
      val bFirst = i % 2 == 0
      val (t1, r1) = run(name, b = bFirst)
      val (t2, r2) = run(name, b = !bFirst)
      val (ta, tb) = if (bFirst) (t2, t1) else (t1, t2)
      require(r1 == r2, s"$name row count differs under conf B: $r1 vs $r2")
      minA(name) = math.min(minA.getOrElse(name, Double.MaxValue), ta)
      minB(name) = math.min(minB.getOrElse(name, Double.MaxValue), tb)
      println(f"CONFAB $name round$i A=$ta%.3f B=$tb%.3f bFirst=$bFirst")
    }
    var sa = 0.0; var sb = 0.0
    names.foreach { n =>
      sa += minA(n); sb += minB(n)
      println(f"CONFAB-SUMMARY $n A=${minA(n)}%.3f B=${minB(n)}%.3f " +
        f"ratio=${minB(n) / minA(n)}%.3f")
    }
    println(f"CONFAB-TOTAL A=$sa%.3f B=$sb%.3f ratio=${sb / sa}%.3f " +
      s"confB=${confB.map { case (k, v) => s"$k=$v" }.mkString(";")}")
    spark.stop()
  }
}
