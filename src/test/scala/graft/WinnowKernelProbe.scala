package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev instrument (r15): interleaved one-JVM timing of the fused native
  * winnowing projection (graft.expressions.WinnowFps) against the
  * declarative chain it replaced (Dedup.winnowFpsDecl — sliding_windows
  * + hash60_all + interpreted window-min transform + array_distinct) on
  * the real documents table. Noop-sink timed (guide §1.4), min-of-N
  * wall + min summed executor CPU per variant; order alternates per
  * round (the ConfABProbe position-bias lesson).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.WinnowKernelProbe [iters]"
  */
object WinnowKernelProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(5)
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
    graft.expressions.Registration.registerAll(spark)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            cpuNs.addAndGet(e.taskMetrics.executorCpuTime): Unit
      })
    def docs = graft.ops.fanout(
      Tables.documents(spark, sfDir), col("doc_id"))
    val native = call_function("winnow_fps", lower(col("text")),
                               lit(8), lit(4))
    val decl = graft.ops.Dedup.winnowFpsDecl(lower(col("text")))
    def run(c: org.apache.spark.sql.Column): (Double, Double) = {
      cpuNs.set(0)
      val t0 = System.nanoTime()
      docs.select(col("doc_id"), explode(c).as("fp"))
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (wall, cpuNs.get() / 1e9)
    }
    run(native); run(decl) // warm both
    var bn = Double.MaxValue; var bd = Double.MaxValue
    var cn = Double.MaxValue; var cd = Double.MaxValue
    for (i <- 1 to iters) {
      val declFirst = i % 2 == 0
      val (w1, c1) = run(if (declFirst) decl else native)
      val (w2, c2) = run(if (declFirst) native else decl)
      val (wn, cnu, wd, cdu) =
        if (declFirst) (w2, c2, w1, c1) else (w1, c1, w2, c2)
      bn = math.min(bn, wn); bd = math.min(bd, wd)
      cn = math.min(cn, cnu); cd = math.min(cd, cdu)
      println(f"WINNOW round$i native wall=$wn%.3f cpu=$cnu%.2f | " +
        f"decl wall=$wd%.3f cpu=$cdu%.2f declFirst=$declFirst")
    }
    println(f"WINNOW-SUMMARY native min=$bn%.3f cpuMin=$cn%.2f | " +
      f"decl min=$bd%.3f cpuMin=$cd%.2f sf=$sfDir")
    spark.stop()
  }
}
