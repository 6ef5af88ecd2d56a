package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev instrument (r15): interleaved one-JVM timing of the NATIVE
  * simhash60 kernel (graft.expressions.Simhash60) against the
  * declarative 60-fold spelling it replaced (Dedup.simhash60Decl) on
  * the real documents table — the projection both simhash entries pay.
  * Noop-sink timed (guide §1.4), min-of-N reported; also reports the
  * summed executor CPU of the LAST repetition of each variant.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.SimhashKernelProbe [iters]"
  */
object SimhashKernelProbe {
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
    def run(c: org.apache.spark.sql.Column): (Double, Double) = {
      cpuNs.set(0)
      val t0 = System.nanoTime()
      docs.select(col("doc_id"), c.as("simhash"))
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener settle
      (wall, cpuNs.get() / 1e9)
    }
    // warm both paths once
    run(graft.ops.Dedup.simhash60(col("text")))
    run(graft.ops.Dedup.simhash60Decl(col("text")))
    var bestN = Double.MaxValue; var bestD = Double.MaxValue
    var cpuN = Double.MaxValue; var cpuD = Double.MaxValue
    for (i <- 1 to iters) {
      val (wn, cn) = run(graft.ops.Dedup.simhash60(col("text")))
      val (wd, cd) = run(graft.ops.Dedup.simhash60Decl(col("text")))
      bestN = math.min(bestN, wn); bestD = math.min(bestD, wd)
      cpuN = math.min(cpuN, cn); cpuD = math.min(cpuD, cd)
      println(f"SIMHASH round$i native wall=$wn%.3f cpu=$cn%.2f | " +
        f"decl wall=$wd%.3f cpu=$cd%.2f")
    }
    println(f"SIMHASH-SUMMARY native min=$bestN%.3f cpuMin=$cpuN%.2f | " +
      f"decl min=$bestD%.3f cpuMin=$cpuD%.2f sf=$sfDir")
    spark.stop()
  }
}
