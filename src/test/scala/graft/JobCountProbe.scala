package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev instrument for the optimization rounds: per-entry Spark JOB /
  * STAGE / TASK / shuffle-byte counts — the deterministic complement to
  * wall-clock AB timing (job and stage counts cannot be perturbed by box
  * load, so a "this change removes two jobs per call" claim is checkable
  * exactly). Runs each named entry twice and reports the SECOND run
  * (first run pays one-off session warm-up such as function-registry
  * and codegen cache fills), timing excluded on purpose — use graft.AB
  * for wall clock.
  *
  *   sbt "Test/runMain graft.JobCountProbe <name> [name...]"
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobCountProbe <name> [name...]")
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
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet(): Unit
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          cpuNs.addAndGet(m.executorCpuTime)
          runMs.addAndGet(m.executorRunTime): Unit
        }
      }
    })
    for (name <- args.toSeq) {
      SparkEntry.queries(name)(spark, sfDir).count() // warm-up run
      // listener bus is async; settle before zeroing / reading
      Thread.sleep(600)
      jobs.set(0); stages.set(0); tasks.set(0); shufW.set(0); shufR.set(0)
      cpuNs.set(0); runMs.set(0)
      SparkEntry.queries(name)(spark, sfDir).count()
      Thread.sleep(600)
      println(s"JOBCOUNT $name jobs=${jobs.get} stages=${stages.get} " +
        s"tasks=${tasks.get} shufW=${shufW.get} shufR=${shufR.get} " +
        f"cpuSec=${cpuNs.get / 1e9}%.3f runSec=${runMs.get / 1e3}%.3f")
    }
    spark.stop()
  }
}
