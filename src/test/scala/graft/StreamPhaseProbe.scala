package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev instrument (r15, verdict ask #5): where does a streaming entry's
  * wall time actually go? Wall-clocks each named entry while a
  * StreamingQueryListener collects every micro-batch's `durationMs`
  * phase map (triggerExecution, queryPlanning, walCommit, addBatch,
  * commitOffsets, getBatch, latestOffset) — the decomposition that says
  * whether the cost is computation (addBatch) or query-lifecycle
  * machinery (start/plan/commit/stop), and therefore whether any
  * scale-valid lever exists.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.StreamPhaseProbe <name>..."
  */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamPhaseProbe <name>...")
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
    val phases = collection.mutable.Map.empty[String, Long]
    val batches = new java.util.concurrent.atomic.AtomicInteger
    var startedAt = 0L
    var firstProgressAt = 0L
    var lastProgressAt = 0L
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        startedAt = System.nanoTime()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        if (firstProgressAt == 0L) firstProgressAt = System.nanoTime()
        lastProgressAt = System.nanoTime()
        batches.incrementAndGet()
        phases.synchronized {
          e.progress.durationMs.forEach { (k, v) =>
            phases(k) = phases.getOrElse(k, 0L) + v
          }
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    // warm the session (parquet reader, codegen) once
    spark.read.parquet(s"$sfDir/region.parquet").count()
    args.toSeq.foreach { name =>
      phases.synchronized { phases.clear() }; batches.set(0)
      startedAt = 0L; firstProgressAt = 0L; lastProgressAt = 0L
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // listener settle
      val toStart = if (startedAt == 0) -1 else (startedAt - t0) / 1e9
      val afterLast =
        if (lastProgressAt == 0) -1
        else (t0 + (wall * 1e9).toLong - lastProgressAt) / 1e9
      val ph = phases.synchronized {
        phases.toSeq.sortBy(-_._2)
          .map { case (k, v) => f"$k=${v / 1e3}%.2f" }.mkString(" ")
      }
      println(f"STREAMPHASE $name wall=$wall%.2f toStart=$toStart%.2f " +
        f"batches=${batches.get()} afterLastProgress=$afterLast%.2f | $ph")
    }
    spark.stop()
  }
}
