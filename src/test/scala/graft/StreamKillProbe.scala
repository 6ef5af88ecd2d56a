package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Hard mid-drain CRASH for the streaming kill-and-restart rehearsal
  * (round-11 verdict ask #4): runs one checkpointed streaming entry
  * with maxFilesPerTrigger=1 and `Runtime.halt(9)`s the WHOLE JVM
  * after the first micro-batch progress event lands — no stop(), no
  * shutdown hooks, no final offset commit; the checkpoint is left
  * exactly as a power-cut would leave it (possibly between a sink
  * write and its offset commit). The parent spec then restarts the
  * same entry over the same checkpoint in a fresh session and asserts
  * the completed drain equals the batch answer — the strong
  * exactly-once claim, vs the old "second run is a no-op" test.
  *
  * Exit is ALWAYS by halt when armed; reaching the end of main means
  * the drain completed before the kill fired, reported as exit 3 so
  * the spec can fail loudly instead of silently testing nothing.
  * Usage: graft.StreamKillProbe <mode:inc|upsert> <srcDir> <base>
  */
object StreamKillProbe {
  def main(args: Array[String]): Unit = {
    val Array(mode, srcDir, base) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props("graft.stream.maxFiles") = "1"
    spark.streams.addListener(new StreamingQueryListener {
      private var seen = 0
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        seen += 1
        if (seen >= 1) {
          System.err.println(s"[killprobe] halting after batch " +
            s"${e.progress.batchId}")
          Runtime.getRuntime.halt(9)
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    mode match {
      case "inc" =>
        graft.streaming.EventsStream.incrementalDaily(
          spark, srcDir, s"$base/ckpt", s"$base/out").count(): Unit
      case "upsert" =>
        graft.streaming.EventsStream.upsertMergeFrom(
          spark, graft.streaming.EventsStream.eventsSourceDir(srcDir),
          base, Some(1)).count(): Unit
      case other => sys.error(s"unknown mode $other")
    }
    System.err.println("[killprobe] drained without kill — nothing tested")
    spark.stop()
    sys.exit(3)
  }
}
