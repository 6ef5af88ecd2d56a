package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing args: restrict the dump to these query names
    // (driver passes none; dev runs use it to re-check changed entries)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Multi-JVM cell (round-11 verdict ask #1): SPARK_GRAFT_MASTER lets
    // tools/config_matrix.py run the whole contract under
    // local-cluster[n,cores,mem] — true separate executor JVMs, so
    // broadcast serialization, remote shuffle-block fetch, and
    // executor-side classloading of the custom expressions actually
    // cross a process boundary (local[*] never exercises any of them).
    // The jar + executor JVM flags ride in via SPARK_GRAFT_EXTRA_CONF.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // micros (not INT96) so the dumped parquet timestamps compare cleanly
      // against DuckDB's timestamp[us] results
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
    // Config-robustness hook (round-10 verdict ask #3): the contract must
    // hold under OTHER Spark configurations than the one blessed default —
    // codegen off (the interpreted evaluator is a genuinely different
    // execution engine for the custom Catalyst expressions), AQE off,
    // shuffle-partition extremes. `k=v;k=v` pairs, applied LAST so they
    // override the defaults above. Correctness must be config-invariant;
    // the tools/config_matrix.py sweep asserts exactly that.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { s =>
      s.split(';').iterator.map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k.trim, v.trim)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_EXTRA_CONF entry must be key=value, got '$kv'")
        }
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Spill-path witness (round-10 verdict ask #2): local[32]/128 GiB
    // never spills, so the ExternalSorter / ExternalAppendOnlyMap /
    // UnsafeExternalSorter paths that dominate a real cluster's behavior
    // would otherwise go unexecuted under this contract. With
    // SPARK_GRAFT_ASSERT_SPILL=1 (paired with force-spill thresholds via
    // SPARK_GRAFT_EXTRA_CONF — see tools/config_matrix.py's spill cell),
    // a listener accumulates task spill metrics and the run FAILS unless
    // something actually spilled — proving the hashes that check_local
    // then verifies were produced through the spill machinery, not past
    // it. (Same assert-the-instrument discipline as the late-drop
    // observer: a rehearsal that can silently not-exercise its target
    // path proves nothing.)
    val spillAssert = sys.env.get("SPARK_GRAFT_ASSERT_SPILL").contains("1")
    val spillMem = new java.util.concurrent.atomic.LongAdder
    val spillDisk = new java.util.concurrent.atomic.LongAdder
    if (spillAssert)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = e.taskMetrics
            if (m != null) {
              spillMem.add(m.memoryBytesSpilled)
              spillDisk.add(m.diskBytesSpilled)
            }
          }
        })
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    DumpContract.write(outDir)
    // Driver-memory envelope (round-12 verdict ask #3): one line per
    // run; tools/driver_memory.py diffs it across scales to assert the
    // driver's retained state is cardinality-bounded, not
    // corpus-proportional.
    println(s"""[verify] DRIVER_PEAK {${DriverPeak.jsonFields}}""")
    if (spillAssert) {
      // the listener bus is async; a run-total across hundreds of
      // queries is stable long before stop, but trailing task-end
      // events can straggle on a loaded box — poll until a spill is
      // visible (or a generous deadline) instead of one fixed sleep,
      // so the assert can't spuriously fail on bus latency alone
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spillMem.sum + spillDisk.sum == 0 && System.nanoTime() < deadline)
        Thread.sleep(250)
      println(s"[verify] SPILL mem=${spillMem.sum} disk=${spillDisk.sum}")
      if (spillMem.sum + spillDisk.sum == 0) {
        System.err.println("[verify] SPILL-ASSERT FAILED: no task " +
          "spilled — the rehearsal did not exercise the spill path")
        spark.stop()
        sys.exit(3)
      }
    }
    spark.stop()
  }
}

/** Contract dump shared by [[Verify]] and the pre-commit lint path:
  * writes `oracle_sql.json` (the doc/discipline lints' truth source)
  * from the pure [[SparkEntry.oracleSql]] map — no SparkSession, so
  * `tools/pre_commit.sh` can refresh the lints' input in milliseconds
  * instead of requiring a full Verify sweep per commit. */
object DumpContract {
  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL would otherwise make
    * the driver's json.load fail and silently zero the round's
    * correctness. */
  private[graft] def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def write(outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json): Unit
  }

  def main(args: Array[String]): Unit =
    write(args.headOption.getOrElse("/root/repo/target/verify_out"))
}
