package graft
import org.apache.spark.sql.SparkSession

/** Task-retry determinism probe (round-10 verdict ask #4, the runtime
  * complement to check_discipline.py's retry_scala lint): run a
  * representative entry on a `local[4, 2]` master (maxFailures = 2),
  * first clean, then with `graft.test.failonce` set so the first
  * attempt of partition 0 of every table scan throws an injected
  * transient failure ([[Tables.RetryFault]]). Spark retries the failed
  * task; the probe asserts (a) the injection actually FIRED (the retry
  * path executed — same assert-the-instrument discipline as the spill
  * witness and the late-drop observer) and (b) the retried run's rows
  * equal the clean run's exactly. Prints one JSON line and exits 4 on
  * violation.
  *
  * Own main (not a ScalaTest spec body) because maxFailures is fixed at
  * SparkContext creation and the shared test session runs local[*]
  * with maxFailures=1; RetrySpec shells out to this probe in a fresh
  * JVM. Usage: graft.RetryProbe [sfDir] [entry ...]
  */
object RetryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("agg_multikey", "win_lag", "ext_exact_dedup")
    val spark = SparkSession.builder()
      .master("local[4, 2]") // 4 threads, 2 task attempts
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    val results = names.map { name =>
      val clean = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      sys.props("graft.test.failonce") = s"probe_$name"
      val firedBefore = Tables.RetryFault.fired.size
      val retried =
        try SparkEntry.queries(name)(spark, sfDir)
          .collect().map(_.toString).sorted.toSeq
        finally sys.props.remove("graft.test.failonce")
      val fired = Tables.RetryFault.fired.size > firedBefore
      val equal = clean == retried
      if (!fired || !equal) bad += 1
      s""""$name":{"rows":${clean.size},"fired":$fired,"equal":$equal}"""
    }
    println(results.mkString("{\"retry_probe\":{", ",", "}}"))
    spark.stop()
    if (bad > 0) sys.exit(4)
  }
}
