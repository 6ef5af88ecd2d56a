package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for selected queries (or
  * all) and flags the scale smells SURVEY.md §4 cares about — missing
  * filter pushdown, full-column scans, nested-loop joins where an
  * equi-join was intended.
  *
  * `sbt "runMain graft.Explain [queryName ...]"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: UNKNOWN")
        case Some(fn) =>
          println(s"\n==== $name ====")
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.executedPlan.toString()
            // (WholeStageCodegen isn't visible pre-AQE-finalization, so we
            // only flag join-shape smells here)
            val smells = Seq(
              "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
              "CartesianProduct" -> plan.contains("CartesianProduct"))
              .collect { case (s, true) => s }
            println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
            if (smells.nonEmpty) println(s"[smells] ${smells.mkString(", ")}")
          } catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
