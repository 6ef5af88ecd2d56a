package graft

import org.apache.spark.sql.SparkSession

/** Dev instrument (r15): the EXECUTED (AQE-final) plan of named
  * entries — `graft.Explain` prints the pre-execution formatted plan,
  * where AQE's runtime SMJ→SHJ rewrites
  * (`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`) are not
  * yet visible. Runs each entry once (count action), then prints
  * `queryExecution.executedPlan` with every adaptive subtree finalized.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.FinalPlanProbe <name>..."
  */
object FinalPlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FinalPlanProbe <name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toSeq.foreach { name =>
      println(s"\n==== $name ====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count()
      println(df.queryExecution.executedPlan.toString())
    }
    spark.stop()
  }
}
