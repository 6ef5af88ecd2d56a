package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r14 decomposition of ext_knn_mutual_clusters' cost: times each
  * pipeline phase separately (grid pairs, kNN window, mutual join, CC
  * loop, report tail) with the noop-sink discipline where a phase is
  * lazy. Dev instrument only. */
object KnnPhaseProbe {
  def main(args: Array[String]): Unit = {
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label t=${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 3) {
      println(s"== round $round")
      val emb = graft.Tables.embeddings(spark, sfDir)
      val pairs = time("grid_pairs_noop") {
        val p = graft.ops.Similarity.blockPairs(spark, emb, blocks = 8)
        noop(p); p
      }
      val pairsCk = time("grid_pairs_checkpoint")(pairs.localCheckpoint())
      val knn = time("knn_window_noop") {
        import org.apache.spark.sql.expressions.Window
        val sym = pairsCk
          .select(col("a").as("node"), col("b").as("nbr"), col("cos"))
          .union(pairsCk.select(col("b").as("node"), col("a").as("nbr"),
                                col("cos")))
        val w = Window.partitionBy(col("node"))
          .orderBy(col("cos").desc, col("nbr").asc)
        val k = sym.select(col("node"), col("nbr"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 2).select(col("node"), col("nbr"))
        noop(k); k
      }
      val mutual = time("mutual_join")(
        graft.ops.Clustering.mutualEdges(knn))
      val labels = time("cc_loop")(
        graft.ops.Clustering.connectedComponents(
          mutual, emb.select(col("vec_id"))))
      time("report_tail_noop") {
        noop(graft.ops.Clustering.extKnnMutualClusters(spark, sfDir))
      }
      labels.count(): Unit
    }
    spark.stop()
  }
}
