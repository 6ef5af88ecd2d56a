package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev instrument (r15, verdict ask #1): interleaved one-JVM A/B of the
  * two per-edge intersection spellings in ext_triangle_count —
  * `sorted_intersect_count(nb_u, nb_v)` (the r14 allocation-free merge
  * walk) vs `size(array_intersect(nb_u, nb_v))` (the builtin hash-set
  * build) — over the SAME materialized oriented-edge/adjacency frames,
  * so only the intersection stage differs. Min-of-N wall + min summed
  * executor CPU per variant.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.TriangleKernelProbe [iters]"
  */
object TriangleKernelProbe {
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
    graft.expressions.SortedIntersectCount.register(spark)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            cpuNs.addAndGet(e.taskMetrics.executorCpuTime): Unit
      })
    // the entry's own edge pipeline, materialized once outside the
    // timed region: only the intersection stage is under test
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = li.as("x").join(li.as("y"), col("x.ok") === col("y.ok") &&
                                col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
      .distinct().localCheckpoint()
    val deg = edges.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val fwd = col("da") < col("db") ||
              (col("da") === col("db") && col("a") < col("b"))
    val or = edges
      .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
      .select(when(fwd, col("a")).otherwise(col("b")).as("u"),
              when(fwd, col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint()
    val adj = or.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nb"))
      .localCheckpoint()
    val joined = or
      .join(adj.select(col("u"), col("nb").as("nb_u")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nb").as("nb_v")), Seq("v"))
    def run(kernel: org.apache.spark.sql.Column): (Double, Double, Long) = {
      cpuNs.set(0)
      val t0 = System.nanoTime()
      val n = joined.select(kernel.as("t"))
        .agg(coalesce(sum(col("t")), lit(0L)).as("n_triangles"))
        .first().getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (wall, cpuNs.get() / 1e9, n)
    }
    val merge = expr("sorted_intersect_count(nb_u, nb_v)")
    val builtin = size(array_intersect(col("nb_u"), col("nb_v"))).cast("long")
    run(merge); run(builtin) // warm both
    var bm = Double.MaxValue; var bb = Double.MaxValue
    var cm = Double.MaxValue; var cb = Double.MaxValue
    for (i <- 1 to iters) {
      val (wm, cmu, nm) = run(merge)
      val (wb, cbu, nb) = run(builtin)
      require(nm == nb, s"count mismatch: $nm vs $nb")
      bm = math.min(bm, wm); bb = math.min(bb, wb)
      cm = math.min(cm, cmu); cb = math.min(cb, cbu)
      println(f"TRI round$i merge wall=$wm%.3f cpu=$cmu%.2f | " +
        f"builtin wall=$wb%.3f cpu=$cbu%.2f (n=$nm)")
    }
    println(f"TRI-SUMMARY merge min=$bm%.3f cpuMin=$cm%.2f | " +
      f"builtin min=$bb%.3f cpuMin=$cb%.2f sf=$sfDir")
    spark.stop()
  }
}
