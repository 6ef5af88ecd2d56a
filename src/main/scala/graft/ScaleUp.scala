package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal data generator: builds an N×-sf0.1 corpus from the
  * driver's read-only testdata by unioning N key-shifted copies — the
  * standard "data doubling" construction for scaling curves. Usage:
  *
  *   sbt "runMain graft.ScaleUp /root/testdata/sf0.1 target/scale/sf0.3 3"
  *
  * Faithfulness rules (each copy must look like MORE corpus, not like a
  * mirror of the old one — a verbatim copy would triple every dedup
  * family and inflate band-join pair density ×N², which is not what a
  * 3× crawl looks like):
  *   - every key column shifts by copy × (max_key + 1), preserving all
  *     FK joins within a copy;
  *   - `documents.text` in copy c > 0 gets a per-token suffix (x,c via
  *     regexp_replace), which preserves token counts, length
  *     distribution, and the copy's INTERNAL duplicate-family structure
  *     verbatim while making every cross-copy shingle distinct;
  *   - `embeddings.embedding` in copy c rotates circularly by c
  *     positions: norms and all within-copy dot products are exactly
  *     preserved (same rotation both sides), cross-copy similarity
  *     decorrelates; IVF seeds (vec_id < 16) stay copy-0-only;
  *   - `events` keeps its timestamps (a bigger stream is DENSER over
  *     the same period, not longer);
  *   - fixed-size dimensions (region, nation) are not multiplied, as in
  *     TPC-H.
  * Optional 4th arg `crossDupPermille` (default 0): that fraction of
  * documents (selected deterministically by doc_id, the SAME docs in
  * every copy) keeps its text VERBATIM across copies — planting
  * cross-copy duplicate families so the dedup operators' real cost
  * driver (candidate-pair volume, not corpus volume) can be measured at
  * a controlled density. 10 permille over N copies turns each selected
  * doc into an N-clique for the band joins.
  *
  * Dev-only harness for PLANS.md scaling exponents; not part of the
  * query surface.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copiesS) = args.take(3)
    val copies = copiesS.toInt
    val crossDupPermille = args.lift(3).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(n: String): DataFrame = spark.read.parquet(s"$srcDir/$n.parquet")
    def keyOffset(df: DataFrame, key: String): Long = {
      val r = df.agg(max(col(key))).head
      require(!r.isNullAt(0),
        s"[scaleup] source table is empty (no $key values) — refusing to " +
        "build a scaled corpus from it")
      r.getLong(0) + 1L
    }

    // passthrough dims
    for (n <- Seq("region", "nation"))
      tbl(n).write.mode("overwrite").parquet(s"$outDir/$n.parquet")

    val custOff = keyOffset(tbl("customer"), "c_custkey")
    val suppOff = keyOffset(tbl("supplier"), "s_suppkey")
    val partOff = keyOffset(tbl("part"), "p_partkey")
    val ordOff  = keyOffset(tbl("orders"), "o_orderkey")
    val evOff   = keyOffset(tbl("events"), "event_id")
    val userOff = keyOffset(tbl("events"), "user_id")
    val docOff  = keyOffset(tbl("documents"), "doc_id")
    val vecOff  = keyOffset(tbl("embeddings"), "vec_id")

    def shifted(name: String, shift: (DataFrame, Int) => DataFrame): Unit = {
      val src = tbl(name)
      val out = (0 until copies).map(c => shift(src, c)).reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaleup] $name -> ${copies}x")
    }

    shifted("customer", (df, c) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(custOff * c)))
    shifted("supplier", (df, c) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(suppOff * c)))
    shifted("part", (df, c) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(partOff * c)))
    shifted("orders", (df, c) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(ordOff * c))
      .withColumn("o_custkey", col("o_custkey") + lit(custOff * c)))
    shifted("lineitem", (df, c) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(ordOff * c))
      .withColumn("l_partkey", col("l_partkey") + lit(partOff * c))
      .withColumn("l_suppkey", col("l_suppkey") + lit(suppOff * c)))
    shifted("events", (df, c) => df
      .withColumn("event_id", col("event_id") + lit(evOff * c))
      .withColumn("user_id", col("user_id") + lit(userOff * c)))
    shifted("documents", (df, c) => {
      val suffixed = regexp_replace(col("text"), "(\\S+)", "$1x" + c)
      val t = if (c == 0) col("text")
              else if (crossDupPermille == 0) suffixed
              else when(pmod(col("doc_id"), lit(1000L))
                          < crossDupPermille, col("text"))
                     .otherwise(suffixed)
      // Rewrite text BEFORE shifting doc_id: the keep-verbatim predicate
      // must select the SAME pmod(doc_id,1000) subset in every copy so the
      // kept docs form true N-cliques (a shifted doc_id would pick a
      // different subset per copy unless docOff % 1000 == 0).
      df.withColumn("text", t)
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("doc_id", col("doc_id") + lit(docOff * c))
    })
    // rotation amount derived from the ACTUAL dimension (probed once) and
    // taken mod dim, so copies > dim and non-64-dim corpora stay valid
    val embDim = tbl("embeddings").select(size(col("embedding"))).head.getInt(0)
    require(embDim > 0, "[scaleup] embeddings table has empty vectors")
    shifted("embeddings", (df, c) => {
      val rot = c % embDim
      val e = if (rot == 0) col("embedding")
              else concat(slice(col("embedding"), rot + 1, embDim - rot),
                          slice(col("embedding"), 1, rot))
      df.withColumn("vec_id", col("vec_id") + lit(vecOff * c))
        .withColumn("embedding", e)
    })
    spark.stop()
  }
}
