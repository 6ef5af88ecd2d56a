package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search operators over the embedding column (SURVEY.md §2.11
  * E3 / BASELINE.json): brute-force cosine top-k (the correctness
  * baseline) and a random-hyperplane-LSH bucketed variant (the scale
  * path).
  *
  * Cross-engine exactness: every dot product is Σ double(xᵢ)·double(yᵢ)
  * — a float×float product is exactly representable in double (24+24 <
  * 53 mantissa bits) and both Spark's `aggregate` and DuckDB's
  * `list_aggregate('sum')` fold left-to-right, so cosines are
  * bit-identical and rank/threshold comparisons cannot flip between
  * engines (verified empirically; `list_dot_product` does NOT have this
  * property — it accumulates in float).
  *
  * Scale design: brute-force top-k is O(Q·N) dot products — fine for a
  * query batch against a broadcast candidate set, wrong for all-pairs at
  * 100 TB. The LSH variant buckets by hyperplane-sign signature so the
  * join is an equi-join on `sig` (shuffle on bucket id, candidates only
  * compared in-bucket); recall/probe trade-off is the number of planes.
  * An IVF variant would swap the signature for a coarse-quantizer
  * centroid id — same join shape.
  */
object Similarity {

  /** Σ double(x)·double(y) over zipped float arrays — exact, fold-ordered.
    * Uses the codegen'd [[graft.expressions.FloatVecDot]] (register it on
    * the session first); [[dotDHof]] is the declarative equivalent kept
    * for A/B measurement — both produce bit-identical doubles. */
  def dotD(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** Higher-order-function form of [[dotD]] (interpreted; ~µs per call). */
  def dotDHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, v) => acc + v)

  def normD(a: Column): Column = sqrt(dotD(a, a))

  private def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (normD(a) * normD(b))

  // deterministic hyperplanes: 6 planes × 64 dims from a fixed LCG
  private[ops] val planes: Seq[Array[Double]] = {
    var x = 0x9E3779B97F4A7C15L
    def next(): Double = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(6)(Array.fill(64)(next()))
  }

  private def planeLit(p: Array[Double]): Column = array(p.map(lit): _*)

  /** Hyperplane-sign LSH signature (6 bits → 64 buckets). Plane dots stay
    * on the HOF path: the planes are double literals (vec_dot is
    * float×float only, and float-casting them would change the oracle's
    * double arithmetic); 6×64 interpreted ops per row is cheap. */
  def lshSig(emb: Column): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotDHof(emb, planeLit(p)) >= 0.0, lit(1 << i)).otherwise(0)
    }.reduce(_ + _)

  /** E3 — brute-force cosine top-k: queries vec_id < 10 against all other
    * vectors; k = 5. The candidate side is broadcast (it's the smaller,
    * re-used side); ranking via per-query window. */
  val extKnnCosine: Q = (s, d) => {
    graft.expressions.FloatVecDot.register(s)
    val e = Tables.embeddings(s, d)
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .filter(col("qid") < 10)
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = broadcast(q).join(c, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .orderBy(col("qid"), col("rn"))
  }

  /** E3b — embedding-cosine near-dup pairs above a threshold (the
    * embedding-space analogue of MinHash near-dup).
    *
    * Implementation is a partition-wise JVM kernel against a broadcast
    * candidate set: interpreted higher-order lambdas cost ~µs per pair,
    * which at N²/2 pairs dominates everything (60 s for 2M pairs at
    * sf0.1); the tight double loop below does the identical arithmetic
    * (same fold order → still bit-exact vs the oracle) ~100× faster. At
    * 100 TB the broadcast side must be a blocked/LSH-bucketed candidate
    * set — ext_ann_lsh shows that join shape; this kernel is the
    * in-bucket comparator. */
  val extEmbedNeardup: Q = (s, d) => {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val all = e.collect().sortBy(_._1)
    val bc = s.sparkContext.broadcast(all)
    val threshold = 0.35
    e.mapPartitions { it =>
      val cand = bc.value
      val norms = cand.map { case (_, v) =>
        var n = 0.0; var k = 0
        while (k < v.length) { n += v(k).toDouble * v(k).toDouble; k += 1 }
        math.sqrt(n)
      }
      it.flatMap { case (ida, va) =>
        var na = 0.0; var k = 0
        while (k < va.length) { na += va(k).toDouble * va(k).toDouble; k += 1 }
        na = math.sqrt(na)
        cand.indices.iterator.flatMap { j =>
          val (idb, vb) = cand(j)
          if (idb <= ida) None
          else {
            var dot = 0.0; var i = 0
            while (i < va.length) { dot += va(i).toDouble * vb(i).toDouble; i += 1 }
            val cos = dot / (na * norms(j))
            if (cos >= threshold) Some((ida, idb, cos)) else None
          }
        }
      }
    }.toDF("a", "b", "cos")
      .orderBy(col("a"), col("b"))
  }

  /** E3c — LSH-bucketed ANN: same-bucket candidates only (the 100 TB
    * shape: equi-join on sig instead of a cross join), top-3 per query. */
  val extAnnLsh: Q = (s, d) => {
    graft.expressions.FloatVecDot.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), lshSig(col("embedding")).as("sig"))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qe"),
                     col("sig").as("qsig")).filter(col("qid") < 10)
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
                     col("sig").as("csig"))
    val scored = broadcast(q)
      .join(c, col("qsig") === col("csig") && col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("qsig").as("bucket"),
              cosine(col("qe"), col("ce")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("qid"), col("rn"))
  }

  /** E3d — IVF-style ANN: a coarse quantizer (nearest of 16 deterministic
    * seed vectors — one assignment pass; a production IVF would Lloyd-
    * iterate the seeds) maps every vector to an inverted list; queries
    * probe only their own list (nprobe=1). Same equi-join-on-bucket shape
    * as LSH but with data-adaptive buckets. All distance math is the
    * exact fold-ordered double arithmetic, so assignments and rankings
    * are oracle-checkable. */
  val extAnnIvf: Q = (s, d) => {
    graft.expressions.FloatVecDot.register(s)
    val e = Tables.embeddings(s, d)
    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("seed_id"), col("embedding").as("se"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("seed_cos").desc, col("seed_id"))
    val assigned = e.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("embedding"), col("seed_id"),
              cosine(col("embedding"), col("se")).as("seed_cos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("seed_id").as("list_id"))
    val q = assigned.select(col("vec_id").as("qid"), col("embedding").as("qe"),
                            col("list_id").as("qlist")).filter(col("qid") < 10)
    val c = assigned.select(col("vec_id").as("cid"), col("embedding").as("ce"),
                            col("list_id").as("clist"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    broadcast(q)
      .join(c, col("qlist") === col("clist") && col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("qlist").as("list_id"),
              cosine(col("qe"), col("ce")).as("cos"))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= 3)
      .orderBy(col("qid"), col("rn"))
  }

  /** One Lloyd iteration refining the IVF seeds: assign → per-list mean →
    * re-normalized centroids (as float arrays, ready for another
    * assignment pass). Library-only (not oracle-bound: the per-dim mean
    * is an order-dependent double sum); SimilaritySpec asserts the
    * refined quantizer tightens within-list cohesion. The DataFrame shape
    * is the distributed k-means step: assignment is a broadcast-join
    * argmin, the update a groupBy mean — both scale-free of N². */
  def lloydRefine(s: SparkSession, d: String): DataFrame = {
    graft.expressions.FloatVecDot.register(s)
    val e = Tables.embeddings(s, d)
    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("seed_id"), col("embedding").as("se"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("seed_cos").desc, col("seed_id"))
    val assigned = e.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("embedding"), col("seed_id"),
              cosine(col("embedding"), col("se")).as("seed_cos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("seed_id").as("list_id"))
    // update step: element-wise mean per list → new centroid (float)
    assigned
      .select(col("list_id"), posexplode(col("embedding")))
      .toDF("list_id", "dim", "v")
      .groupBy(col("list_id"), col("dim"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("list_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
      .select(col("list_id"),
              transform(col("pairs"), p => p.getField("m").cast("float"))
                .as("centroid"))
  }

  val queries: Map[String, Q] = Map(
    "ext_knn_cosine" -> extKnnCosine,
    "ext_embed_neardup" -> extEmbedNeardup,
    "ext_ann_lsh" -> extAnnLsh,
    "ext_ann_ivf" -> extAnnIvf)

  // ---- oracle SQL --------------------------------------------------------

  private def dotSql(a: String, b: String): String =
    s"list_aggregate(list_transform(list_zip($a, $b), " +
      s"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')"

  private def normSql(a: String): String =
    s"sqrt(list_aggregate(list_transform($a, " +
      s"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  private def planeSqlLit(p: Array[Double]): String =
    p.mkString("[", ", ", "]")

  private val sigSql: String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotSql("embedding", planeSqlLit(p))} >= 0.0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    "ext_knn_cosine" ->
      s"""SELECT qid, cid, cos, rn FROM (
         |  SELECT qid, cid, cos, CAST(row_number() OVER (
         |    PARTITION BY qid ORDER BY cos DESC, cid) AS INTEGER) AS rn
         |  FROM (
         |    SELECT q.vec_id AS qid, c.vec_id AS cid,
         |      ${cosSql("q.embedding", "c.embedding")} AS cos
         |    FROM embeddings q JOIN embeddings c
         |      ON q.vec_id < 10 AND c.vec_id <> q.vec_id))
         |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    "ext_embed_neardup" ->
      s"""SELECT a.vec_id AS a, b.vec_id AS b,
         |  ${cosSql("a.embedding", "b.embedding")} AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35
         |ORDER BY a, b""".stripMargin,
    "ext_ann_ivf" ->
      s"""WITH assigned AS (
         |  SELECT vec_id, embedding, seed_id AS list_id FROM (
         |    SELECT e.vec_id, e.embedding, s.vec_id AS seed_id,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${cosSql("e.embedding", "s.embedding")} DESC, s.vec_id) AS rn
         |    FROM embeddings e CROSS JOIN
         |      (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 16) s)
         |  WHERE rn = 1)
         |SELECT qid, cid, list_id, cos, rn FROM (
         |  SELECT qid, cid, list_id, cos, CAST(row_number() OVER (
         |    PARTITION BY qid ORDER BY cos DESC, cid) AS INTEGER) AS rn
         |  FROM (
         |    SELECT q.vec_id AS qid, c.vec_id AS cid, q.list_id,
         |      ${cosSql("q.embedding", "c.embedding")} AS cos
         |    FROM assigned q JOIN assigned c
         |      ON q.list_id = c.list_id AND c.vec_id <> q.vec_id
         |    WHERE q.vec_id < 10))
         |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,
    "ext_ann_lsh" ->
      s"""WITH sigs AS (
         |  SELECT vec_id, embedding, $sigSql AS sig FROM embeddings)
         |SELECT qid, cid, bucket, cos, rn FROM (
         |  SELECT qid, cid, bucket, cos, CAST(row_number() OVER (
         |    PARTITION BY qid ORDER BY cos DESC, cid) AS INTEGER) AS rn
         |  FROM (
         |    SELECT q.vec_id AS qid, c.vec_id AS cid, q.sig AS bucket,
         |      ${cosSql("q.embedding", "c.embedding")} AS cos
         |    FROM sigs q JOIN sigs c
         |      ON q.sig = c.sig AND c.vec_id <> q.vec_id
         |    WHERE q.vec_id < 10))
         |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin)
}
