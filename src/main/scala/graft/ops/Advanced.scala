package graft.ops

import graft.Tables
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Advanced surface demonstrations (SURVEY.md §2.12, §2.4 notes):
  * a typed `Aggregator` UDAF (vector centroid per label — the custom-
  * aggregation-state shape a native engine would hand-roll), a
  * ROLLUP layered aggregate (the reference builds its layered aggregate
  * facts manually; rollup is the declarative equivalent), and the
  * seeded random sample (T3, `train_delay_model.py:123-124`).
  *
  * Scale notes: the Aggregator carries a fixed-width (dim-sized) buffer
  * with map-side partial merge — shuffle volume is labels × partitions ×
  * dim doubles, independent of row count. ROLLUP multiplies group keys,
  * not input rows. `sample(fraction, seed)` is a per-partition Bernoulli
  * scan — no shuffle at all, unlike the reference's ORDER BY RANDOM()
  * which sorts the whole table to take 100k rows.
  */
object Advanced {

  /** Element-wise (sum, count) accumulator → mean vector. */
  class VecCentroid(dim: Int)
      extends Aggregator[Seq[Float], (Array[Double], Long), Array[Double]] {
    override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)
    override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
      var i = 0
      while (i < dim && i < v.length) { b._1(i) += v(i).toDouble; i += 1 }
      (b._1, b._2 + 1)
    }
    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    override def finish(r: (Array[Double], Long)): Array[Double] =
      r._1.map(_ / r._2)
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
        Encoders.scalaLong)
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** UDAF demo — per-label embedding centroid, exploded to (label, dim,
    * value) rows so DuckDB can oracle-check it (sum order across rows is
    * engine-dependent → round(6) absorbs the low bits). */
  val extVecCentroid: Q = (s, d) => {
    val centroid = udaf(new VecCentroid(64),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    Tables.embeddings(s, d)
      .select(col("label"), col("embedding"))
      .groupBy(col("label"))
      .agg(centroid(col("embedding")).as("centroid"))
      .select(col("label"), posexplode(col("centroid")))
      .toDF("label", "dim", "v")
      .select(col("label"), col("dim"), round(col("v"), 6).as("v"))
      .orderBy(col("label"), col("dim"))
  }

  /** ROLLUP layered aggregate (the declarative form of the reference's
    * manually-layered aggregate fact tables, `fact_dim_tables.sql:347-380`). */
  val aggRollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)

  /** CUBE with grouping_id: all four grouping combinations in one pass
    * (rollup's sibling; gid disambiguates subtotal rows from genuine
    * NULLs, the classic cube-consumer trap). */
  val aggCube: Q = (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("gid"),
           count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first, col("gid"))

  /** T3 — seeded Bernoulli sample (deterministic per seed; no SQL oracle —
    * Spark's and DuckDB's PRNGs differ — so it is rows-only checked here
    * and property-tested for seed-stability in AdvancedSpec). */
  val sampleSeeded: Q = (s, d) =>
    Tables.orders(s, d)
      .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** Salted two-phase aggregation — the skew-mitigation pattern for hot
    * keys at 100 TB (SURVEY scale notes / AQE-skew alternative): phase 1
    * aggregates on (key, salt) spreading a hot key over N reducers;
    * phase 2 merges the N partials per key. Result is identical to a
    * direct groupBy (decimal sums are order-independent), so the plain
    * GROUP BY is the oracle. */
  val aggSalted: Q = (s, d) => {
    val salted = Tables.events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
           sum(col("value").cast("decimal(18,2)")).as("psum"))
    salted.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"),
           sum(col("psum")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Salted JOIN — the manual hot-key mitigation for joins (the sibling
    * of [[aggSalted]]'s two-phase aggregate): `event_type` has 5 values,
    * so a plain equi-join funnels ~20% of a 100 TB fact through ONE
    * reducer. Salting replicates the (tiny) dim side SALT times and
    * routes each fact row to a random-but-deterministic replica
    * (`event_id % SALT`), so the hot key fans out over SALT reducers.
    * Result provably equals the unsalted join — which is exactly the
    * oracle SQL. AQE's skew split handles this adaptively when stats
    * catch it; explicit salting is the belt-and-braces for keys KNOWN
    * to be degenerate (here: a 5-value type column). */
  val joinSaltedSkew: Q = (s, d) => {
    val salt = 8
    val ev = Tables.events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(salt)))
    // dim: per-type reference stats (derived here; a real dim in prod)
    val dim = Tables.events(s, d)
      .groupBy(col("event_type").as("dt"))
      .agg(min(col("value")).as("type_min"))
      .crossJoin(s.range(0, salt).select(col("id").as("dsalt")))
    ev.join(dim,
        col("event_type") === col("dt") && col("salt") === col("dsalt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           max(col("value") - col("type_min")).as("max_spread"))
      .orderBy(col("event_type"))
  }

  /** Approximate-aggregate variants — the 100 TB defaults where exactness
    * isn't required: HLL distinct counts (one pass, fixed memory — no
    * exact-distinct double shuffle) and quantile sketches (no per-group
    * sort). No SQL oracle (sketch algorithms are engine-specific);
    * AdvancedSpec bounds them against the exact values. */
  val aggApprox: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        approx_count_distinct(col("o_custkey")).as("approx_custs"),
        countDistinct(col("o_custkey")).as("exact_custs"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx_median"))
      .orderBy(col("o_orderpriority"))

  /** Exact distinct counting via mergeable RoaringBitmap-style partials
    * (`bitmap_construct_agg` over `bitmap_bucket_number`/
    * `bitmap_bit_position`): the 100 TB answer to "exact COUNT(DISTINCT)
    * without the two-shuffle expand" that [[Aggregates.aggCountDistinct]]'s
    * scaladoc flags. Each (group, bucket) partial is a ≤4 KB bitmap built
    * map-side; distinct users per event type = Σ bitmap_count over
    * buckets, and — the point — the SAME partials re-aggregate to the
    * all-types total via `bitmap_or_agg` without rescanning the base
    * table. That is the mergeable-sketch contract (think HLL) but exact:
    * partials are unionable, so a daily materialization rolls up to
    * weekly/monthly exactly, the pattern the reference's layered
    * aggregate facts (`/root/reference/sql/performance_optimization.sql`)
    * rebuild from scratch instead. Shuffle volume is groups × buckets ×
    * 4 KB, independent of row count. Oracle: plain COUNT(DISTINCT) —
    * bitmaps are an execution strategy, not a semantics change. */
  val aggBitmapDistinct: Q = (s, d) => {
    val partials = Tables.events(s, d)
      .select(col("event_type"), col("user_id"))
      .groupBy(col("event_type"),
               expr("bitmap_bucket_number(user_id)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
        .as("bm"))
    val perType = partials
      .groupBy(col("event_type"))
      .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
    val total = partials
      .groupBy(col("bkt"))
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      // coalesce(…, 0): this is a GLOBAL aggregate, so an EMPTY events
      // table still emits the __all__ row — SUM over zero buckets is
      // NULL where the oracle's COUNT(DISTINCT) of nothing is 0 (fuzz
      // seed 702, empty-table axis)
      .agg(coalesce(sum(expr("bitmap_count(bm)")), lit(0L)).as("n_users"))
      .select(lit("__all__").as("event_type"), col("n_users"))
    perType.unionByName(total).orderBy(col("event_type"))
  }

  /** E62 — Z-order layout audit: Morton-interleave two 8-bit dimensions
    * (user bucket × value bucket) with [[graft.etl.ZOrder.zvalue]]'s
    * mask ladder, cut the curve into 64 equal z-ranges (stand-ins for
    * output files), and report each block's (x, y) bounding box — the
    * numbers that PROVE two-dimensional locality: every block's box is
    * a small square (≈32×32 for 8-bit dims), so a predicate on EITHER
    * dimension prunes most blocks on min/max stats alone, which is the
    * whole case for ZORDER BY at 100 TB (vs a single-column sort whose
    * trailing-dimension spans stay ~full-range). Pure bit arithmetic,
    * bit-identical in DuckDB; one hash aggregate over 64 groups. */
  val extZorderAudit: Q = (s, d) => {
    val x = pmod(col("user_id"), lit(256L))
    val y = pmod(floor(col("value") * 100).cast("long"), lit(256L))
    Tables.events(s, d)
      .select(x.as("x"), y.as("y"),
              graft.etl.ZOrder.zvalue(pmod(col("user_id"), lit(256L)),
                pmod(floor(col("value") * 100).cast("long"), lit(256L)))
                .as("z"))
      .select(expr("z div 1024").as("block"), col("x"), col("y"))
      .groupBy(col("block"))
      .agg(count(lit(1)).as("n"),
           min(col("x")).as("x_min"), max(col("x")).as("x_max"),
           min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .withColumn("x_span", col("x_max") - col("x_min"))
      .withColumn("y_span", col("y_max") - col("y_min"))
      .orderBy(col("block"))
  }

  val queries: Map[String, Q] = Map(
    "ext_zorder_audit" -> extZorderAudit,
    "agg_bitmap_distinct" -> aggBitmapDistinct,
    "ext_vec_centroid" -> extVecCentroid,
    "agg_rollup" -> aggRollup,
    "agg_cube" -> aggCube,
    "agg_salted" -> aggSalted,
    "join_salted_skew" -> joinSaltedSkew,
    "agg_approx" -> aggApprox,
    "sample_seeded" -> sampleSeeded)

  // DuckDB replay of ZOrder.zvalue's mask ladder (pure bit arithmetic)
  private def spreadSql(c: String): String = {
    val c0 = s"($c & 65535)"
    val c1 = s"(($c0 | ($c0 << 8)) & 16711935)"
    val c2 = s"(($c1 | ($c1 << 4)) & 252645135)"
    val c3 = s"(($c2 | ($c2 << 2)) & 858993459)"
    s"(($c3 | ($c3 << 1)) & 1431655765)"
  }

  val oracles: Map[String, String] = Map(
    "ext_zorder_audit" ->
      s"""WITH b AS (
         |  SELECT (user_id % 256) AS x,
         |    (((CAST(floor(value * 100) AS BIGINT) % 256) + 256) % 256) AS y
         |  FROM events),
         |z AS (
         |  SELECT x, y,
         |    (${spreadSql("x")} | (${spreadSql("y")} << 1)) // 1024 AS block
         |  FROM b)
         |SELECT block, CAST(count(*) AS BIGINT) AS n,
         |  min(x) AS x_min, max(x) AS x_max,
         |  min(y) AS y_min, max(y) AS y_max,
         |  max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_bitmap_distinct" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT '__all__', CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |FROM events
        |ORDER BY event_type""".stripMargin,
    "ext_vec_centroid" ->
      """WITH ex AS (
        |  SELECT label, unnest(embedding) AS v,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim
        |  FROM embeddings)
        |SELECT label, dim,
        |  round(SUM(CAST(v AS DOUBLE)) / count(*), 6) AS v
        |FROM ex GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_salted" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the salted join equals the plain per-type join/aggregate
    "join_salted_skew" ->
      """WITH dim AS (SELECT event_type, min(value) AS type_min
        |             FROM events GROUP BY 1)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  max(e.value - d.type_min) AS max_spread
        |FROM events e JOIN dim d ON e.event_type = d.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, gid""".stripMargin)
}
