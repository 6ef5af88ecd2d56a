package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage beyond the reference's literal surface, for "a user of the
  * reference could switch" completeness: first/last/nth window values,
  * INTERSECT/EXCEPT set semantics (SURVEY §2.7 notes them unused by the
  * reference but natural for dedup diffing), and the common string
  * functions a SQL user expects.
  */
object Extras {

  /** first_value/last_value/nth_value over per-customer order history. */
  val winFirstLast: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** INTERSECT/EXCEPT: customer keys active in both/only-one of two
    * price bands (set semantics, distinct rows). */
  val setIntersectExcept: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val big = o.filter(col("o_totalprice") > 200000d).select(col("o_custkey")).distinct()
    val early = o.filter(year(col("o_orderdate")) <= 1997).select(col("o_custkey")).distinct()
    val both = big.intersect(early).withColumn("set_kind", lit("both"))
    val bigOnly = big.except(early).withColumn("set_kind", lit("big_only"))
    both.union(bigOnly)
      .orderBy(col("set_kind"), col("o_custkey"))
  }

  /** INTERSECT ALL / EXCEPT ALL — BAG semantics (multiplicity
    * min(m,n) / m−n), the half of the set-op surface
    * [[setIntersectExcept]]'s DISTINCT variants don't pin. The probe
    * multiset is (o_custkey, o_orderpriority) pairs in two overlapping
    * price bands, where repeated pairs are common, so the bag/set
    * difference is exercised for real. Spark plans these as aggregate +
    * generate (no row-by-row matching); counts per kind keep the output
    * bounded. */
  val setOpsAll: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val hi = o.filter(col("o_totalprice") > 150000d)
      .select(col("o_custkey"), col("o_orderpriority"))
    val early = o.filter(year(col("o_orderdate")) <= 1997)
      .select(col("o_custkey"), col("o_orderpriority"))
    val inter = hi.intersectAll(early).withColumn("set_kind", lit("intersect_all"))
    val exc = hi.exceptAll(early).withColumn("set_kind", lit("except_all"))
    inter.union(exc)
      .groupBy(col("set_kind"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
           countDistinct(col("o_custkey")).as("n_custs"))
      .orderBy(col("set_kind"), col("o_orderpriority"))
  }

  /** Common string-function surface with cross-engine parity. */
  val fnStringFuncs: Q = (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("key_padded"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
        concat_ws("|", col("c_mktsegment"), col("c_custkey").cast("string"))
          .as("seg_key"),
        length(col("c_name")).as("name_len"),
        instr(col("c_name"), "5").as("pos_five"),
        reverse(col("c_mktsegment")).as("seg_rev"))
      .orderBy(col("c_custkey"))

  /** PIVOT (cross-tab): quantity by return flag × line status with pinned
    * pivot values (no extra distinct-values job; also what keeps the
    * output schema static for the oracle). Decimal sums cast double per
    * the exactness discipline. */
  val aggPivot: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
      .orderBy(col("l_returnflag"))

  /** Time-series resample to an hourly grid + forward fill — the
    * gap-filling shape every sensor/telemetry pipeline needs (the
    * reference's hourly weather series implicitly assumes a dense grid;
    * this makes sparse→dense explicit). Per event_type: a dense hour
    * series over the corpus span (cross join of the distinct-types
    * frame with ONE sequence-exploded row — both sides tiny), left join
    * of per-hour aggregates, then `last(value, ignoreNulls)` over an
    * unbounded-preceding window per type to carry the last observed
    * hourly average across gap hours.
    *
    * Scale shape: grid rows = types × hours (grows with time span, not
    * event volume); the heavy side aggregates BEFORE the grid join, so
    * events shuffle once into (type, hour) partials; the ffill window
    * partitions by type over already-tiny grid rows. Hour averages are
    * decimal-sum / count so the carried values are bit-identical across
    * engines. */
  val fnResampleFfill: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
              col("value"))
    val hourly = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n_events"),
           dsum(col("value")).as("sv"))
      .select(col("event_type"), col("h"), col("n_events"),
              (col("sv").cast("double") / col("n_events")).as("v"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(
        ev.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
          .select(explode(sequence(col("mn"), col("mx"),
                                   expr("INTERVAL 1 HOUR"))).as("h")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"),
              // date_trunc yields TZ TimestampType; re-badge NTZ at the
              // edge so the parquet dump matches the oracle's naive ts
              col("h").cast("timestamp_ntz").as("hour_start"),
              coalesce(col("n_events"), lit(0L)).as("n_events"),
              last(col("v"), ignoreNulls = true).over(w).as("value_ffill"))
      .orderBy(col("event_type"), col("hour_start"))
  }

  /** Bitwise-operator surface (masks, flags, shard routing — the bit
    * arithmetic [[graft.etl.ZOrder]] builds on): AND/OR/XOR and shifts
    * over event_id, all exact integer ops on both engines. */
  val fnBitwise: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
              col("event_id").bitwiseAND(lit(255L)).as("masked"),
              col("event_id").bitwiseOR(lit(4096L)).as("flagged"),
              col("event_id").bitwiseXOR(lit(170L)).as("xored"),
              shiftleft(col("event_id"), 3).as("shl3"),
              shiftright(col("event_id"), 4).as("shr4"))
      .orderBy(col("event_id"))

  /** Content-hash function surface (md5 / sha256) — the fingerprint
    * primitives the dedup stack builds on, exposed as a checked entry:
    * both engines emit lowercase hex over the UTF-8 bytes. */
  val fnHashFuncs: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
              md5(col("text").cast("binary")).as("md5_hex"),
              sha2(col("text").cast("binary"), 256).as("sha256_hex"),
              length(col("text")).as("n_chars"))
      .orderBy(col("doc_id"))

  /** Edit-distance surface: Levenshtein between each customer name and
    * its segment-ordered predecessor — the fuzzy-matching primitive for
    * entity resolution, computed exactly (integer DP) on both engines.
    * Composes with the window surface (lag supplies the pair). */
  val fnEditDistance: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_name"),
              lag(col("c_name"), 1).over(w).as("prev_name"))
      .select(col("c_custkey"), col("c_mktsegment"),
              levenshtein(col("c_name"), coalesce(col("prev_name"), lit("")))
                .as("edit_dist"))
      .orderBy(col("c_custkey"))
  }

  /** UNPIVOT surface — the wide→long melt that closes the reshape pair
    * with [[aggPivot]]: a per-flag wide aggregate row (sum_qty,
    * sum_price, n) melted into (metric, value) rows via `stack`, the
    * Catalyst generator behind SQL UNPIVOT. All three measures are
    * exact (decimal sums / counts) cast to one double column — the melt
    * itself moves no data and runs after the aggregate, so the wide
    * frame is group-cardinality-bounded at any scale. */
  val fnUnpivot: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
           dsum(col("l_extendedprice")).as("sum_price"),
           count(lit(1)).cast("double").as("n"))
      .select(col("l_returnflag"),
              expr("""stack(3, 'sum_qty', sum_qty,
                     |         'sum_price', sum_price,
                     |         'n', n) AS (metric, value)""".stripMargin))
      .orderBy(col("l_returnflag"), col("metric"))

  /** Multi-aggregate PIVOT (the two-measure variant of [[aggPivot]]):
    * one pivot producing BOTH a count and an exact money sum per pivot
    * value — `groupBy.pivot(values).agg(n, qty)` names columns
    * `<value>_<alias>`, the wide shape BI layers expect. Missing
    * (group, pivot) cells are coalesced to 0/0.0 on BOTH engines so a
    * sparse combination cannot hash-diverge (Spark's pivot yields NULL
    * for an empty cell; the oracle's conditional aggregation yields 0).
    * Same scale shape as any grouped aggregate: the pivot values are an
    * enum (2 line statuses), so the row explosion is bounded. */
  val aggPivotMulti: Q = (s, d) => {
    val p = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
    p.select(col("l_returnflag"),
        coalesce(col("F_n"), lit(0L)).as("f_n"),
        coalesce(col("F_qty"), lit(0.0)).as("f_qty"),
        coalesce(col("O_n"), lit(0L)).as("o_n"),
        coalesce(col("O_qty"), lit(0.0)).as("o_qty"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, Q] = Map(
    "agg_pivot_multi" -> aggPivotMulti,
    "fn_unpivot" -> fnUnpivot,
    "fn_edit_distance" -> fnEditDistance,
    "fn_hash_funcs" -> fnHashFuncs,
    "fn_bitwise" -> fnBitwise,
    "fn_resample_ffill" -> fnResampleFfill,
    "win_first_last" -> winFirstLast,
    "set_intersect_except" -> setIntersectExcept,
    "set_ops_all" -> setOpsAll,
    "agg_pivot" -> aggPivot,
    "fn_string_funcs" -> fnStringFuncs)

  val oracles: Map[String, String] = Map(
    "agg_pivot_multi" ->
      s"""SELECT l_returnflag,
         |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS f_n,
         |  coalesce(CAST(SUM(CASE WHEN l_linestatus = 'F'
         |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
         |    AS f_qty,
         |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS o_n,
         |  coalesce(CAST(SUM(CASE WHEN l_linestatus = 'O'
         |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
         |    AS o_qty
         |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "fn_unpivot" ->
      s"""WITH w AS (
         |  SELECT l_returnflag,
         |    ${dsumSql("l_quantity")} AS sum_qty,
         |    ${dsumSql("l_extendedprice")} AS sum_price,
         |    CAST(count(*) AS DOUBLE) AS n
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
         |UNION ALL
         |SELECT l_returnflag, 'sum_price', sum_price FROM w
         |UNION ALL
         |SELECT l_returnflag, 'n', n FROM w
         |ORDER BY l_returnflag, metric""".stripMargin,
    "fn_edit_distance" ->
      """WITH p AS (
        |  SELECT c_custkey, c_mktsegment, c_name,
        |    lag(c_name) OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_custkey) AS prev_name
        |  FROM customer)
        |SELECT c_custkey, c_mktsegment,
        |  CAST(levenshtein(c_name, coalesce(prev_name, '')) AS INTEGER)
        |    AS edit_dist
        |FROM p ORDER BY c_custkey""".stripMargin,
    "fn_hash_funcs" ->
      """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex,
        |  CAST(length(text) AS INTEGER) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_bitwise" ->
      """SELECT event_id,
        |  event_id & 255 AS masked,
        |  event_id | 4096 AS flagged,
        |  xor(event_id, 170) AS xored,
        |  event_id << 3 AS shl3,
        |  event_id >> 4 AS shr4
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_resample_ffill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT min(date_trunc('hour', ts)) AS mn,
        |         max(date_trunc('hour', ts)) AS mx
        |  FROM events),
        |grid AS (
        |  SELECT t.event_type, g.h
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
        |              FROM bounds) g)
        |SELECT grid.event_type, grid.h AS hour_start,
        |  COALESCE(n_events, CAST(0 AS BIGINT)) AS n_events,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY grid.event_type
        |    ORDER BY grid.h ROWS UNBOUNDED PRECEDING) AS value_ffill
        |FROM grid LEFT JOIN hourly ON grid.event_type = hourly.event_type
        |  AND grid.h = hourly.h
        |ORDER BY 1, 2""".stripMargin,
    // the portable spelling of PIVOT: conditional aggregation
    "agg_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        |  CAST(sum(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O"
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "win_first_last" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "set_ops_all" ->
      """WITH hi AS (
        |  SELECT o_custkey, o_orderpriority FROM orders
        |  WHERE o_totalprice > 150000),
        |early AS (
        |  SELECT o_custkey, o_orderpriority FROM orders
        |  WHERE EXTRACT(YEAR FROM o_orderdate) <= 1997),
        |u AS (
        |  SELECT *, 'intersect_all' AS set_kind FROM
        |    (SELECT * FROM hi INTERSECT ALL SELECT * FROM early)
        |  UNION ALL
        |  SELECT *, 'except_all' FROM
        |    (SELECT * FROM hi EXCEPT ALL SELECT * FROM early))
        |SELECT set_kind, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "set_intersect_except" ->
      """WITH big AS (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000),
        |early AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE EXTRACT(YEAR FROM o_orderdate) <= 1997)
        |SELECT o_custkey, 'big_only' AS set_kind FROM
        |  (SELECT o_custkey FROM big EXCEPT SELECT o_custkey FROM early)
        |UNION ALL
        |SELECT o_custkey, 'both' FROM
        |  (SELECT o_custkey FROM big INTERSECT SELECT o_custkey FROM early)
        |ORDER BY set_kind, o_custkey""".stripMargin,
    "fn_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS seg_upper,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
        |  substr(c_name, 1, 8) AS name_prefix,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        |  concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  CAST(strpos(c_name, '5') AS INTEGER) AS pos_five,
        |  reverse(c_mktsegment) AS seg_rev
        |FROM customer ORDER BY c_custkey""".stripMargin)
}
