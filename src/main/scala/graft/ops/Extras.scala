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

  val queries: Map[String, Q] = Map(
    "win_first_last" -> winFirstLast,
    "set_intersect_except" -> setIntersectExcept,
    "agg_pivot" -> aggPivot,
    "fn_string_funcs" -> fnStringFuncs)

  val oracles: Map[String, String] = Map(
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
