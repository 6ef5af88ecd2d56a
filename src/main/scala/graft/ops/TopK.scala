package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Sort / limit / top-k operators + set ops (SURVEY.md §2.6–§2.7).
  *
  * The reference's `ORDER BY ... LIMIT k` rankings
  * (`/root/reference/sql/analysis_queries.sql:48-50,129-130`), multi-key
  * mixed-direction sorts with NULLS LAST (`analysis_queries.sql:49,367`),
  * nsmallest-by-abs-error (`predict_delays.py:176-183`) and the UNION ALL
  * count-reconciliation report (`sql/load_gtfs_data.sql:244-267`).
  *
  * Scale notes: `orderBy(...).limit(k)` compiles to `TakeOrderedAndProject`
  * — each task keeps a k-row heap and the driver merges, so no global sort
  * materializes at any scale. The full multi-key sort (T2) is a genuine
  * range-partitioned global sort — that one DOES cost a shuffle and is kept
  * limited. UNION ALL of per-table counts unions 1-row aggregates: trivial
  * everywhere.
  */
object TopK {

  /** T1 — top-k by aggregate (top-20 spenders). */
  val sortLimitTopk: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total_spent"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("total_spent").desc, col("o_custkey"))
      .limit(20)

  /** T2 — multi-key mixed-direction sort with NULLS LAST. */
  val sortMultikey: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
              year(col("o_orderdate")).as("order_year"), col("o_totalprice"))
      .orderBy(col("order_year").desc, col("o_orderpriority").asc_nulls_last,
               col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** T4 — top-k by absolute distance (best/worst-prediction shape). */
  val topkByAbs: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"), col("value"),
              round(abs(col("value") - 100.0), 2).as("dist"))
      .orderBy(col("dist"), col("event_id"))
      .limit(10)

  /** U1 — UNION ALL count-reconciliation across all ten tables. */
  val unionAllCounts: Q = (s, d) =>
    Tables.allNames.map { name =>
      Tables.table(s, d, name).agg(count(lit(1)).as("n_rows"))
        .select(lit(name).as("tbl"), col("n_rows"))
    }.reduce(_ union _).orderBy(col("tbl"))

  val queries: Map[String, Q] = Map(
    "sort_limit_topk" -> sortLimitTopk,
    "sort_multikey" -> sortMultikey,
    "topk_by_abs" -> topkByAbs,
    "union_all_counts" -> unionAllCounts)

  val oracles: Map[String, String] = Map(
    "sort_limit_topk" ->
      s"""SELECT o_custkey, ${dsumSql("o_totalprice")} AS total_spent,
         |  CAST(count(*) AS BIGINT) AS n_orders
         |FROM orders GROUP BY 1
         |ORDER BY total_spent DESC, o_custkey LIMIT 20""".stripMargin,
    "sort_multikey" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
        |  o_totalprice
        |FROM orders
        |ORDER BY order_year DESC, o_orderpriority ASC NULLS LAST,
        |  o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "topk_by_abs" ->
      """SELECT event_id, value, round(abs(value - 100.0), 2) AS dist
        |FROM events ORDER BY dist, event_id LIMIT 10""".stripMargin,
    "union_all_counts" ->
      ("""SELECT 'region' AS tbl, CAST(count(*) AS BIGINT) AS n_rows FROM region"""
        + Seq("nation", "customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings")
          .map(t => s"\nUNION ALL SELECT '$t', CAST(count(*) AS BIGINT) FROM $t")
          .mkString
        + "\nORDER BY tbl"))
}
