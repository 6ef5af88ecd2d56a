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

  /** T5 — NUCLEUS (top-p) cutoff per group: the smallest prefix of users,
    * ranked by exact spend, that covers ≥ 90% of each event type's total —
    * the "how concentrated is this segment" report (same math as top-p /
    * nucleus sampling's cumulative-probability cutoff, and the head-mass
    * question behind source-curation decisions: "how few domains account
    * for 90% of tokens?"). Distinct from [[sortLimitTopk]]: the k is not
    * fixed, it is determined by the mass distribution itself.
    *
    * Plan: user-grain hash aggregate (shuffle 1, partial-agg map side)
    * → per-type rank window (shuffle 2, type-partitioned sort) → 5-group
    * rollup. The keep test is pure integer arithmetic on cents: a user is
    * in the nucleus iff the cumulative mass STRICTLY BEFORE them is
    * < 90% of total, i.e. (cum − u)·10 < tot·9 — no float threshold, no
    * rounding grid, identical on both engines. Ties rank (spend desc,
    * user_id asc), so the prefix is deterministic. Overflow envelope:
    * cents·10 stays in BIGINT through ~9·10¹⁷ cents (≈ $9 quadrillion)
    * per type — past any corpus; share_ppm multiplies by 10⁶ only at the
    * 5-row type grain where cents ≲ 10¹² even at 100 TB. */
  val topkNucleus: Q = (s, d) => {
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("ucents").desc, col("user_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("ucents"))
      .withColumn("cum", sum(col("ucents")).over(wRank))
      .withColumn("tot", sum(col("ucents")).over(wTot))
      .withColumn("keep", (col("cum") - col("ucents")) * 10 < col("tot") * 9)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
           sum(when(col("keep"), 1L).otherwise(0L)).as("n_nucleus"),
           sum(when(col("keep"), col("ucents")).otherwise(0L)).as("nc"),
           max(col("tot")).as("tc"))
      .select(col("event_type"), col("n_users"), col("n_nucleus"),
              // zero-mass guard (fuzz seed 525: a type whose cents sum
              // EXACTLY to 0 — all-zero values, or refunds cancelling
              // sales): ANSI div throws where DuckDB's //0 is NULL, so
              // the portable contract is an explicit NULL share. Signs
              // of BOTH operands split (a net-refund type has tc < 0,
              // where div truncates but // floors — the agg_weighted
              // idiom).
              when(col("tc") =!= 0,
                   when(col("nc") < 0, -1L).otherwise(1L) *
                   when(col("tc") < 0, -1L).otherwise(1L) *
                   expr("abs(nc) * 1000000 div abs(tc)"))
                .as("nucleus_share_ppm"),
              (col("nc").cast("double") / 100.0).as("nucleus_spend"),
              (col("tc").cast("double") / 100.0).as("total_spend"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "topk_nucleus" -> topkNucleus,
    "sort_limit_topk" -> sortLimitTopk,
    "sort_multikey" -> sortMultikey,
    "topk_by_abs" -> topkByAbs,
    "union_all_counts" -> unionAllCounts)

  val oracles: Map[String, String] = Map(
    // identical integer program: strict-before cumulative < 90% of total,
    // all in BIGINT cents; ppm is a floor-divide at type grain
    "topk_nucleus" ->
      """WITH u AS (
        |  SELECT event_type, user_id,
        |    SUM(CAST(floor(value * 100) AS BIGINT)) AS ucents
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, ucents,
        |    SUM(ucents) OVER (PARTITION BY event_type
        |      ORDER BY ucents DESC, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(ucents) OVER (PARTITION BY event_type) AS tot
        |  FROM u),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(SUM(CASE WHEN (cum - ucents) * 10 < tot * 9
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_nucleus,
        |    SUM(CASE WHEN (cum - ucents) * 10 < tot * 9
        |      THEN ucents ELSE 0 END) AS nc,
        |    max(tot) AS tc
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_users, n_nucleus,
        |  CASE WHEN tc <> 0 THEN
        |    CAST((CASE WHEN nc < 0 THEN -1 ELSE 1 END)
        |         * (CASE WHEN tc < 0 THEN -1 ELSE 1 END)
        |         * ((abs(nc) * 1000000) // abs(tc)) AS BIGINT)
        |  END AS nucleus_share_ppm,
        |  CAST(nc AS DOUBLE) / 100.0 AS nucleus_spend,
        |  CAST(tc AS DOUBLE) / 100.0 AS total_spend
        |FROM g ORDER BY 1""".stripMargin,
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
