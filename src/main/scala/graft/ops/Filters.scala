package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Projection / filter / predicate operators (SURVEY.md §2.2, P1–P6 + F7).
  *
  * Mirrors the reference's predicate surface: NULL filters
  * (`/root/reference/sql/load_gtfs_data.sql:93,137-138`), BETWEEN/IN
  * (`sql/fact_dim_tables.sql:201-213`), sliding date windows
  * (`sql/ml_feature_engineering.sql:261`), alias+ROUND projections
  * (`sql/analysis_queries.sql:36-49`), CASE binning
  * (`sql/fact_dim_tables.sql:335-340`) and COALESCE defaults
  * (`sql/ml_feature_engineering.sql:192-213`).
  *
  * Scale notes: all of these are narrow (no shuffle). The predicates and
  * column projections push into the parquet scan — `.explain("formatted")`
  * shows them under PushedFilters/ReadSchema, so at 100 TB the scan skips
  * row groups via min/max stats and reads only referenced columns. Date
  * literals are pinned (never `current_date()`) so plans are deterministic
  * and partition-prunable.
  */
object Filters {

  /** P1 — IS NULL / IS NOT NULL predicates. */
  val filterNulls: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("value").isNotNull && col("props").isNotNull &&
              col("event_type").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** P2 — BETWEEN + IN predicates. */
  val filterRangeIn: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity").between(10d, 20d) &&
              col("l_returnflag").isin("A", "R"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_returnflag"))
      // (l_orderkey, l_linenumber) is NOT unique in this synthetic data —
      // total ordering over all output columns keeps the dump deterministic
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
               col("l_returnflag"))

  /** P3 — sliding time-window predicate (pinned literal in place of
    * `CURRENT_DATE - INTERVAL '7 days'` for determinism — SURVEY §5). */
  val filterTimeWindow: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("ts") >= lit("2024-01-24 00:00:00").cast("timestamp"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("day"))

  /** P4 — projection with aliasing + presentation ROUND. */
  val projectRenameRound: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderpriority").as("priority"),
        // decimal (not double) arithmetic: round(double*1.1, 2) drifts by a
        // cent between engines on half-way binary expansions; decimal × is
        // exact and rounds identically in both
        round(col("o_totalprice").cast("decimal(18,2)") *
              lit(1.1).cast("decimal(3,1)"), 2).cast("double").as("taxed_price"))
      .orderBy(col("o_orderkey"))

  /** P5 — CASE-based categorical binning; bin edges exactly mirror the
    * reference's delay categories (`BETWEEN 1 AND 5` form,
    * `fact_dim_tables.sql:335-340`). */
  val caseBinning: Q = (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("qty_bin",
        when(col("l_quantity").between(1d, 5d), "1-5")
          .when(col("l_quantity").between(6d, 15d), "6-15")
          .when(col("l_quantity").between(16d, 30d), "16-30")
          .otherwise("30+"))
      .groupBy(col("qty_bin"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("qty_bin"))

  /** P6 — COALESCE default-fill (weather-default shape,
    * `ml_feature_engineering.sql:192-213`). */
  val nullDefaults: Q = (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        coalesce(col("c_acctbal"), lit(0.0)).as("acctbal_filled"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment_filled"))
      .orderBy(col("c_custkey"))

  /** F7 — CASE WHEN / COALESCE scalar conditionals (status description
    * mapping shape, `fact_dim_tables.sql:255-265`). */
  val fnConditional: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "Fulfilled")
          .when(col("o_orderstatus") === "O", "Open")
          .when(col("o_orderstatus") === "P", "Pending")
          .otherwise("Unknown").as("status_desc"),
        when(col("o_totalprice") >= 200000d, "high")
          .when(col("o_totalprice") >= 50000d, "mid")
          .otherwise("low").as("price_band"))
      .orderBy(col("o_orderkey"))

  /** P7 — pattern-predicate surface (LIKE / prefix / suffix / regexp):
    * the reference's SQL never reaches for LIKE, but no relational
    * surface is complete without it. Wildcard LIKE, anchored prefix and
    * suffix (which Catalyst compiles to StartsWith/EndsWith — cheaper
    * than a regex), and an RLIKE alternation. Pure map stage; at scale
    * anchored-prefix predicates can additionally prune min/max file
    * stats where a regex cannot. */
  val filterLikePatterns: Q = (s, d) =>
    graft.Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_name").like("%bolt%").as("has_bolt"),
        col("p_name").startsWith("small").as("is_small"),
        col("p_name").endsWith("gear").as("is_gear"),
        col("p_name").rlike("^(red|blue) ").as("primary_color"))
      .orderBy(col("p_partkey"))

  val queries: Map[String, Q] = Map(
    "filter_like_patterns" -> filterLikePatterns,
    "filter_nulls" -> filterNulls,
    "filter_range_in" -> filterRangeIn,
    "filter_time_window" -> filterTimeWindow,
    "project_rename_round" -> projectRenameRound,
    "case_binning" -> caseBinning,
    "null_defaults" -> nullDefaults,
    "fn_conditional" -> fnConditional)

  val oracles: Map[String, String] = Map(
    "filter_like_patterns" ->
      """SELECT p_partkey, p_name, p_brand,
        |  p_name LIKE '%bolt%' AS has_bolt,
        |  p_name LIKE 'small%' AS is_small,
        |  p_name LIKE '%gear' AS is_gear,
        |  regexp_matches(p_name, '^(red|blue) ') AS primary_color
        |FROM part ORDER BY p_partkey""".stripMargin,
    "filter_nulls" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE value IS NOT NULL AND props IS NOT NULL AND event_type IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "filter_range_in" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A', 'R')
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin,
    "filter_time_window" ->
      """SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
        |FROM events WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "project_rename_round" ->
      """SELECT o_orderkey, o_orderpriority AS priority,
        |  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1)), 2) AS DOUBLE) AS taxed_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "case_binning" ->
      s"""SELECT CASE WHEN l_quantity BETWEEN 1 AND 5 THEN '1-5'
         |            WHEN l_quantity BETWEEN 6 AND 15 THEN '6-15'
         |            WHEN l_quantity BETWEEN 16 AND 30 THEN '16-30'
         |            ELSE '30+' END AS qty_bin,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "null_defaults" ->
      """SELECT c_custkey, coalesce(c_acctbal, 0.0) AS acctbal_filled,
        |  coalesce(c_mktsegment, 'UNKNOWN') AS segment_filled
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_conditional" ->
      """SELECT o_orderkey,
        |  CASE o_orderstatus WHEN 'F' THEN 'Fulfilled' WHEN 'O' THEN 'Open'
        |       WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS status_desc,
        |  CASE WHEN o_totalprice >= 200000 THEN 'high'
        |       WHEN o_totalprice >= 50000 THEN 'mid'
        |       ELSE 'low' END AS price_band
        |FROM orders ORDER BY o_orderkey""".stripMargin)
}
