package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Composed data-quality + corpus-curation pipelines.
  *
  * `dq_report` re-expresses the reference's inline data-quality
  * assertions (`/root/reference/sql/load_gtfs_data.sql:86-114`: null
  * checks, orphan checks, duplicate-PK checks) over the testdata tables —
  * the operational form of SURVEY §5's "correctness practice".
  *
  * `ext_dedup_pipeline` composes the curation flow a training-data
  * pipeline actually runs: exact-dup removal → near-dup candidate scoring
  * (unigram Jaccard, source-blocked) → drop later near-dups → per-source
  * survival report. Every stage is relational, so the whole pipeline is
  * one Catalyst plan and DuckDB can oracle it end-to-end.
  */
object Quality {

  /** Reference-shaped DQ report: one row per check, count of violations. */
  val dqReport: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val checks = Seq(
      ("null_qty_lineitems",
        li.filter(col("l_quantity").isNull || col("l_extendedprice").isNull)),
      ("orphan_lineitems",
        li.join(o.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")),
      ("orphan_orders",
        o.join(c.select("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left_anti")),
      ("dup_order_pk",
        o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)),
      ("negative_prices", li.filter(col("l_extendedprice") < 0)))
    checks.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_bad")).select(lit(name).as("check_name"), col("n_bad"))
    }.reduce(_ union _).orderBy(col("check_name"))
  }

  /** Curation pipeline: survivors per source after exact + near dedup. */
  val extDedupPipeline: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // stage 1: exact dedup — keep min doc_id per text AND that row's
    // source (min_by, not first(): exact duplicates can span sources, and
    // first() is partition-order nondeterministic)
    val exact = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"),
           min_by(col("source"), col("doc_id")).as("source"))
    // stage 2: near-dup candidates among survivors (unigram jaccard >= 0.9,
    // blocked by source) — drop the LATER doc of each pair. Pair scoring
    // delegates to Dedup.jaccardPairs (adaptive bitmask/postings
    // strategy); the vocabulary probe runs on the RAW table scan — a
    // superset of the survivors' vocabulary with a cheap lineage — so the
    // exact-dedup shuffle is not re-executed for the probe jobs
    val dropped = Dedup.jaccardPairs(
        exact.select(col("doc_id"), col("source"),
          array_distinct(split(lower(col("text")), " ")).as("toks")),
        0.9,
        vocabProbe = Some(docs.select(col("doc_id"),
          split(lower(col("text")), " ").as("toks"))))
      .select(col("d2").as("doc_id")).distinct()
    val kept = exact.join(dropped, Seq("doc_id"), "left_anti")
    kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))
      .join(exact.groupBy(col("source")).agg(count(lit(1)).as("n_after_exact")),
            Seq("source"))
      .select(col("source"), col("n_after_exact"), col("n_kept"),
              (col("n_after_exact") - col("n_kept")).as("n_near_dups_removed"))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    "dq_report" -> dqReport,
    "ext_dedup_pipeline" -> extDedupPipeline)

  val oracles: Map[String, String] = Map(
    "dq_report" ->
      """SELECT 'dup_order_pk' AS check_name, CAST(count(*) AS BIGINT) AS n_bad
        |FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'negative_prices', CAST(count(*) AS BIGINT) FROM lineitem
        |WHERE l_extendedprice < 0
        |UNION ALL
        |SELECT 'null_qty_lineitems', CAST(count(*) AS BIGINT) FROM lineitem
        |WHERE l_quantity IS NULL OR l_extendedprice IS NULL
        |UNION ALL
        |SELECT 'orphan_lineitems', CAST(count(*) AS BIGINT) FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL
        |SELECT 'orphan_orders', CAST(count(*) AS BIGINT) FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |ORDER BY check_name""".stripMargin,
    "ext_dedup_pipeline" ->
      """WITH exact AS (
        |  SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source, text
        |  FROM documents GROUP BY text),
        |dw AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(string_split(lower(text), ' '))) AS w
        |  FROM exact),
        |cnt AS (SELECT doc_id, count(*) AS nw FROM dw GROUP BY 1),
        |dropped AS (
        |  SELECT DISTINCT d2 AS doc_id FROM (
        |    SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS n_common
        |    FROM dw x JOIN dw y ON x.w = y.w AND x.source = y.source
        |      AND x.doc_id < y.doc_id GROUP BY 1, 2) p
        |  JOIN cnt c1 ON p.d1 = c1.doc_id
        |  JOIN cnt c2 ON p.d2 = c2.doc_id
        |  WHERE CAST(n_common AS DOUBLE) / (c1.nw + c2.nw - n_common) >= 0.9),
        |kept AS (
        |  SELECT * FROM exact
        |  WHERE NOT EXISTS (SELECT 1 FROM dropped WHERE dropped.doc_id = exact.doc_id))
        |SELECT e.source, CAST(e.n AS BIGINT) AS n_after_exact,
        |  CAST(k.n AS BIGINT) AS n_kept,
        |  CAST(e.n - k.n AS BIGINT) AS n_near_dups_removed
        |FROM (SELECT source, count(*) AS n FROM exact GROUP BY 1) e
        |JOIN (SELECT source, count(*) AS n FROM kept GROUP BY 1) k USING (source)
        |ORDER BY source""".stripMargin)
}
