package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source / sink operators (SURVEY.md §2.1, S1–S2).
  *
  * S1 mirrors the reference's CSV staging ingest
  * (`/root/reference/sql/load_gtfs_data.sql:2-84`: header row, empty
  * string = NULL, comma delimiter, explicit column list): we round-trip the
  * `part` table through CSV with an explicit schema — never inference on a
  * correctness path (SURVEY §1.3) — and read it back.
  *
  * S2 mirrors the staging→operational typed load
  * (`load_gtfs_data.sql:119-239`): null-filter on required columns,
  * COALESCE default-fill, and PK dedup standing in for
  * `ON CONFLICT DO NOTHING`.
  *
  * Scale notes: CSV read/write is splittable and streams partition-wise —
  * the round-trip here writes to a per-invocation tmpdir scratch but the
  * operator shape (schema'd reader, nullValue option) is exactly what a
  * 100 TB CSV staging load uses. `dropDuplicates(pk)` is a hash shuffle on
  * the PK — the same cost any engine pays for global dedup.
  */
object Ingest {

  /** Per-invocation scratch directory for round-trip entries: rooted at
    * the JVM tmpdir (checkout-location independent) with a unique
    * suffix, so two concurrent invocations of the same entry never race
    * on `mode(overwrite)` of one shared path. The directory must
    * outlive the returned (lazy) DataFrame, so no inline cleanup — the
    * OS tmp reaper owns it. */
  private[ops] def scratchDir(tag: String): String = {
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp")
      .stripSuffix("/")
    s"$base/graft-scratch/$tag-${java.util.UUID.randomUUID().toString.take(8)}"
  }

  private val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  /** S1 — CSV ingest with header, explicit schema, empty-string-as-NULL. */
  val csvIngest: Q = (s, d) => {
    val scratch = scratchDir("csv_ingest")
    Tables.part(s, d)
      .write.mode("overwrite").option("header", "true").csv(scratch)
    s.read.schema(partSchema)
      .option("header", "true").option("nullValue", "")
      .csv(scratch)
      .orderBy(col("p_partkey"))
  }

  /** S2 — typed load: required-column null filter + default fill + PK
    * dedup (`ON CONFLICT DO NOTHING` ≡ keep one row per PK; the PK is
    * fully duplicated when it repeats here, so "first wins" is
    * deterministic). */
  val typedLoadDedup: Q = (s, d) =>
    Tables.supplier(s, d)
      .filter(col("s_suppkey").isNotNull && col("s_name").isNotNull)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
              coalesce(col("s_acctbal"), lit(0.0)).as("s_acctbal"))
      .dropDuplicates("s_suppkey")
      .orderBy(col("s_suppkey"))

  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  /** S1b — JSON-lines ingest (the other ubiquitous staging format; the
    * reference's Python tier moves dicts/JSON payloads the same way its
    * SQL tier moves CSV). Round-trips `customer` through JSONL with an
    * explicit schema on the read — like S1, never inference on a
    * correctness path. JSONL is splittable line-wise, so the 100 TB read
    * parallelizes exactly like CSV; doubles survive because Spark's JSON
    * writer emits shortest-round-trip literals and the schema'd reader
    * parses them back to the identical IEEE value. */
  val jsonIngest: Q = (s, d) => {
    val scratch = scratchDir("json_ingest")
    Tables.customer(s, d)
      .write.mode("overwrite").json(scratch)
    s.read.schema(customerSchema).json(scratch)
      .orderBy(col("c_custkey"))
  }

  /** S1c — ORC round-trip (the third columnar-ecosystem staging format;
    * same reader discipline as S1/S1b). ORC is splittable with
    * predicate-pushdown-capable stripes, so the scan shape at 100 TB
    * matches parquet's. */
  val orcIngest: Q = (s, d) => {
    val scratch = scratchDir("orc_ingest")
    Tables.supplier(s, d)
      .write.mode("overwrite").orc(scratch)
    s.read.orc(scratch)
      .orderBy(col("s_suppkey"))
  }

  /** S2b — schema-evolution read: two parquet batches written with
    * different schemas (v2 adds a column), read back as ONE dataset via
    * `mergeSchema` — the append-only table whose schema widened
    * mid-stream, which every long-lived 100 TB table eventually is.
    * v1 rows surface NULL for the added column; the aggregate proves
    * both batches landed and the widened column reads correctly. */
  val parquetMergeSchema: Q = (s, d) => {
    val scratch = scratchDir("merge_schema")
    val n = Tables.nation(s, d)
    n.select(col("n_nationkey"), col("n_name"))
      .write.mode("overwrite").parquet(s"$scratch/batch=v1")
    n.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite").parquet(s"$scratch/batch=v2")
    s.read.option("mergeSchema", "true").parquet(scratch)
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("n_regionkey")).as("n_with_region"),
           sum(col("n_regionkey")).as("region_sum"))
      .orderBy(col("batch"))
  }

  val queries: Map[String, Q] = Map(
    "csv_ingest" -> csvIngest,
    "json_ingest" -> jsonIngest,
    "orc_ingest" -> orcIngest,
    "parquet_merge_schema" -> parquetMergeSchema,
    "typed_load_dedup" -> typedLoadDedup)

  val oracles: Map[String, String] = Map(
    "orc_ingest" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "parquet_merge_schema" ->
      """SELECT 'v1' AS batch, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(0 AS BIGINT) AS n_with_region,
        |  CAST(NULL AS BIGINT) AS region_sum
        |FROM nation
        |UNION ALL
        |SELECT 'v2', CAST(count(*) AS BIGINT),
        |  CAST(count(n_regionkey) AS BIGINT),
        |  CAST(sum(n_regionkey) AS BIGINT)
        |FROM nation
        |ORDER BY batch""".stripMargin,
    "json_ingest" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "csv_ingest" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,
    "typed_load_dedup" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        |  coalesce(s_acctbal, 0.0) AS s_acctbal
        |FROM supplier
        |WHERE s_suppkey IS NOT NULL AND s_name IS NOT NULL
        |ORDER BY s_suppkey""".stripMargin)
}
