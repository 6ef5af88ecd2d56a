package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON / array / higher-order functions (SURVEY.md §2.9, X1–X2).
  *
  * Not used by the reference's flat schema; required by the testdata
  * surface (`events.props` JSON string, `embeddings.embedding`
  * array<float>) and the extension mandate.
  *
  * Scale notes: `from_json` with an explicit schema is codegen'd per row —
  * no shuffle; prefer it over repeated `get_json_object` when pulling
  * multiple fields (single parse). Higher-order `aggregate`/`transform`
  * run inside the row — the 64-float dot products/norms never leave the
  * executor, and at 100 TB the embedding column prunes cleanly because
  * parquet stores it as its own column chunk.
  */
object JsonArray {

  /** X1 — typed JSON field extraction, both `get_json_object` (path) and
    * `from_json` (schema'd single parse). */
  val fnJsonExtract: Q = (s, d) => {
    val propsSchema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(s, d)
      .withColumn("parsed", from_json(col("props"), propsSchema))
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        col("parsed.k").as("k_struct"))
      .orderBy(col("event_id"))
  }

  /** X2 — array ops over embeddings: size, element access, L2 norm and
    * mean via higher-order `aggregate` (float accumulation kept in the
    * same order as the array so both engines sum identically). */
  val fnArrayOps: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_val"),
        round(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + (x * x).cast("double")), 6).as("sq_norm"),
        round(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double")) / size(col("embedding")), 6)
          .as("mean_val"))
      .orderBy(col("vec_id"))

  /** X2b — the higher-order-function surface [[fnArrayOps]] doesn't
    * cover: `filter` / `exists` / `forall` / `aggregate` (fold with
    * init) / `zip_with` / `sort_array`, each mapped to its DuckDB
    * list_* spelling in the oracle (fold-with-init becomes
    * `list_reduce([0] || a, ...)` — DuckDB's reduce seeds from the
    * first element). The probe array is integer-derived from the row
    * key so every output is exact; the whole entry is one codegen'd
    * map stage. */
  val fnArrayOps2: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        bindOnce(transform(sequence(lit(1), lit(10)),
                           i => pmod(col("event_id") * i, lit(7L)))) { a =>
          struct(
            size(filter(a, x => x % 2 === 0)).as("n_even"),
            exists(a, x => x === 5).as("has_five"),
            forall(a, x => x < 7).as("all_lt7"),
            aggregate(a, lit(0L), (acc, x) => acc * 2 + x).as("folded"),
            concat_ws(",", reverse(sort_array(a))).as("sorted_desc"),
            aggregate(zip_with(a, reverse(a), (x, y) => x + y),
                      lit(0L), (p, q) => p + q).as("zip_sum"))
        }.as("r"))
      .select(col("event_id"), col("r.n_even"), col("r.has_five"),
              col("r.all_lt7"), col("r.folded"), col("r.sorted_desc"),
              col("r.zip_sum"))
      .orderBy(col("event_id"))

  val queries: Map[String, Q] = Map(
    "fn_json_extract" -> fnJsonExtract,
    "fn_array_ops" -> fnArrayOps,
    "fn_array_ops2" -> fnArrayOps2)

  val oracles: Map[String, String] = Map(
    "fn_array_ops2" ->
      """WITH a AS (
        |  SELECT event_id,
        |    list_transform(generate_series(1, 10),
        |      i -> (event_id * i) % 7) AS arr
        |  FROM events)
        |SELECT event_id,
        |  CAST(len(list_filter(arr, x -> x % 2 = 0)) AS INTEGER) AS n_even,
        |  len(list_filter(arr, x -> x = 5)) > 0 AS has_five,
        |  len(list_filter(arr, x -> x >= 7)) = 0 AS all_lt7,
        |  CAST(list_reduce([0] || arr, (acc, x) -> acc * 2 + x) AS BIGINT)
        |    AS folded,
        |  array_to_string(list_reverse_sort(arr), ',') AS sorted_desc,
        |  CAST(list_reduce([0] || list_transform(list_zip(arr,
        |    list_reverse(arr)), s -> s[1] + s[2]), (p, q) -> p + q)
        |    AS BIGINT) AS zip_sum
        |FROM a ORDER BY event_id""".stripMargin,
    "fn_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_array_ops" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
        |  round(list_aggregate(list_transform(embedding,
        |    x -> CAST(x * x AS DOUBLE)), 'sum'), 6) AS sq_norm,
        |  round(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE)), 'sum') / len(embedding), 6) AS mean_val
        |FROM embeddings ORDER BY vec_id""".stripMargin)
}
