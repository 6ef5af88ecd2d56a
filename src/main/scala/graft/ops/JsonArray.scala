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

  /** X3 — MapType surface: per-row maps built with `map()`, probed with
    * `element_at`, filtered with `map_filter`, rewritten with
    * `transform_values`, flattened with `map_keys`/`map_values`. DuckDB
    * has no map_filter/transform_values — its oracle recomputes the
    * same outputs from the underlying key/value arrays, which is the
    * point: the CONTRACT is output equality, not operator-name parity.
    * Outputs are scalars (maps never hit the parquet dump, so no
    * map-hashing portability hazard). One codegen'd map stage. */
  val fnMapOps: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        bindOnce(map(
          lit("a"), pmod(col("event_id"), lit(10L)),
          lit("b"), pmod(col("user_id"), lit(10L)),
          lit("c"), pmod(floor(col("value") * 100).cast("long"), lit(10L)))) {
          m => struct(
            size(m).as("n_keys"),
            element_at(m, "b").as("val_b"),
            size(map_filter(m, (_, v) => v > 5)).as("n_gt5"),
            element_at(transform_values(m, (_, v) => v * 2), "c")
              .as("c_doubled"),
            concat_ws(",", map_keys(m)).as("keys_csv"),
            aggregate(map_values(m), lit(0L), (acc, v) => acc + v)
              .as("val_sum"))
        }.as("r"))
      .select(col("event_id"), col("r.n_keys"), col("r.val_b"),
              col("r.n_gt5"), col("r.c_doubled"), col("r.keys_csv"),
              col("r.val_sum"))
      .orderBy(col("event_id"))

  val queries: Map[String, Q] = Map(
    "fn_json_extract" -> fnJsonExtract,
    "fn_array_ops" -> fnArrayOps,
    "fn_array_ops2" -> fnArrayOps2,
    "fn_map_ops" -> fnMapOps)

  val oracles: Map[String, String] = Map(
    // map semantics recomputed from the key/value arrays (DuckDB lacks
    // map_filter/transform_values) — output equality is the contract
    "fn_map_ops" ->
      """WITH v AS (
        |  SELECT event_id,
        |    (event_id % 10) AS va, (user_id % 10) AS vb,
        |    (((CAST(floor(value * 100) AS BIGINT) % 10) + 10) % 10) AS vc
        |  FROM events)
        |SELECT event_id,
        |  CAST(3 AS INTEGER) AS n_keys,
        |  vb AS val_b,
        |  CAST((CASE WHEN va > 5 THEN 1 ELSE 0 END)
        |     + (CASE WHEN vb > 5 THEN 1 ELSE 0 END)
        |     + (CASE WHEN vc > 5 THEN 1 ELSE 0 END) AS INTEGER) AS n_gt5,
        |  vc * 2 AS c_doubled,
        |  'a,b,c' AS keys_csv,
        |  va + vb + vc AS val_sum
        |FROM v ORDER BY event_id""".stripMargin,
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
