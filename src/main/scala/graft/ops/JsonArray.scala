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

  val queries: Map[String, Q] = Map(
    "fn_json_extract" -> fnJsonExtract,
    "fn_array_ops" -> fnArrayOps)

  val oracles: Map[String, String] = Map(
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
