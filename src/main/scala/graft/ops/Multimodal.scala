package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.11 / BASELINE.json): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction partition-wise.
  *
  * The Spark-side plumbing is real: binary column + metadata struct,
  * explicit output schema, `mapPartitions` batch iteration (the Scala
  * analogue of `mapInPandas` — one JVM-side batch loop per partition, no
  * per-row driver involvement, no shuffle). The codec itself is STUBBED
  * deterministically (this container has no image/audio libraries): the
  * "decoder" derives features from the raw bytes (length, first byte,
  * prefix checksum) so the whole path is testable and oracle-checkable.
  * Swapping in a real codec changes only the function body inside
  * `mapPartitions`.
  *
  * Scale notes: at 100 TB, binary payloads dominate I/O — the metadata
  * projection prunes to the binary column + keys only; partition-wise
  * decode keeps the library handle (a real codec context) per partition,
  * not per row; and the output schema is fixed so downstream stays
  * columnar.
  */
object Multimodal {

  /** The stub "decoder": deterministic features of the raw bytes. A real
    * implementation would decode an image and emit e.g. width/height/
    * channel stats with this exact batching shape (a per-partition batch
    * loop — codec context created once per partition, not per row). */
  private def decodeBatch(rows: Iterator[(Long, Array[Byte])])
      : Iterator[(Long, Int, Int, Long)] =
    rows.map { case (id, bytes) =>
      val checksum = bytes.take(8).foldLeft(0L)((acc, b) => acc + (b & 0xFF)) % 256
      (id, bytes.length, if (bytes.isEmpty) 0 else bytes(0) & 0xFF, checksum)
    }

  /** E-mm — binary-column pipeline: text bytes stand in for an encoded
    * image payload; metadata struct rides along; features extracted
    * partition-wise. */
  val extMultimodal: Q = (s, d) => {
    import s.implicits._
    val withPayload = Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"))
    val features = withPayload
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(decodeBatch)
      .toDF("doc_id", "byte_len", "first_byte", "prefix_checksum")
    features
      .join(withPayload.select(col("doc_id"), col("meta.lang").as("lang")),
            Seq("doc_id"))
      .select(col("doc_id"), col("byte_len"), col("first_byte"),
              col("prefix_checksum"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map("ext_multimodal" -> extMultimodal)

  /** The oracle is byte-based like the Spark side (UTF-8 bytes via
    * `encode()`, first-8-byte window sliced from the hex dump) — parity
    * holds on non-ASCII text too, not just on an ASCII-only corpus. */
  val oracles: Map[String, String] = Map(
    "ext_multimodal" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    octet_length(encode(text)) AS byte_len,
        |    substr(hex(encode(text)), 1, 16) AS hx
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(byte_len AS INTEGER) AS byte_len,
        |  CAST(CASE WHEN byte_len = 0 THEN 0
        |       ELSE 16 * (strpos('0123456789ABCDEF', substr(hx, 1, 1)) - 1)
        |          + (strpos('0123456789ABCDEF', substr(hx, 2, 1)) - 1)
        |       END AS INTEGER) AS first_byte,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length(hx) // 2 + 1),
        |      i -> CAST(16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
        |              + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS BIGINT))),
        |    (a, b) -> a + b) % 256 AS BIGINT) AS prefix_checksum,
        |  lang
        |FROM h ORDER BY doc_id""".stripMargin)
}
