package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.11 / BASELINE.json): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction partition-wise.
  *
  * Round 3: the codec is REAL — [[Bmp]] is a dependency-free pure-JVM
  * encoder/decoder for uncompressed 24-bit BMP (the one raster container
  * parsable without codec libraries). The pipeline synthesizes a
  * deterministic BMP per document (pixel bytes cycle through the doc's
  * UTF-8 bytes; dimensions derive from (n_chars, doc_id)), carries it as
  * a binary `payload` column, then DECODES it back partition-wise: magic/
  * header-field validation, bottom-up padded-row pixel walk, per-channel
  * byte stats. The oracle recomputes the expected stats from the
  * generator's closed form — so a decoder that misparsed the header,
  * mis-stepped row padding, or mis-sized the pixel array hash-mismatches
  * immediately. Swapping in a JPEG/PNG codec changes only the
  * [[Bmp.decode]] body; schema, batching, and partitioning stay.
  *
  * Scale notes: at 100 TB, binary payloads dominate I/O — the decode
  * stage projects to (doc_id, payload) only; `mapPartitions` keeps any
  * real codec context per PARTITION, not per row; the output schema is
  * fixed so downstream stays columnar.
  */
object Multimodal {

  /** Minimal uncompressed 24-bit BMP codec (pure JVM, no dependencies).
    * Layout per the public BMP spec: 14-byte file header (`BM`, file
    * size, pixel-array offset at byte 10), 40-byte BITMAPINFOHEADER
    * (width/height at 18/22, planes=1 at 26, bpp at 28, compression=0 at
    * 30), then bottom-up pixel rows, each padded to a 4-byte boundary. */
  object Bmp {
    private val HeaderSize = 54

    /** Encode a w×h image whose flat channel stream (3 bytes/pixel,
      * top-down pixel order) is produced by `pix(i)` for channel index
      * i ∈ [0, w*h*3). */
    def encode(w: Int, h: Int, pix: Int => Int): Array[Byte] = {
      require(w > 0 && h > 0, s"bad dims ${w}x$h")
      val rowBytes = w * 3
      val pad = (4 - rowBytes % 4) % 4
      val dataSize = (rowBytes + pad) * h
      val buf = java.nio.ByteBuffer.allocate(HeaderSize + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte)
        .putInt(HeaderSize + dataSize)
        .putShort(0).putShort(0)
        .putInt(HeaderSize)
      buf.putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(24)
        .putInt(0).putInt(dataSize)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      var r = h - 1 // bottom-up row order
      while (r >= 0) {
        var i = 0
        while (i < rowBytes) {
          buf.put(pix((r * w) * 3 + i).toByte)
          i += 1
        }
        var p = 0
        while (p < pad) { buf.put(0.toByte); p += 1 }
        r -= 1
      }
      buf.array()
    }

    final case class Decoded(width: Int, height: Int, nPixels: Int,
                             sumRgb: Long)

    /** Parse and validate the headers, walk the padded bottom-up pixel
      * array, return dimensions + the sum of all channel bytes (padding
      * EXCLUDED — including it is the classic BMP-walk bug, and the
      * oracle's closed form would catch it). None on anything malformed:
      * wrong magic, non-24bpp, compressed, or a pixel array that
      * overruns the buffer. */
    def decode(bytes: Array[Byte]): Option[Decoded] = {
      if (bytes.length < HeaderSize || bytes(0) != 'B' || bytes(1) != 'M')
        return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val off = bb.getInt(10)
      val dibSize = bb.getInt(14)
      val w = bb.getInt(18)
      val h = bb.getInt(22)
      val planes = bb.getShort(26)
      val bpp = bb.getShort(28)
      val compression = bb.getInt(30)
      if (dibSize < 40 || planes != 1 || bpp != 24 || compression != 0 ||
          w <= 0 || h <= 0 || off < HeaderSize)
        return None
      val rowBytes = w * 3
      val stride = rowBytes + ((4 - rowBytes % 4) % 4)
      if (off.toLong + stride.toLong * h > bytes.length) return None
      var sum = 0L
      var r = 0
      while (r < h) {
        val base = off + r * stride
        var i = 0
        while (i < rowBytes) { sum += bytes(base + i) & 0xFF; i += 1 }
        r += 1
      }
      Some(Decoded(w, h, w * h, sum))
    }
  }

  /** Deterministic payload dimensions: width from the doc's length
    * metadata, height from its id — small (≤ 12×7) but exercising every
    * row-padding residue (width mod 4 takes all values). */
  private def dims(docId: Long, nChars: Int): (Int, Int) =
    (1 + math.floorMod(nChars, 12), 1 + math.floorMod(docId, 7L).toInt)

  /** E-mm — binary-column pipeline: synthesize a real BMP payload per
    * document, decode it partition-wise, emit decoded features. */
  val extMultimodal: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("n_chars").cast("int").as("n_chars"),
              col("lang"))
    // stage 1: encode — the multimodal binary column + metadata struct
    val withPayload = docs
      .select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Int)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val tb = if (text == null) Array.empty[Byte]
                 else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val (w, h) = dims(id, nChars)
        val payload = Bmp.encode(w, h,
          i => if (tb.isEmpty) 0 else tb(i % tb.length) & 0xFF)
        (id, payload)
      }).toDF("doc_id", "payload")
    // stage 2: decode — header parse + padded pixel walk, per partition
    val features = withPayload.as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val dec = Bmp.decode(bytes).getOrElse(
          sys.error(s"undecodable payload for doc $id"))
        (id, dec.width, dec.height, dec.nPixels, dec.sumRgb)
      }).toDF("doc_id", "width", "height", "n_pixels", "sum_rgb")
    features
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
              col("sum_rgb"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map("ext_multimodal" -> extMultimodal)

  /** The oracle recomputes the decoder's outputs from the generator's
    * closed form: dimensions from (n_chars, doc_id); sum_rgb from the
    * UTF-8 byte cycle — npix·3 positions cycling a len-byte text sum to
    * ⌊npix·3/len⌋ · Σbytes + Σ(first npix·3 mod len bytes). Byte values
    * come from the hex dump (engine-portable), so parity holds on
    * non-ASCII text too. */
  val oracles: Map[String, String] = Map(
    "ext_multimodal" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    CAST(1 + n_chars % 12 AS INTEGER) AS width,
        |    CAST(1 + doc_id % 7 AS INTEGER) AS height,
        |    octet_length(encode(text)) AS len,
        |    hex(encode(text)) AS hx
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, width, height, len,
        |    list_transform(range(1, len + 1),
        |      i -> CAST(16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
        |              + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS BIGINT)) AS bytes
        |  FROM h)
        |SELECT doc_id, width, height,
        |  CAST(width * height AS INTEGER) AS n_pixels,
        |  CAST(CASE WHEN len = 0 THEN 0 ELSE
        |    (CAST(width AS BIGINT) * height * 3 // len)
        |      * coalesce(list_aggregate(bytes, 'sum'), 0)
        |    + coalesce(list_aggregate(
        |        bytes[1:CAST(CAST(width AS BIGINT) * height * 3 % len AS INTEGER)],
        |        'sum'), 0)
        |  END AS BIGINT) AS sum_rgb,
        |  lang
        |FROM b ORDER BY doc_id""".stripMargin)
}
