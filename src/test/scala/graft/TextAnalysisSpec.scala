package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers._

/** Crafted-input behavior of the text operators (the corpus itself is
  * punctuation-free lowercase, so edge behavior needs synthetic rows). */
class TextAnalysisSpec extends SparkSpec {

  test("normalization collapses case/punctuation/whitespace variants to one form") {
    import spark.implicits._
    val variants = Seq(
      (0L, "Hello, World!  This is   GREAT."),
      (1L, "hello world this is great"),
      (2L, "HELLO...world?? this IS great"))
      .toDF("doc_id", "text")
    variants.createOrReplaceTempView("documents_variants")
    val normed = variants.select(
      trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
        " +", " ")).as("n"))
      .collect().map(_.getString(0)).toSet
    normed shouldBe Set("hello world this is great")
  }

  test("BPE-ish token regex segments mixed text into letters/digits/symbols") {
    import spark.implicits._
    val toks = Seq("ab12 c-d 3.5x").toDF("text")
      .select(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
      .first().getSeq[String](0)
    toks shouldBe Seq("ab", "12", "c", "-", "d", "3", ".", "5", "x")
  }

  test("fingerprint is order-sensitive and prefix-stable") {
    import spark.implicits._
    val df = Seq(("abc def", "def abc", "abc defX")).toDF("a", "b", "c")
    def fp(c: org.apache.spark.sql.Column) =
      aggregate(transform(split(c, ""), ch => ascii(ch).cast("long")),
        lit(0L), (acc, x) => (acc * 31 + x) % 1000000007L)
    val r = df.select(fp(col("a")), fp(col("b")), fp(col("c"))).first()
    (r.getLong(0) == r.getLong(1)) shouldBe false // order matters
    (r.getLong(0) == r.getLong(2)) shouldBe false
  }

  test("BMP codec: encode→decode round-trips dims and pixel sum at every padding residue") {
    import graft.ops.Multimodal.Bmp
    // widths 1..5 cover row-padding residues (w*3 mod 4 = 3,2,1,0,3)
    for (w <- 1 to 5; h <- Seq(1, 3, 4)) {
      val n = w * h * 3
      val bytes = Array.tabulate(n)(i => (i * 37 + 11) % 256)
      val enc = Bmp.encode(w, h, bytes(_))
      val dec = Bmp.decode(enc).get
      dec.width shouldBe w
      dec.height shouldBe h
      dec.nPixels shouldBe w * h
      dec.sumRgb shouldBe bytes.map(_.toLong).sum
    }
  }

  test("BMP decode rejects malformed payloads instead of mis-reading them") {
    import graft.ops.Multimodal.Bmp
    val good = Bmp.encode(3, 2, _ => 7)
    Bmp.decode(good).isDefined shouldBe true
    Bmp.decode(Array[Byte]()) shouldBe None              // empty
    Bmp.decode(good.take(53)) shouldBe None              // truncated header
    Bmp.decode(good.dropRight(1)) shouldBe None          // truncated pixels
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    Bmp.decode(badMagic) shouldBe None
    val badBpp = good.clone(); badBpp(28) = 8.toByte     // not 24bpp
    Bmp.decode(badBpp) shouldBe None
    val compressed = good.clone(); compressed(30) = 1.toByte
    Bmp.decode(compressed) shouldBe None
  }

  test("multimodal pipeline decodes real BMP payloads (UTF-8 byte cycle, empty text)") {
    import spark.implicits._
    import graft.ops.Multimodal
    // 'éxé' is 3 chars but 5 UTF-8 bytes: C3 A9 78 C3 A9
    val df = Seq((0L, "hello", "en", "s", 5L), (1L, "éxé", "fr", "s", 3L),
                 (2L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = "/root/repo/target/scratch/mmspec"
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.extMultimodal(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Int]("n_pixels"), r.getAs[Long]("sum_rgb")))).toMap
    // doc 0: w=1+5%12=6, h=1+0%7=1, 18 channel bytes cycling "hello"(5B):
    // 3 full cycles (sum 532*3) + 3 bytes (104+101+108)
    val hello = "hello".getBytes("UTF-8").map(_ & 0xFF)
    out(0L) shouldBe ((6, 1, 6, hello.sum.toLong * 3 + 104 + 101 + 108))
    // doc 1: w=1+3%12=4, h=1+1%7=2, 24 bytes cycling 5 UTF-8 bytes:
    // 4 full cycles + first 4 bytes
    val exe = "éxé".getBytes("UTF-8").map(_ & 0xFF)
    out(1L) shouldBe ((4, 2, 8, exe.sum.toLong * 4 + exe.take(4).sum))
    // doc 2: empty text -> all-zero pixels
    out(2L) shouldBe ((1, 3, 3, 0L))
  }

  test("quality score is monotone in stopword pollution") {
    import spark.implicits._
    val rich = "the cat sat on the mat and the dog ran to the park in the sun"
    val clean = "quantum entanglement violates classical locality constraints fundamentally"
    val df = Seq((0L, rich, "en", "s", 60L), (1L, clean, "en", "s", 70L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // run the real operator against a scratch dir exposing these rows as
    // the documents table
    val dir = "/root/repo/target/scratch/textspec"
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.extQualityScore(spark, dir)
    val q = out.collect().map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    q(1L) should be > q(0L) // stopword-free text scores higher
  }
}
