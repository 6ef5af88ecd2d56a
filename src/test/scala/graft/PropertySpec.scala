package graft

import graft.functions.GtfsFunctions
import graft.ops.{Dedup, TopK}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers._

/** Property-style tests over seeded random samples (SURVEY.md §5.3;
  * the scalatest↔scalacheck bridge isn't in the offline cache, so
  * sampling is hand-rolled with a fixed seed): format∘parse identity on
  * valid GTFS times, dedup idempotence, union-count additivity. */
class PropertySpec extends SparkSpec {

  private val rng = new scala.util.Random(42)

  test("gtfs time format∘parse = identity for random valid second counts (incl >24h)") {
    import spark.implicits._
    val samples = Seq.fill(200)(rng.nextLong(100L * 3600)).distinct
    val strs = samples.map(s => f"${s / 3600}%02d:${s % 3600 / 60}%02d:${s % 60}%02d")
    val parsed = strs.toDF("t")
      .select(GtfsFunctions.gtfsTimeToSeconds(col("t")))
      .collect().map(_.getLong(0)).toSeq
    parsed shouldBe samples
  }

  test("exact dedup is idempotent") {
    val d = sf("sf0.001")
    val once = Dedup.extExactDedup(spark, d)
    once.count() shouldBe once.dropDuplicates("text_sha").count()
  }

  test("union-all counts are additive with the individual table counts") {
    val d = sf("sf0.001")
    val rows = TopK.unionAllCounts(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows("region") shouldBe 5L
    rows.values.sum shouldBe graft.Tables.allNames
      .map(n => graft.Tables.table(spark, d, n).count()).sum
  }

  test("minhash estimated similarity tracks true jaccard within banding tolerance") {
    import spark.implicits._
    val words = Vector("alpha","beta","gamma","delta","epsilon","zeta","eta",
      "theta","iota","kappa","lambda","mu","nu","xi","omicron","pi")
    for (_ <- 1 to 10) {
      val cut = rng.nextInt(13); val len = 13 + rng.nextInt(3)
      val a = words.take(len + 1).mkString(" ")
      val b = (words.take(cut) ++ words.drop(cut).take(len + 1 - cut).map(_.toUpperCase))
        .mkString(" ")
      val df = Seq((a, b)).toDF("a", "b")
      val (sa, sb) = df.select(
        Dedup.minhashSig(Dedup.shingles3(col("a"))),
        Dedup.minhashSig(Dedup.shingles3(col("b"))))
        .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1))).head
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.size
      val trueJ = df.select(Dedup.jaccard3(col("a"), col("b"))).first().getDouble(0)
      est shouldBe trueJ +- 0.45 // 16 permutations: coarse but correlated
    }
  }
}
