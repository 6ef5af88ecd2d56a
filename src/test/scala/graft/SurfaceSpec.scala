package graft

import graft.ops.{Aggregates, Curation, Ingest, Scalars}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers._

/** Specs for the round-4 continuation surface entries (JSON ingest,
  * deterministic mode, trig scalars, vocabulary encoding). */
class SurfaceSpec extends SparkSpec {

  test("json ingest round-trips rows and doubles losslessly") {
    val d = sf("sf0.001")
    val out = Ingest.jsonIngest(spark, d)
    val src = Tables.customer(spark, d)
    out.count() shouldBe src.count()
    out.agg(sum(col("c_acctbal"))).first().getDouble(0) shouldBe
      src.agg(sum(col("c_acctbal"))).first().getDouble(0)
  }

  test("mode picks the max-count value with deterministic tie-break") {
    val d = sf("sf0.01")
    val rows = Aggregates.aggMode(spark, d).collect()
    val direct = Tables.orders(spark, d)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val grp = direct(r.getString(0))
      val maxC = grp.map(_.getLong(2)).max
      r.getAs[Long]("mode_count") shouldBe maxC
      // tie-break: smallest value among max-count candidates
      val want = grp.filter(_.getLong(2) == maxC).map(_.getString(1)).min
      r.getAs[String]("mode_priority") shouldBe want
    }
  }

  test("trig surface satisfies sin^2 + cos^2 = 1 and rad/deg invert") {
    val rows = Scalars.fnTrig(spark, sf("sf0.001")).limit(500).collect()
    rows.foreach { r =>
      val s = r.getAs[Double]("sin_v"); val c = r.getAs[Double]("cos_v")
      (s * s + c * c) shouldBe 1.0 +- 1e-9
      // both invert back to the same original value
      val rad = r.getAs[Double]("rad_v"); val deg = r.getAs[Double]("deg_v")
      rad * 180.0 / math.Pi shouldBe deg * math.Pi / 180.0 +- 1e-9
    }
  }

  test("vocab encode: id 1 is the most frequent token, sequence length matches") {
    val d = sf("sf0.01")
    val out = Curation.extVocabEncode(spark, d).collect()
    out.foreach { r =>
      val n = r.getAs[Long]("n_toks")
      n should be <= 16L
      r.getAs[String]("ids_str").split(",").length.toLong shouldBe n
    }
    // the corpus-wide most frequent token should appear as id 1 in at
    // least one document head (it is frequent, after all)
    out.exists(_.getAs[String]("ids_str").split(",").contains("1")) shouldBe true
  }
}
