package graft

import graft.ops.Advanced
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers._

class AdvancedSpec extends SparkSpec {

  test("seeded sample is stable across runs and roughly the right size") {
    val d = sf("sf0.01")
    val a = Advanced.sampleSeeded(spark, d).collect().map(_.getLong(0)).toSeq
    val b = Advanced.sampleSeeded(spark, d).collect().map(_.getLong(0)).toSeq
    a shouldBe b
    a.length.toDouble shouldBe (15000 * 0.1) +- 15000 * 0.03
  }

  test("vector centroid aggregator: mean of the per-label embeddings") {
    val d = sf("sf0.001")
    val out = Advanced.extVecCentroid(spark, d)
    out.count() shouldBe 10 * 64 // 10 labels x 64 dims
    // spot-check one cell against a direct computation
    val cell = out.filter(col("label") === 0 && col("dim") === 0)
      .first().getDouble(2)
    val direct = Tables.embeddings(spark, d).filter(col("label") === 0)
      .select(element_at(col("embedding"), 1).cast("double").as("v"))
      .agg(avg("v")).first().getDouble(0)
    cell shouldBe direct +- 1e-6
  }

  test("approx aggregates land within tolerance of exact values") {
    val rows = Advanced.aggApprox(spark, sf("sf0.01")).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_custs").toDouble
      val exact = r.getAs[Long]("exact_custs").toDouble
      math.abs(approx - exact) / exact should be < 0.1 // HLL default rsd 5%
    }
  }

  test("rollup emits subtotal and grand-total rows") {
    val d = sf("sf0.001")
    val rows = Advanced.aggRollup(spark, d).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    grand.length shouldBe 1
    grand.head.getAs[Long]("n_rows") shouldBe 6000L
    // flag-level subtotals = sum of their flag+status cells
    val aTotal = rows.filter(r => !r.isNullAt(0) && r.getString(0) == "A" && r.isNullAt(1))
      .head.getAs[Long]("n_rows")
    val aCells = rows.filter(r => !r.isNullAt(0) && r.getString(0) == "A" && !r.isNullAt(1))
      .map(_.getAs[Long]("n_rows")).sum
    aTotal shouldBe aCells
  }
}
