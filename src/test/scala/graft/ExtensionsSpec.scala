package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers._

/** GraftExtensions must make vec_dot available to a session built with
  * `spark.sql.extensions=graft.GraftExtensions` (the spark-submit path).
  * Uses its own SparkSession: extensions apply at session construction. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions provides vec_dot") {
    // getOrCreate returns any existing default session WITHOUT applying
    // extensions — clear the defaults so a genuinely new session (sharing
    // the JVM's SparkContext) is built through the extensions path, then
    // restore the shared session for the other suites
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      import s.implicits._
      val r = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
        .selectExpr("vec_dot(a, b)").first().getDouble(0)
      r shouldBe 11.0
      val m = Seq((Array(0x3L), Array(0x1L))).toDF("ma", "mb")
        .selectExpr("mask_and_count(ma, mb)").first().getLong(0)
      m shouldBe 1L
      // wrong arity fails with the standard WRONG_NUM_ARGS analysis error
      // naming the function, not a NoSuchElementException from the builder
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        Seq((Array(1.0f), Array(1.0f))).toDF("a", "b").selectExpr("vec_dot(a)")
      }
      e.getMessage should include("vec_dot")
      e.getMessage should include("2")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
