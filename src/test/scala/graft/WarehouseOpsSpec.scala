package graft

import graft.ops.{Dedup, Joins, Windows}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers._

/** Boundary/shape specs for the round-4 warehouse-maintenance and
  * incremental operators, run on injected synthetic frames (the sf0.01
  * oracle gate checks the full-table entries; these pin the edge
  * semantics the fixture may not exercise). */
class WarehouseOpsSpec extends SparkSpec {

  test("sessionizeByGap: exactly-30-min gap starts a new session, 1 microsecond less does not") {
    import spark.implicits._
    val thirtyMinUs = 30L * 60 * 1000000
    val rows = Seq(
      (1L, 0L, 10L),                 // user 1: session A
      (1L, thirtyMinUs, 11L),        // gap == 30 min -> NEW session
      (2L, 0L, 20L),                 // user 2: session A
      (2L, thirtyMinUs - 1, 21L))    // gap == 30 min - 1 us -> same
      .toDF("user_id", "us", "event_id")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
              col("event_id"))
    val out = Windows.sessionizeByGap(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    out.filter(_._1 == 1L).map(_._3).toSeq shouldBe Seq(1L, 1L) // two 1-event sessions
    out.filter(_._1 == 2L).map(_._3).toSeq shouldBe Seq(2L)     // one 2-event session
  }

  test("scd2Merge: changed key closes v1 and appends current v2; unchanged key stays open v1") {
    import spark.implicits._
    val cur = Seq((1L, 10.0, "A"), (2L, 20.0, "B"))
      .toDF("c_custkey", "c_acctbal", "c_mktsegment")
    val upd = Seq((2L, 99.0, "C"))
      .toDF("c_custkey", "c_acctbal", "c_mktsegment")
    val out = Joins.scd2Merge(cur, upd, "c_custkey")
      .orderBy("c_custkey", "version").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3),
                 r.getBoolean(4)))
    out.toSeq shouldBe Seq(
      (1L, 1, 10.0, "A", true),   // untouched: open v1
      (2L, 1, 20.0, "B", false),  // changed: closed v1 keeps OLD values
      (2L, 2, 99.0, "C", true))   // new version carries the update
  }

  test("incrementalDedup: new dup of corpus doc dropped, unique new doc kept, corpus-only dups don't pair") {
    import spark.implicits._
    val family = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, family),                                        // corpus
      (2L, family),                                        // corpus dup of 1 (old x old: must not matter)
      (3L, "unrelated corpus text about schedules and stops and routes"),
      (10L, family),                                       // NEW: dup of corpus -> dropped
      (11L, "a genuinely novel document with its own words entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(docs, col("doc_id") >= 10L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    out.length shouldBe 2 // corpus docs never appear in the output
    val byId = out.map(t => t._1 -> t).toMap
    byId(10L)._3 shouldBe false // matched old docs 1 and 2
    byId(10L)._2 shouldBe 2L
    byId(11L)._3 shouldBe true
    byId(11L)._2 shouldBe 0L
  }
}
