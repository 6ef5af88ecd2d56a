package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers._

/** ST1 high-water-mark semantics: the checkpoint is the watermark — a
  * second AvailableNow run over the same source ingests nothing new
  * (exactly-once), mirroring the reference's incremental-append guard
  * (`airflow/dags/ml_pipeline_dag.py:104-283`). Plus streaming==batch
  * equivalence (SURVEY §5.4). */
class StreamingSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch/spec")
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, s"graft_$name").toString
  }

  test("incremental run is exactly-once: second run over same checkpoint adds nothing") {
    val ckpt = tmp("ckpt")
    val out = tmp("out")
    val r1 = EventsStream.incrementalDaily(spark, sf("sf0.001"), ckpt, out)
      .agg(sum("n_events")).first().getLong(0)
    r1 shouldBe 1000L
    val r2 = EventsStream.incrementalDaily(spark, sf("sf0.001"), ckpt, out)
      .agg(sum("n_events")).first().getLong(0)
    // no new source files -> sink unchanged (NOT doubled): the checkpoint
    // is the high-water mark
    r2 shouldBe 1000L
  }

  test("streaming hourly agg equals batch aggregation over the same data") {
    val streamed = EventsStream.hourlyAgg(spark, sf("sf0.001"))
      .agg(sum("n_events"), countDistinct("event_type")).first()
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val batch = ev.agg(count(lit(1)), countDistinct("event_type")).first()
    streamed.getLong(0) shouldBe batch.getLong(0)
    streamed.getLong(1) shouldBe batch.getLong(1)
  }
}
