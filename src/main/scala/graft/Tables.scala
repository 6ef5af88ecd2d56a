package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish testdata
  * (`/root/repo/TESTDATA.md`). One parquet per table; explicit helper so
  * every operator reads through one place (lets us later swap in bucketed /
  * partitioned layouts without touching query code).
  *
  * Scale note: at 100 TB these reads become distributed parquet scans;
  * correctness code must therefore never assume single-file layout — we
  * always pass the path (file OR directory of part-files works identically).
  */
object Tables {
  /** Test-only transient-fault injector backing graft.RetryProbe: with
    * sys.prop `graft.test.failonce=<token>` set, the FIRST attempt of
    * partition 0 of each table scan throws once per (token, table) —
    * exercising Spark's task-retry path (requires a master with
    * maxFailures >= 2, e.g. local[4, 2]). The fired-set lives in this
    * JVM, which is exactly where local-mode tasks run; the hook is a
    * no-op in any real deployment (the prop is never set there). */
  private[graft] object RetryFault {
    val fired = java.util.concurrent.ConcurrentHashMap
      .newKeySet[String]()
  }

  private def maybeInjectFault(df: DataFrame, name: String): DataFrame =
    sys.props.get("graft.test.failonce") match {
      case Some(token) =>
        val schema = df.schema
        val key = s"$token/$name"
        val rdd = df.rdd.mapPartitionsWithIndex { (i, it) =>
          if (i == 0 && RetryFault.fired.add(key))
            throw new RuntimeException(
              s"graft.test.failonce: injected transient failure ($key)")
          it
        }
        df.sparkSession.createDataFrame(rdd, schema)
      case None => df
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // nanos column; see events() below. The legacy flag stays set ONLY
      // when the file really is the nanos layout (the frame's execution
      // needs it); for native-micros generations it is restored so it
      // cannot silently re-type later parquet reads on the shared session
      // (same discipline as the streaming-side layout probe).
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      val df = spark.read.parquet(s"$sfDir/events.parquet")
      if (df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
        prev match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      maybeInjectFault(df, name)
    } else maybeInjectFault(
      spark.read.parquet(s"$sfDir/$name.parquet"), name)
  }

  /** `events.parquet` has stored `ts` as parquet TIMESTAMP(NANOS) in some
    * driver generations (Spark has no native type for it — we read raw
    * Long nanos via `spark.sql.legacy.parquet.nanosAsLong` and truncate
    * to micros, identical to DuckDB's microsecond TIMESTAMP) and as plain
    * TIMESTAMP(MICROS) in others. Dispatch on the physical type so both
    * layouts land on the same timestamp_ntz micros column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // timestamp_ntz, matching how Spark reads the other tables' naive
    // parquet timestamps (inferTimestampNTZ) — a plain TimestampType here
    // would dump as isAdjustedToUTC=true parquet and mismatch the oracle's
    // naive timestamps. Session TZ is pinned UTC so the cast is a rebadge.
    val raw = table(s, d, "events")
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long layout
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000"))
          .cast("timestamp_ntz")
      case _ => // native micros layout
        org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", tsCol)
  }

  val allNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
