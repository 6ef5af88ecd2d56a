package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — pre-shuffled storage so repeated big-big joins
  * on the same key run with ZERO exchanges (SURVEY.md §4 / builder-prompt
  * "bucketing for co-located joins").
  *
  * At 100 TB, lineitem⨝orders on orderkey is the recurring join; paying
  * the shuffle once at write time (bucketBy) and never again is the
  * classic warehouse trade. Catalyst recognizes matching bucket specs on
  * both sides and plans a sort-merge join directly over bucket files.
  */
object BucketedLayout {

  /** Bucket both fact tables on the join key into the session catalog
    * (parquet under spark.sql.warehouse.dir). */
  def bucketFacts(spark: SparkSession, sfDir: String, buckets: Int = 8): Unit = {
    graft.Tables.lineitem(spark, sfDir)
      .write.mode("overwrite")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("lineitem_bucketed")
    graft.Tables.orders(spark, sfDir)
      .write.mode("overwrite")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("orders_bucketed")
  }

  /** The co-located join: revenue per order-priority over the bucketed
    * tables. With matching bucket specs this plans with no
    * ShuffleExchange on either join input. */
  def colocatedJoin(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.table("lineitem_bucketed")
      .join(spark.table("orders_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
             .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }
}
