package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` the equivalent ANSI SQL the driver runs in DuckDB over the
  * same parquet tables. Column names/types and row ordering are kept
  * identical on both sides (conventions in [[graft.ops]]).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Ingest.queries, Ingest.oracles),
    (Filters.queries, Filters.oracles),
    (Scalars.queries, Scalars.oracles),
    (Joins.queries, Joins.oracles),
    (Aggregates.queries, Aggregates.oracles),
    (Windows.queries, Windows.oracles),
    (TopK.queries, TopK.oracles),
    (JsonArray.queries, JsonArray.oracles),
    (Streaming.queries, Streaming.oracles),
    (TextAnalysis.queries, TextAnalysis.oracles),
    (Dedup.queries, Dedup.oracles),
    (Curation.queries, Curation.oracles),
    (Sampling.queries, Sampling.oracles),
    (Clustering.queries, Clustering.oracles),
    (Similarity.queries, Similarity.oracles),
    (Multimodal.queries, Multimodal.oracles),
    (Advanced.queries, Advanced.oracles),
    (Quality.queries, Quality.oracles),
    (SqlSurface.queries, SqlSurface.oracles),
    (Extras.queries, Extras.oracles),
    (Behavior.queries, Behavior.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggBasic(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
