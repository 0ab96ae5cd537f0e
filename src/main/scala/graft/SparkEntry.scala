package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §0.1 / §7.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2): one
  * key per implemented operator, each locally diffed against DuckDB
  * before being declared (§5.2). `oracleSql` carries the equivalent
  * ANSI SQL; keys without an oracle are the legitimately
  * non-SQL-expressible sketches/iterative ops.
  */
object SparkEntry {

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame],
                           Map[String, String])] = Seq(
    (Scans.defs, Scans.oracles),
    (Filters.defs, Filters.oracles),
    (Aggregates.defs, Aggregates.oracles),
    (Joins.defs, Joins.oracles),
    (Windows.defs, Windows.oracles),
    (SortsSetOps.defs, SortsSetOps.oracles),
    (ScalarFns.defs, ScalarFns.oracles),
    (Vectors.defs, Vectors.oracles),
    (TextOps.defs, TextOps.oracles),
    (TextAnalysis.defs, TextAnalysis.oracles),
    (Streaming.defs, Streaming.oracles),
    (UserFns.defs, UserFns.oracles),
    (AnnSearch.defs, AnnSearch.oracles),
    (MultimodalOps.defs, MultimodalOps.oracles),
    (SourceFormats.defs, SourceFormats.oracles),
    (IndexPipeline.defs, IndexPipeline.oracles),
    (ScalePatterns.defs, ScalePatterns.oracles),
    (Subqueries.defs, Subqueries.oracles),
    (Quantize.defs, Quantize.oracles),
    (TimeSeries.defs, TimeSeries.oracles),
    (ProductQuantize.defs, ProductQuantize.oracles),
    (GraphOps.defs, GraphOps.oracles),
    (TrainedQuantize.defs, TrainedQuantize.oracles),
    (EmbedDedup.defs, EmbedDedup.oracles),
    (Relevance.defs, Relevance.oracles),
    (BinaryQuantize.defs, BinaryQuantize.oracles),
    (Maintenance.defs, Maintenance.oracles),
    (Curation.defs, Curation.oracles)
  )

  /** Flagship on sf0.001 (driver smoke-checks rows>0): the
    * reference's whole story in one job — dedup → embed → coarse
    * quantize → partitioned IVF index write → shard stats.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("pipeline_index_build")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
