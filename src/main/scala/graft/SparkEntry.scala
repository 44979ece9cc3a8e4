package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.RetailStar
import graft.ext.{Dedup, Graph, Multimodal, Pipeline, Similarity, TextAnalysis}
import graft.queries.{AdvancedQueries, CoreQueries, InventoryQueries}
import graft.streaming.{DocumentsStream, EmbeddingsStream, EventsStream, StarStream}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2) as named
  * (SparkSession, sfDir) => DataFrame entries; `oracleSql` carries the
  * DuckDB-runnable equivalent for the driver's hash-compare. Column
  * names and row order are made to match exactly (BASELINE.md).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q3RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ InventoryQueries.queries ++ AdvancedQueries.queries ++
      Dedup.queries ++ Graph.queries ++ TextAnalysis.queries ++ Similarity.queries ++
      Multimodal.queries ++ EventsStream.queries ++ DocumentsStream.queries ++
      EmbeddingsStream.queries ++ StarStream.queries ++ RetailStar.queries ++ Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ InventoryQueries.oracles ++ AdvancedQueries.oracles ++
      Dedup.oracles ++ Graph.oracles ++ TextAnalysis.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ EventsStream.oracles ++ DocumentsStream.oracles ++
      EmbeddingsStream.oracles ++ StarStream.oracles ++ RetailStar.oracles ++ Pipeline.oracles
}
