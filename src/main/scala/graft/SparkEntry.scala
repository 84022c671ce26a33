package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full registry of implemented operators (SURVEY §2 inventory). */
  def registry: Seq[QueryDef] =
    queries_relational ++ queries_catalog ++ queries_llm ++
      graft.queries.FrozenAnn.defs ++ graft.queries.VideoQueries.defs ++
      queries_streaming

  private def queries_relational: Seq[QueryDef] = graft.queries.Relational.defs
  private def queries_catalog: Seq[QueryDef] = graft.queries.CatalogQueries.defs
  private def queries_llm: Seq[QueryDef] = graft.queries.LlmPipeline.defs
  private def queries_streaming: Seq[QueryDef] = graft.queries.StreamingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
