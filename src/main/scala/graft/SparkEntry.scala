package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY §2C): each entry is
  * one operator family; `oracleSql` carries the DuckDB-equivalent SQL for
  * every SQL-expressible entry (the driver hash-compares canonicalized
  * results at sf0.01).
  */
object SparkEntry {

  private def registries: Seq[Q] =
    RelationalQueries.all ++ JoinQueries.all ++ AggQueries.all ++
      WindowSetQueries.all ++ FunctionQueries.all ++ SourceQueries.all ++
      TextQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
      AcidQueries.all ++ StreamingQueries.all ++ ExtraQueries.all ++
      PipelineQueries.all ++ SampleQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatMap(q => q.oracle.map(sql => q.name -> normalize(sql))).toMap

  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
