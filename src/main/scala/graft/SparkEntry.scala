package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, CorpusQueries, DataQueries, EventQueries, ExtQueries, InferQueries, Q, ScaleQueries, StatQueries, TrainQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in `graft.queries.*` modules, each colocated with its
  * DuckDB oracle SQL; this object only aggregates them.
  */
object SparkEntry {

  /** Every declared query, in stable order. */
  def allQueries: Seq[Q] =
    CoreQueries.all ++ DataQueries.all ++ EventQueries.all ++ CorpusQueries.all ++
      TrainQueries.all ++ ScaleQueries.all ++ StatQueries.all ++ ExtQueries.all ++
      InferQueries.all ++ AnalyticsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    graft.expressions.GraftExtensions.register(spark)
    CoreQueries.q09.fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. Every fn
    * self-registers the engine's native functions, so the map works on
    * any caller-provided session (not just Verify/Bench's).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        graft.expressions.GraftExtensions.register(s)
        q.fn(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (driver
    * falls back to a rows-only check).
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
