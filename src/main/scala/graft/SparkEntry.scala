package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PipelineQueries, RelationalQueries, SearchQueries, SketchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module registries; every entry that is
  * ANSI-SQL-expressible has a matching DuckDB oracle in `oracleSql` with
  * identical output column names (the driver sorts columns by name before
  * hashing values, so aliases must agree on both sides).
  *
  * Modules:
  *  - [[queries.RelationalQueries]] — the Spark relational surface
  *    (aggregates, joins, windows, set ops, scalar functions, ...);
  *  - [[queries.SearchQueries]] — the reference's tantivy query-language
  *    constructs plus full engine lifecycle roundtrips
  *    (create → index → merge → search through the query compiler);
  *  - [[queries.PipelineQueries]] — training-data pipeline operators
  *    (dedup ×5, similarity search ×2, text analysis ×4, multimodal).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1_agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ SearchQueries.all ++ PipelineQueries.all ++
      SketchQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ SearchQueries.oracles ++
      PipelineQueries.oracles ++ SketchQueries.oracles
}
