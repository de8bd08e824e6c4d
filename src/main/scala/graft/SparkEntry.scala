package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from
  * SURVEY.md §2; `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's hash compare (omitted only for ops DuckDB cannot express,
  * which then get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: BM25 top-10 full-text search over documents (mirrors the
    * reference README's flagship example, README.md:127-137). */
  def entry(spark: SparkSession): DataFrame =
    queries("search_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.RelationalQueries.queries ++
      search.SearchQueries.queries ++
      pipeline.PipelineQueries.queries ++
      sources.SourceQueries.queries ++
      streaming.StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    relational.RelationalQueries.oracles ++
      search.SearchQueries.oracles ++
      pipeline.PipelineQueries.oracles ++
      sources.SourceQueries.oracles ++
      streaming.StreamQueries.oracles
}
