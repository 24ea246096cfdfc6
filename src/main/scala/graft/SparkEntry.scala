package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, HighsQueries, PipelineQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's entire declared surface: one entry per
  * implemented operator from SURVEY.md §2 (the reference's six functions +
  * its two workloads in HighsQueries; the inherited SQL surface in
  * AnalyticsQueries). `oracleSql` carries the DuckDB-equivalent
  * for each entry where one is expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's golden scenario end-to-end: build model1 through the
    * four table functions, solve it, return the solution rows
    * (test/sql/highs.test:31-98).
    */
  def entry(spark: SparkSession): DataFrame =
    HighsQueries.queries("highs_solve")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    HighsQueries.queries ++ AnalyticsQueries.queries ++ PipelineQueries.queries ++ TpchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    HighsQueries.oracles ++ AnalyticsQueries.oracles ++ PipelineQueries.oracles ++ TpchQueries.oracles
}
