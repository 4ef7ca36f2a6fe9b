package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are declared per family under graft.queries; each carries its
  * DuckDB oracle SQL when the semantics are SQL-expressible.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    ParityQueries.defs ++ RelationalQueries.defs ++ PipelineQueries.defs ++
      LlmQueries.defs ++ TextMiningQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's UNHAPPY_PLATINUM_CUSTOMERS enrichment join
    * (ksqldb-statements.sql:50–68) over the corpus analog tables.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("p_unhappy_platinum")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. The exposed
    * plan includes each query's determinism-only output sort so the
    * driver's hash compare sees a stable row order (QueryDef.verifySort).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.verifyFn).toMap

  /** Bench-path plans: identical queries minus verification-only sorts. */
  def benchQueries: Seq[(String, (SparkSession, String) => DataFrame)] =
    allDefs.map(q => q.name -> q.fn)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
