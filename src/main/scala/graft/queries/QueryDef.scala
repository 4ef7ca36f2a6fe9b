package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One verifiable engine query: the Spark-side definition plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL over
  * the same parquet tables. Column names must match exactly on both sides —
  * the driver's compare hashes values under name-sorted columns.
  *
  * `verifySort` holds a determinism-only final ordering applied in the
  * Verify path (so the oracle hash sees a stable row order) but NOT in the
  * Bench path — a global sort that exists purely for verification must not
  * contaminate throughput measurement. Sorts that are *semantic* (top-k
  * `orderBy ... limit`) stay inside `fn` itself.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    verifySort: Option[DataFrame => DataFrame] = None) {

  /** Verification-path plan: the query plus its determinism sort. */
  def verifyFn: (SparkSession, String) => DataFrame =
    (s, d) => verifySort.fold(fn(s, d))(sort => sort(fn(s, d)))

  /** Declare a determinism-only output ordering for the Verify path. */
  def sortedBy(cols: Column*): QueryDef =
    copy(verifySort = Some(_.orderBy(cols: _*)))
}

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
