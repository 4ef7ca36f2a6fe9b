package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Debezium CDC source semantics (SURVEY.md §2.1 S2): the reference's
  * `SOURCE_MYSQL_01` connector applies two Single-Message-Transforms
  * (/root/reference/ksqldb-statements.sql:31–34):
  *
  *  - `ExtractNewRecordState` — unwrap the Debezium envelope
  *    `{before, after, op, ts_ms}` to the after-image row, dropping
  *    deletes (default behaviour: tombstone/delete records removed);
  *  - `ExtractField$Key` — promote the PK field out of the key struct
  *    to the plain message key.
  *
  * Spark-first: both are one `select` over a DataFrame whose `value`
  * column is the envelope struct — no custom expressions. The Avro
  * registry decode of the reference (README.md:95–96) is `from_json`
  * with an explicit schema in this offline build (SURVEY.md §1.3).
  */
object Cdc {

  /** Envelope schema factory: Debezium wraps a row schema R as
    * {before: R, after: R, op: string, ts_ms: long}.
    */
  def envelopeSchema(row: StructType): StructType =
    new StructType()
      .add("before", row).add("after", row)
      .add("op", "string").add("ts_ms", "long")

  /** ExtractNewRecordState over an envelope struct column: keep creates/
    * updates/snapshot-reads (op c/u/r), drop deletes, project after.*.
    * `keyField` is additionally surfaced first as `key` (ExtractField$Key
    * analog — the message key the reference keys its CUSTOMERS table by).
    */
  def unwrap(df: DataFrame, envelope: Column, keyField: String): DataFrame = {
    val e = envelope.alias("__env")
    df.select(e)
      .filter(col("__env.op").isin("c", "u", "r"))
      .select(col(s"__env.after.$keyField").cast("string").as("key"),
        col("__env.after.*"))
  }

  /** Delete stream: the complement — tombstone keys (op = 'd'), before
    * image attached. Callers that materialize a latest-by-key table feed
    * these as retractions.
    */
  def deletes(df: DataFrame, envelope: Column, keyField: String): DataFrame = {
    val e = envelope.alias("__env")
    df.select(e)
      .filter(col("__env.op") === "d")
      .select(col(s"__env.before.$keyField").cast("string").as("key"),
        col("__env.before.*"))
  }

  /** JSON-serialized envelope (our offline stand-in for registry Avro):
    * decode `value` string → envelope struct, then unwrap.
    */
  def unwrapJson(df: DataFrame, valueCol: String, rowSchema: StructType,
                 keyField: String): DataFrame =
    unwrap(df, from_json(col(valueCol), envelopeSchema(rowSchema)), keyField)

  /** Wrap rows INTO a Debezium-shaped envelope (test/data-gen helper —
    * lets any batch table play a CDC topic; op defaults to snapshot 'r').
    */
  def wrap(df: DataFrame, op: String = "r"): DataFrame = {
    val row = struct(df.columns.map(col): _*)
    df.select(struct(
      lit(null).cast(df.schema).as("before"),
      row.as("after"),
      lit(op).as("op"),
      (unix_timestamp(current_timestamp()) * 1000).as("ts_ms")).as("value"))
  }
}
