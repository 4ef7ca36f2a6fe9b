package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated corpus (TESTDATA.md / FIXTURES.md §B).
  * One parquet file per table; schemas are fixed by the generator, so we
  * read with schema inference off the footer (exact) — no sampling.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The loader owns timestamp-encoding normalization so downstream
    * operators see ONE type, `TimestampType` (session-UTC instants),
    * regardless of which generator wrote the corpus:
    *
    *  - parquet TIMESTAMP(NANOS) (early corpora): Spark's vectorized
    *    reader rejects it outright. Read nanos as long (see
    *    [[graft.core.Sessions]], which sets the legacy conf at session
    *    build) and convert to a µs TimestampType column with *integer*
    *    division: `ts div 1000` is Catalyst IntegralDivide — exact on
    *    any Long. (A float `/` would round-trip through double and
    *    corrupt 2024-epoch nanos, which exceed double's 53-bit
    *    mantissa.)
    *  - parquet TIMESTAMP_MICROS with `isAdjustedToUTC=false` (the
    *    round-12 regenerated corpus): reads as TIMESTAMP_NTZ when
    *    `inferTimestampNTZ` is on (Sessions.build turns it off, but a
    *    user-built session may not). Under the engine's pinned-UTC
    *    sessions `cast(ntz as timestamp)` reinterprets the stored
    *    micros bit-identically.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Defensive: harmless if already set by Sessions.build; only affects
    // parquet files that actually carry TIMESTAMP(NANOS) columns.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every corpus table as a temp view so the whole engine is
    * usable from plain `spark.sql` (M4's SQL entry point, SURVEY §2.7 —
    * together with GraftExtensions this makes ksqlDB-style SQL text the
    * second first-class API next to the Dataset surface).
    */
  def registerAll(s: SparkSession, d: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(s, d) else load(s, d, n)
      df.createOrReplaceTempView(n)
    }
}
