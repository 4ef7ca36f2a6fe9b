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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    if (needsSplit(spark, path)) {
      // the round-12 regenerated corpus writes each table as ONE parquet
      // row group, and a row group is the parquet read-parallelism
      // quantum: file-splitting by maxPartitionBytes cannot help (every
      // split except the one holding the row-group midpoint reads zero
      // rows), so every scan serializes onto a single task. One
      // round-robin repartition after load restores cluster-wide
      // parallelism for everything downstream; the serial scan + one
      // exchange is the unavoidable floor for this file layout. Catalyst
      // still pushes filters and prunes columns THROUGH the repartition
      // into the scan, so only surviving columns/rows pay the shuffle.
      // Small tables (< 1024 rows) skip it: dims stay broadcast-cheap
      // and a shuffle would cost more than the serial scan.
      df.repartition(spark.sparkContext.defaultParallelism)
    } else df
  }

  /** Repartition only when it pays: a SINGLE-file table of ONE row group
    * carrying at least [[MinSplitRows]] rows. The gate is row count, not
    * bytes: the corpus' compute-heavy tables (documents, embeddings) are
    * under a megabyte on disk but thousands of rows whose per-row work
    * (shingling, tokenization, vector math) is the actual cost — leaving
    * them on one task serializes every map stage before the first
    * shuffle. Footer-read once per (path, length) — the decision is
    * cached for the JVM's lifetime, so repeated `load` calls inside
    * query builders cost a map lookup.
    */
  private val MinSplitRows: Long = 1024L
  private val splitCache =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  private def needsSplit(spark: SparkSession, path: String): Boolean = {
    val f = new java.io.File(path)
    if (!f.isFile) false
    else splitCache.computeIfAbsent(s"$path@${f.length}", _ =>
      try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          spark.sessionState.newHadoopConf())
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRowGroups.size == 1 &&
          r.getFooter.getBlocks.get(0).getRowCount >= MinSplitRows
        finally r.close()
      } catch { case _: Exception => false })
  }

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
