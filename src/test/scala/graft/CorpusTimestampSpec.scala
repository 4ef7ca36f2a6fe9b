package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.core.Tables
import graft.ops.TemporalJoins
import graft.sinks.EsBulkNdjsonSink

/** Timestamp-ENCODING regression tests against the REAL driver corpus.
  *
  * Round 12's lesson: the in-memory fixtures are always TimestampType,
  * so nothing caught the corpus regenerating as parquet TIMESTAMP_MICROS
  * `isAdjustedToUTC=false` — which Spark 4's default
  * `inferTimestampNTZ` reads as TIMESTAMP_NTZ, crashing every
  * `unix_micros`/`cast(.. as long)` dispatch and silently changing
  * `to_json` rendering (5 queries crashed, k_es_bulk hash-flipped).
  * These tests load the actual `/root/testdata/sf0.001/events.parquet`
  * BOTH ways — as the engine's sessions read it (NTZ inference off →
  * TimestampType) and as a user-built default session would (NTZ) — and
  * assert the temporal operators and the ES serialization rule produce
  * IDENTICAL results on both encodings.
  */
class CorpusTimestampSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def corpusPresent: Boolean =
    new java.io.File(s"$dir/events.parquet").exists()

  /** The corpus events table with `ts` as TIMESTAMP_NTZ — what a session
    * WITHOUT Sessions.build's conf would see. If the generator ever
    * switches back to UTC-adjusted micros the read yields TimestampType;
    * the cast keeps the NTZ code path exercised regardless.
    */
  private def eventsNtz: DataFrame = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try {
      val df = spark.read.parquet(s"$dir/events.parquet")
      if (df.schema("ts").dataType == TimestampNTZType) df
      else df.withColumn("ts", col("ts").cast(TimestampNTZType))
    } finally
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  /** Same rows, engine encoding (TimestampType). */
  private def eventsTz: DataFrame = Tables.events(spark, dir)

  test("engine sessions read the corpus ts as TimestampType (NTZ inference off + loader normalization)") {
    assume(corpusPresent)
    assert(eventsTz.schema("ts").dataType == TimestampType,
      "Tables.events must hand downstream operators TimestampType " +
        s"regardless of the parquet writer's encoding; got ${eventsTz.schema("ts").dataType}")
  }

  /** asof fixtures: left = raw events, right = per-(user, ts) latest
    * value (the uniqueness contract), built from whichever encoding. */
  private def asofSides(ev: DataFrame): (DataFrame, DataFrame) = {
    val left = ev.select(col("event_id"), col("user_id"), col("ts")).limit(3000)
    val right = ev.groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("state"))
    (left, right)
  }

  test("asofJoin tolerance + nearest: NTZ corpus encoding matches TimestampType bit-for-bit") {
    assume(corpusPresent)
    def run(ev: DataFrame, direction: String): Set[String] = {
      val (l, r) = asofSides(ev)
      TemporalJoins.asofJoin(l, r, Seq("user_id"), "ts", "ts",
          tolerance = Some(3600L * 1000000L), direction = direction)
        .select(col("event_id"), col("state"))
        .collect().map(_.toString).toSet
    }
    for (d <- Seq("backward", "forward", "nearest")) {
      val tz = run(eventsTz, d)
      val ntz = run(eventsNtz, d)
      assert(tz.nonEmpty, s"direction=$d produced no rows")
      assert(ntz == tz, s"direction=$d: NTZ result diverges from TimestampType")
    }
  }

  test("rangeJoin inner + left_outer: NTZ time/bound columns match TimestampType") {
    assume(corpusPresent)
    def run(ev: DataFrame, joinType: String): Set[String] = {
      val left = ev.select(col("event_id"), col("user_id"), col("ts")).limit(3000)
      // intervals: one 10-minute window per (user, ts) sampled from the
      // same table — NTZ + interval arithmetic stays NTZ, so the bound
      // columns exercise the NTZ branch of toMicros
      val right = ev.groupBy(col("user_id"),
          col("ts").as("w_start"))
        .agg(count(lit(1)).as("w_n"))
        .withColumn("w_end", col("w_start") + expr("INTERVAL 10 MINUTES"))
        .limit(2000)
      TemporalJoins.rangeJoin(left, right, Seq("user_id"),
          timeCol = "ts", startCol = "w_start", endCol = "w_end",
          joinType = joinType)
        .select(col("event_id"), col("w_n"))
        .collect().map(_.toString).toSet
    }
    for (jt <- Seq("inner", "left_outer")) {
      val tz = run(eventsTz, jt)
      val ntz = run(eventsNtz, jt)
      assert(tz.nonEmpty, s"joinType=$jt produced no rows")
      assert(ntz == tz, s"joinType=$jt: NTZ result diverges from TimestampType")
    }
  }

  test("ES bulk serialization: NTZ timestamps render ISO-8601 with Z, identical to TimestampType") {
    assume(corpusPresent)
    def render(ev: DataFrame): Seq[String] = {
      val df = ev.select(col("event_id"), col("ts").as("RATING_TS"))
        .orderBy(col("event_id")).limit(50)
      EsBulkNdjsonSink.bulkLines(df, "idx", "event_id")
        .select("doc").collect().map(_.getString(0)).toSeq
    }
    val tz = render(eventsTz)
    val ntz = render(eventsNtz)
    assert(tz.nonEmpty && tz.head.contains("Z\""),
      s"ISO-8601 UTC rendering must carry the Z suffix: ${tz.head}")
    assert(ntz == tz, "NTZ RATING_TS must serialize exactly like TimestampType")
  }

  test("p_timestamp_format's expression survives an NTZ ts column") {
    assume(corpusPresent)
    def run(ev: DataFrame): Seq[String] =
      ev.orderBy(col("event_id")).limit(20)
        .select(graft.functions.timestampToString(
          expr("unix_micros(cast(ts as timestamp)) div 1000"),
          "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .collect().map(_.getString(0)).toSeq
    val tz = run(eventsTz)
    assert(tz.nonEmpty && tz.forall(_.matches("\\d{4}-\\d{2}-\\d{2} .*")))
    assert(run(eventsNtz) == tz)
  }
}
