package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermark / late-data semantics (SURVEY §2.8, §7.5 #3): the
  * reference declares no watermark (ksqlDB re-emits updated windows);
  * our engine takes an explicit watermark. These tests pin the chosen
  * behavior so the deviation is documented executable fact:
  *
  *  - append mode: a window's result emits only after the watermark
  *    passes its end; events later than the watermark are DROPPED;
  *  - update mode (`EMIT CHANGES` parity): late-but-within-watermark
  *    events re-emit the updated window, like ksqlDB's changelog.
  */
class WatermarkSpec extends SparkSuite {

  test("append mode drops events later than the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Rating]
    val agg = ms.toDF().withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("start"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_append")
      .outputMode("append").start()
    try {
      // batch 1: events at 10:00 and 10:30 → watermark advances to 10:25
      ms.addData(
        Rating(1, 1, 3.0, "ios", "m", ts("2024-01-01 10:00:30")),
        Rating(2, 1, 3.0, "ios", "m", ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      // batch 2: a VERY late event for the 10:00 window (< watermark)
      ms.addData(Rating(3, 1, 3.0, "ios", "m", ts("2024-01-01 10:00:40")))
      q.processAllAvailable()
      // batch 3: advance watermark far so all open windows close
      ms.addData(Rating(4, 1, 3.0, "ios", "m", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()

      val out = spark.table("wm_append")
        .as[(java.sql.Timestamp, Long)].collect().toMap
      // the 10:00 window emitted with ONLY the on-time event — the late
      // rating 3 was dropped, not merged, not re-emitted
      assert(out(ts("2024-01-01 10:00:00")) == 1L, s"got $out")
    } finally q.stop()
  }

  test("update mode re-emits a window updated by late-but-allowed data") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Rating]
    val agg = ms.toDF().withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("start"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_update")
      .outputMode("update").start()
    try {
      ms.addData(Rating(1, 1, 3.0, "ios", "m", ts("2024-01-01 10:00:10")))
      q.processAllAvailable()
      // late by 10 min — within the 30-min watermark: window re-emits
      ms.addData(Rating(2, 1, 3.0, "ios", "m", ts("2024-01-01 10:00:50")))
      q.processAllAvailable()
      val emissions = spark.table("wm_update")
        .filter(col("start") === ts("2024-01-01 10:00:00"))
        .as[(java.sql.Timestamp, Long)].collect().map(_._2).sorted.toSeq
      // changelog: first emission n=1, updated emission n=2 (EMIT CHANGES)
      assert(emissions == Seq(1L, 2L), s"got $emissions")
    } finally q.stop()
  }

  test("streaming exact dedup: duplicate ids across micro-batches emit once") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Rating]
    val deduped = graft.ext.Dedup.streamingExact(
      ms.toDF().withWatermark("ts", "1 hour"), "RATING_ID")
    val q = deduped.writeStream.format("memory").queryName("dedup_s")
      .outputMode("append").start()
    try {
      // the same rating delivered twice in one batch and again in the next
      // (at-least-once redelivery shape)
      ms.addData(
        Rating(1, 1, 3.0, "ios", "m", ts("2024-01-01 10:00:00")),
        Rating(1, 1, 3.0, "ios", "m", ts("2024-01-01 10:00:00")),
        Rating(2, 2, 4.0, "web", "n", ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      ms.addData(Rating(1, 1, 3.0, "ios", "m", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      val ids = spark.table("dedup_s").select("RATING_ID")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L), s"got $ids")
    } finally q.stop()
  }

  test("stream-stream interval join: follow-up ratings within 30 min correlate") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // beyond the reference surface (SURVEY §2.4 notes no stream-stream
    // joins there) but table-stakes for a Spark streaming engine:
    // watermarked interval self-join — first rating ⋈ its follow-ups
    val ms = MemoryStream[Rating]
    val first = ms.toDF().withWatermark("ts", "1 hour")
      .select(col("USER_ID").as("u1"), col("RATING_ID").as("first_id"),
        col("ts").as("t1"))
    val follow = ms.toDF().withWatermark("ts", "1 hour")
      .select(col("USER_ID").as("u2"), col("RATING_ID").as("follow_id"),
        col("ts").as("t2"))
    val joined = first.join(follow,
      col("u1") === col("u2") &&
        col("t2") > col("t1") &&
        col("t2") <= col("t1") + expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      ms.addData(
        Rating(1, 7, 1.0, "ios", "bad", ts("2024-01-01 10:00:00")),
        Rating(2, 7, 2.0, "ios", "still bad", ts("2024-01-01 10:10:00")),
        Rating(3, 7, 5.0, "ios", "too late", ts("2024-01-01 11:30:00")),
        Rating(4, 9, 3.0, "web", "other user", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val pairs = spark.table("ss_join")
        .select("first_id", "follow_id").as[(Long, Long)].collect().toSet
      // only (1 → 2): same user, within 30 min; 3 is outside the
      // interval and 4 is another user
      assert(pairs == Set((1L, 2L)), s"got $pairs")
    } finally q.stop()
  }

  test("file-backed streaming source drives the pipeline (production ingestion shape)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-filestream").toString
    ratingsDf.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ratingsDf.schema).parquet(dir)
    val pipe = graft.streaming.RatingsPipeline(stream, customersDf,
      watermark = "0 seconds")
    val q = pipe.unhappyPlatinum.writeStream.format("memory")
      .queryName("fs_unhappy").outputMode("append").start()
    try {
      q.processAllAvailable()
      val expected = graft.ops.RatingsOps.unhappyPlatinum(
        graft.ops.RatingsOps.enrich(ratingsDf, customersDf)).count()
      assert(spark.table("fs_unhappy").count() == expected)
    } finally q.stop()
  }
}
