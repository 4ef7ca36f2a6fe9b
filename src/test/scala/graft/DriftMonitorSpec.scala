package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.DriftMonitor

/** The streaming corpus-drift monitor: a quiet stream accumulates
  * nothing, a SUSTAINED shift (each batch individually within one
  * slack-and-a-bit of baseline) accumulates to an alarm, replayed
  * epochs are marker-skipped (CUSUM is a sum — not redelivery-
  * idempotent), and the scratch-swap recovers from its crash window.
  */
class DriftMonitorSpec extends SparkSuite {
  import spark.implicits._

  // quality ≥ 3 by construction: 14 tokens, stopwords, sane shape
  private def good(i: Long): (Long, String) =
    (i, s"the quick brown fox jumps over a lazy dog near the old barn w$i")
  // quality < 3 and short: 1 opaque token
  private def bad(i: Long): (Long, String) = (i, "zz")

  private def mix(nGood: Int, nBad: Int, base: Long): DataFrame =
    ((0 until nGood).map(i => good(base + i)) ++
      (0 until nBad).map(i => bad(base + 1000 + i)))
      .toDF("doc_id", "text")

  test("drift monitor: quiet → quiet, sustained shift accumulates to alarm, replay skipped, swap recovers") {
    val name = "t_drift_mon"
    // baseline: 80% good → quality_rate 8000, short_doc_rate 2000
    DriftMonitor.writeProfile(mix(80, 20, 0L), name)
    val prof = spark.table(DriftMonitor.profileTable(name)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prof("quality_rate") == 8000L, prof)
    assert(prof("short_doc_rate") == 2000L, prof)
    assert(prof("null_text_rate") == 0L, prof)

    val events = new ConcurrentLinkedQueue[DriftMonitor.DriftEvent]()
    val srcDir = java.nio.file.Files.createTempDirectory("drift-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("drift-ckpt").toString
    val docsSchema = mix(1, 0, 0L).schema
    def start(ck: String = ckpt) = DriftMonitor.maintain(
      spark.readStream.schema(docsSchema).parquet(srcDir), name, ck,
      slack = 200L, threshold = 2000L, onBatch = events.add(_))
    def feed(df: DataFrame): Unit =
      df.write.mode("append").parquet(srcDir)

    // batch 0: on-profile mix → deviations 0, nothing accumulates
    feed(mix(40, 10, 100L))
    val q0 = start(); q0.processAllAvailable(); q0.stop()
    // batches 1–3: sustained mild shift (quality 8000 → 7000, short
    // 2000 → 3000): each batch adds 800 past slack; threshold 2000
    // crosses on the THIRD shifted batch, not before
    feed(mix(35, 15, 200L))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    feed(mix(35, 15, 300L))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    feed(mix(35, 15, 400L))
    val q3 = start(); q3.processAllAvailable(); q3.stop()

    val evs = events.asScala.toSeq
    assert(evs.map(_.action) == Seq.fill(4)("merged"), evs)
    assert(evs(0).alarms.isEmpty && evs(1).alarms.isEmpty &&
      evs(2).alarms.isEmpty, evs)
    assert(evs(3).alarms == Seq("quality_rate", "short_doc_rate"), evs)

    val st = DriftMonitor.currentState(spark, name, threshold = 2000L)
      .collect().map(r => r.getString(0) -> r).toMap
    val qr = st("quality_rate")
    assert(qr.getLong(qr.fieldIndex("s_dn")) == 2400L, qr)
    assert(qr.getLong(qr.fieldIndex("s_up")) == 0L, qr)
    assert(qr.getBoolean(qr.fieldIndex("alarmed")), qr)
    assert(qr.getLong(qr.fieldIndex("n_batches")) == 4L, qr)
    val sr = st("short_doc_rate")
    assert(sr.getLong(sr.fieldIndex("s_up")) == 2400L, sr)
    assert(sr.getBoolean(sr.fieldIndex("alarmed")), sr)
    val nr = st("null_text_rate")
    assert(!nr.getBoolean(nr.fieldIndex("alarmed")), nr)

    // the PURE batch replay folds to exactly the streamed state
    // (stream ≡ cusumTrajectory on the same ordered batches)
    val traj = DriftMonitor.cusumTrajectory(
      Seq(mix(40, 10, 100L), mix(35, 15, 200L), mix(35, 15, 300L),
        mix(35, 15, 400L)),
      spark.table(DriftMonitor.profileTable(name))
        .select(col("metric"), col("mu")))
      .filter(col("batch_idx") === 3L).collect()
      .map(r => r.getString(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(traj("quality_rate") == (0L, 2400L), traj)
    assert(traj("short_doc_rate") == (2400L, 0L), traj)
    assert(traj("null_text_rate") == (0L, 0L), traj)

    // carry-forward through an ABSENT metric: an all-null batch emits
    // no quality/short rows (no signal ≠ zero), but their CUSUM state
    // survives it and resumes at the next present batch
    val nullBatch = Seq((9000L, null.asInstanceOf[String]),
      (9001L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val traj2 = DriftMonitor.cusumTrajectory(
      Seq(mix(35, 15, 500L), nullBatch, mix(35, 15, 600L)),
      spark.table(DriftMonitor.profileTable(name))
        .select(col("metric"), col("mu"))).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(traj2((0L, "quality_rate"))._2 == 800L, traj2)
    assert(!traj2.contains((1L, "quality_rate")), traj2)
    assert(traj2((1L, "null_text_rate"))._1 == 9800L, traj2)
    assert(traj2((2L, "quality_rate"))._2 == 1600L, traj2)
    assert(traj2((2L, "null_text_rate"))._1 == 9600L, traj2)

    // marker compaction: four applied epochs leave ONE high-water
    // marker row (state size is lifetime-independent), at epoch 3
    val markers = spark.table(DriftMonitor.stateTable(name))
      .filter(col("kind") === "e").select("epoch")
      .collect().map(_.getLong(0)).toSeq
    assert(markers == Seq(3L), markers)

    // REDELIVERY: fresh checkpoint re-batches history as epoch 0 —
    // the marker skips it, no CUSUM moves (a sum WOULD double-count)
    val before = spark.table(DriftMonitor.stateTable(name))
      .collect().map(_.toSeq).toSet
    val ck2 = java.nio.file.Files.createTempDirectory("drift-ck2").toString
    val q4 = start(ck2); q4.processAllAvailable(); q4.stop()
    assert(events.asScala.toSeq.map(_.action).contains("skipped_replay"),
      events.asScala.toSeq.toString)
    assert(spark.table(DriftMonitor.stateTable(name))
      .collect().map(_.toSeq).toSet == before,
      "replayed epoch must move no state")

    // interrupted swap: crash landed between DROP and RENAME
    val live = DriftMonitor.stateTable(name)
    spark.sql(s"ALTER TABLE $live RENAME TO ${live}__merge")
    assert(DriftMonitor.recover(spark, name))
    assert(spark.table(live).collect().map(_.toSeq).toSet == before)
    assert(!DriftMonitor.recover(spark, name))

    // no profile → loud failure, not a silently unmonitored stream
    intercept[IllegalArgumentException] {
      DriftMonitor.maintain(
        spark.readStream.schema(docsSchema).parquet(srcDir),
        "t_drift_unprofiled", ckpt)
    }
  }

  test("composed curation stream: drift gate observes novel batches, alarms on sustained shift, drops nothing") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{CurationStream, ManifestStore}
    val name = "t_cur_drift"
    // distinct texts throughout, and good docs mutually BELOW the
    // gate's 0.8 near-dup Jaccard (three unique tail tokens → 11/17
    // shared shingles ≈ 0.65) — the dedup gate upstream of the monitor
    // must admit every doc, or the observed rates would be
    // post-collapse, not the batch's own
    def cgood(i: Long) = (i,
      s"the quick brown fox jumps over a lazy dog near the old barn " +
        s"x$i y$i z$i", 0)
    def cbad(i: Long) = (i, s"zz$i", 0)
    def cmix(nGood: Int, nBad: Int, base: Long) =
      (0 until nGood).map(i => cgood(base + i)) ++
        (0 until nBad).map(i => cbad(base + 1000 + i))
    DriftMonitor.writeProfile(
      cmix(80, 20, 50000L).toDF("doc_id", "text", "source_id")
        .select(col("doc_id"), col("text")), name)
    val dimDir = java.nio.file.Files.createTempDirectory("cd-dim").toString
    ManifestStore.seed(Seq((0, "crawlA")).toDF("source_id", "source"),
      "source_id", dimDir)
    val drifts = new ConcurrentLinkedQueue[DriftMonitor.DriftEvent]()
    val curated = new ConcurrentLinkedQueue[Long]()
    val ms = MemoryStream[(Long, String, Int)]
    val q = CurationStream.run(
      ms.toDF().toDF("doc_id", "text", "source_id"), "t_cur_drift_store",
      dimDir, "source_id",
      java.nio.file.Files.createTempDirectory("cd-ckpt").toString,
      driftGate = Some(CurationStream.DriftGate(name, slack = 200L,
        threshold = 1500L, onDrift = drifts.add(_)))) { (out, _) =>
      out.select("doc_id").collect().foreach(r => curated.add(r.getLong(0)))
    }
    try {
      ms.addData(cmix(40, 10, 100L): _*); q.processAllAvailable()
      ms.addData(cmix(35, 15, 200L): _*); q.processAllAvailable()
      ms.addData(cmix(35, 15, 300L): _*); q.processAllAvailable()
    } finally q.stop()
    val evs = drifts.asScala.toSeq.sortBy(_.epoch)
    assert(evs.map(_.action) == Seq("merged", "merged", "merged"), evs)
    assert(evs(0).alarms.isEmpty && evs(1).alarms.isEmpty, evs)
    // two shifted batches × 800 past slack = 1600 > 1500: both rate
    // pages alarm on the SECOND shifted batch
    assert(evs(2).alarms == Seq("quality_rate", "short_doc_rate"), evs)
    // observability only: every good doc still reached the sink
    assert(curated.asScala.toSet.count(_ < 1000L) == 110, // 40+35+35
      s"curated: ${curated.asScala.size}")
    // unprofiled composed stream fails at START
    intercept[IllegalArgumentException] {
      CurationStream.run(
        ms.toDF().toDF("doc_id", "text", "source_id"), "t_cur_drift_s2",
        dimDir, "source_id",
        java.nio.file.Files.createTempDirectory("cd-ck2").toString,
        driftGate = Some(CurationStream.DriftGate("t_cur_noprofile"))) {
        (_, _) => ()
      }
    }
  }

  test("drift monitor metrics: all-null batch carries no quality signal; null rate still reads") {
    val df = Seq((1L, null: String), (2L, null: String))
      .toDF("doc_id", "text")
    val m = DriftMonitor.metrics(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("null_text_rate" -> 10000L), m)
  }
}
