package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Dedup, FreqSketch}
import graft.streaming.SketchStream

/** Streaming HLL maintenance: the persisted registers equal a single
  * batch build over everything ingested (the max-merge law), replayed
  * data is a no-op by algebra (no markers involved), and an
  * interrupted scratch-swap recovers.
  */
class SketchStreamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def batchRegisters(docs: org.apache.spark.sql.DataFrame) =
    FreqSketch.hllRegisters(
      docs.filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("source").as("group"),
          explode(Dedup.shingleHashes(col("text"), 3)).as("h")),
      col("group"), col("h"))

  test("streaming HLL: maintained registers are bit-identical to a batch build; redelivery is an algebraic no-op") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "source").localCheckpoint()
    val events = new ConcurrentLinkedQueue[SketchStream.SketchEvent]()
    val srcDir = java.nio.file.Files.createTempDirectory("hlls-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hlls-ckpt").toString
    def start() = SketchStream.maintainHll(
      spark.readStream.schema(docs.schema).parquet(srcDir), "t_hll_stream",
      ckpt, onBatch = events.add(_))

    // two batches with a stream restart between them
    docs.filter(col("doc_id") < 120).write.mode("append").parquet(srcDir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    docs.filter(col("doc_id") >= 120).write.mode("append").parquet(srcDir)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(events.asScala.map(_.action).toSeq == Seq("merged", "merged"))

    val maintained = spark.table(SketchStream.registersTable("t_hll_stream"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val reference = batchRegisters(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained == reference,
      "maintained registers must equal a single batch build")

    // estimates flow straight off the maintained table
    val est = SketchStream.distinctEstimate(spark, "t_hll_stream")
    val ref = FreqSketch.hllEstimate(batchRegisters(docs))
    assert(est.collect().map(_.toSeq).toSet ==
      ref.collect().map(_.toSeq).toSet)

    // REDELIVERY: the whole corpus arrives again — max-merge absorbs it
    docs.write.mode("append").parquet(srcDir)
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    val after = spark.table(SketchStream.registersTable("t_hll_stream"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(after == reference, "replayed data must not move any register")
  }

  test("streaming HLL: an interrupted scratch-swap recovers (crash between DROP and RENAME)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta", "s1"),
        (2L, "epsilon zeta eta theta", "s2"))
      .toDF("doc_id", "text", "source")
    val srcDir = java.nio.file.Files.createTempDirectory("hllr-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hllr-ckpt").toString
    docs.write.mode("append").parquet(srcDir)
    val q = SketchStream.maintainHll(
      spark.readStream.schema(docs.schema).parquet(srcDir),
      "t_hll_crash", ckpt)
    q.processAllAvailable(); q.stop()
    val live = SketchStream.registersTable("t_hll_crash")
    val before = spark.table(live).collect().map(_.toSeq).toSet
    // simulate the crash window: registers live only in the scratch
    spark.sql(s"ALTER TABLE $live RENAME TO ${live}__merge")
    assert(!spark.catalog.tableExists(live))
    assert(SketchStream.recoverRegisters(spark, "t_hll_crash"))
    assert(spark.table(live).collect().map(_.toSeq).toSet == before)
    assert(!SketchStream.recoverRegisters(spark, "t_hll_crash"))
  }
}
