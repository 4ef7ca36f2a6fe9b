package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.IngestDedupGate

object IngestGateSpec {
  val admitted = new ConcurrentLinkedQueue[Long]()
}

/** Streaming ingest dedup gate: redelivered / exact / near-dup documents
  * are dropped against the persisted signature store; novel documents
  * reach the sink and extend the store; a restarted query resumes from
  * its checkpoint without re-admitting committed documents.
  */
class IngestGateSpec extends SparkSuite {

  private val base = (1 to 40).map(i => s"w$i").toArray
  private val docA = base.mkString(" ")
  private val nearA = { val w = base.clone(); w(19) = "zz"; w.mkString(" ") } // 35/41 ≈ 0.85
  private val docC = "totally different text about catalyst optimizer rule batches"
  private val docD = "another unrelated body mentioning shuffle partitions and whole stage codegen"

  test("gate admits novel docs, drops redelivered ids, exact copies and near-dups of stored content") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    IngestGateSpec.admitted.clear()
    val name = "t_gate_mem"
    val ckpt = java.nio.file.Files.createTempDirectory("gate-ckpt").toString
    val ms = MemoryStream[(Long, String)]
    val q = IngestDedupGate.gate(ms.toDF().toDF("doc_id", "text"), name, ckpt) {
      (novel, _) =>
        novel.select("doc_id").collect()
          .foreach(r => IngestGateSpec.admitted.add(r.getLong(0)))
    }
    try {
      // batch 1: two novel docs, one exact in-batch copy (id 10), one
      // in-batch NEAR-dup (id 5, near docA) — only the min ids pass
      ms.addData((1L, docA), (2L, docC), (10L, docA), (5L, nearA))
      q.processAllAvailable()
      val after1 = IngestGateSpec.admitted.asScala.toSet
      assert(after1 == Set(1L, 2L), s"batch-1 admit set wrong: $after1")

      // batch 2: 1 redelivered (same id), an exact copy under a new id,
      // a near-dup of doc 1, and one genuinely new doc
      ms.addData((1L, docA), (11L, docA), (3L, nearA), (4L, docD))
      q.processAllAvailable()
      val after2 = IngestGateSpec.admitted.asScala.toSet
      assert(after2 == Set(1L, 2L, 4L), s"batch-2 admit set wrong: $after2")
    } finally q.stop()

    // the store holds exactly the admitted signatures
    import spark.implicits._
    val stored = spark.table(IngestDedupGate.featsTable(name))
      .select("doc_id").as[Long].collect().toSet
    assert(stored == Set(1L, 2L, 4L), s"store contents wrong: $stored")

    // replay idempotence at the unit level: the same docs re-offered
    // against the store all match themselves (Jaccard 1) and none pass
    val replay = IngestDedupGate.filterNovel(
      Seq((1L, docA), (2L, docC), (4L, docD)).toDF("doc_id", "text"), name)
    assert(replay.count() == 0, "replayed batch must admit nothing")
  }

  test("gate restart resumes from checkpoint: committed docs not re-admitted, new docs not lost") {
    import spark.implicits._
    IngestGateSpec.admitted.clear()
    val name = "t_gate_restart"
    val srcDir = java.nio.file.Files.createTempDirectory("gate-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gate-ckpt2").toString
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema

    def startGate() = IngestDedupGate.gate(
      spark.readStream.schema(schema).parquet(srcDir), name, ckpt) {
      (novel, _) =>
        novel.select("doc_id").collect()
          .foreach(r => IngestGateSpec.admitted.add(r.getLong(0)))
    }

    Seq((1L, docA), (2L, docC)).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    val q1 = startGate()
    q1.processAllAvailable(); q1.stop()
    assert(IngestGateSpec.admitted.asScala.toSet == Set(1L, 2L))

    // while stopped: a file with a near-dup of committed content plus a
    // new doc; the restarted query must process ONLY the new file
    Seq((3L, nearA), (4L, docD)).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    val q2 = startGate()
    q2.processAllAvailable(); q2.stop()
    val all = IngestGateSpec.admitted.asScala.toVector
    assert(all.sorted == Vector(1L, 2L, 4L),
      s"restart must neither re-admit nor lose: $all")
  }
}
