package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Similarity
import graft.streaming.AnnIndexStream

/** Streaming ANN index maintenance: per-batch delta appends keep a
  * persisted index searchable as vectors ingest; the drift gate flips an
  * out-of-distribution batch into a re-train + rebuild; epoch markers +
  * the presence probe make redelivered batches no-ops.
  */
class AnnIndexStreamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def corpusPresent = new java.io.File(s"$sf/embeddings.parquet").exists()

  test("streaming LSH maintenance: maintained index is bit-identical to a full rebuild; restart and redelivery are no-ops") {
    assume(corpusPresent)
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").localCheckpoint()
    val events = new ConcurrentLinkedQueue[AnnIndexStream.MaintainEvent]()
    val srcDir = java.nio.file.Files.createTempDirectory("annls-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("annls-ckpt").toString

    Similarity.buildLshIndex(emb.filter(col("vec_id") < 250), "t_lsh_stream",
      planes = 4, dims = 64)
    def start() = AnnIndexStream.maintainLsh(
      spark.readStream.schema(emb.schema).parquet(srcDir), "t_lsh_stream",
      ckpt, planes = 4, dims = 64, onBatch = events.add(_))

    // batch 1 ingests [250, 350); restart; batch 2 ingests the rest
    emb.filter(col("vec_id") >= 250 && col("vec_id") < 350)
      .write.mode("append").parquet(srcDir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    emb.filter(col("vec_id") >= 350).write.mode("append").parquet(srcDir)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(events.asScala.map(_.action).toSeq == Seq("appended", "appended"),
      events.asScala.toSeq.toString)

    // every streamed vector landed: tables × |corpus| bucket rows (the
    // catalog-refresh regression guard — the owning session must see
    // files appended from the microbatch's cloned session)
    assert(spark.table("t_lsh_stream_buckets").count() == 8L * emb.count(),
      "streamed appends must be visible to the owning session")
    val got = Similarity.annTopKIndexed(spark, "t_lsh_stream",
      Seq(0L, 1L, 2L), 5)
    Similarity.buildLshIndex(emb, "t_lsh_stream_ref", planes = 4, dims = 64)
    val ref = Similarity.annTopKIndexed(spark, "t_lsh_stream_ref",
      Seq(0L, 1L, 2L), 5)
    assert(rows(got) == rows(ref), "maintained index must equal full rebuild")
    assert(rows(got).nonEmpty)

    // REDELIVERY: the same vectors arrive again under a new epoch — the
    // presence probe drops them all, the index does not grow
    val before = spark.table("t_lsh_stream_buckets").count()
    emb.filter(col("vec_id") >= 350).write.mode("append").parquet(srcDir)
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    assert(spark.table("t_lsh_stream_buckets").count() == before,
      "redelivered vectors must not duplicate index rows")
    assert(events.asScala.last.deltaRows == 0L, events.asScala.last.toString)
  }

  test("streaming IVF maintenance: frozen-quantizer appends until the drift gate trips a rebuild") {
    import spark.implicits._
    // CLUSTERED synthetic corpus (the shape where an IVF drift gate is
    // meaningful — on a near-uniform corpus every cosine assign
    // distance sits at ~0.9 of the ceiling and no delta can move the
    // ratio): two tight clusters on the e1/e2 axes; the drift batch
    // lives on e3, far outside anything the quantizer has seen.
    def cluster(axis: Int, ids: Range): Seq[(Long, Array[Float])] =
      ids.map { i =>
        val v = Array.fill(4)(0.001f * (i % 7))
        v(axis) = 1f
        (i.toLong, v)
      }
    val first = (cluster(0, 0 until 100) ++ cluster(1, 100 until 200))
      .toDF("vec_id", "embedding")
    val rest = (cluster(0, 200 until 250) ++ cluster(1, 250 until 300))
      .toDF("vec_id", "embedding")
    val drifted = cluster(2, 100000 until 100100).toDF("vec_id", "embedding")
    val all = first.unionByName(rest)

    val events = new ConcurrentLinkedQueue[AnnIndexStream.MaintainEvent]()
    val srcDir = java.nio.file.Files.createTempDirectory("anniv-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("anniv-ckpt").toString

    Similarity.buildIvfIndex(first, "t_ivf_stream", centroids = 2)
    val centsBefore = spark.table("t_ivf_stream_centroids").collect().toSet
    def start() = AnnIndexStream.maintainIvf(
      spark.readStream.schema(first.schema).parquet(srcDir), "t_ivf_stream",
      ckpt, onBatch = events.add(_))

    // batch 1: in-distribution delta → appended under the FROZEN quantizer
    rest.write.mode("append").parquet(srcDir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(events.asScala.head.action == "appended", events.asScala.toSeq.toString)
    assert(events.asScala.head.deltaRows == 100L, events.asScala.head.toString)
    assert(spark.table("t_ivf_stream_lists").count() == 300L,
      "append must add exactly the delta to the inverted lists")
    assert(spark.table("t_ivf_stream_centroids").collect().toSet == centsBefore,
      "append must not touch the trained quantizer")
    // search equals assign-everything-at-once under the same quantizer
    val cents = Similarity.trainCentroids(first, 2)
    val ref = Similarity.searchAssigned(
      Similarity.assignCells(all, cents), cents, Seq(0L, 200L), 5, nProbe = 2)
    val got = Similarity.ivfTopKIndexed(spark, "t_ivf_stream",
      Seq(0L, 200L), 5, nProbe = 2)
    assert(rows(got) == rows(ref), "streamed appends must equal frozen-quantizer reference")
    assert(rows(got).nonEmpty)

    // batch 2: the e3 cluster the quantizer has never seen → the DEFAULT
    // drift gate trips and the batch loop REBUILDS (re-trained quantizer
    // over indexed ∪ delta, the indexed side recovered from the index's
    // own inverted lists)
    drifted.write.mode("append").parquet(srcDir)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val last = events.asScala.last
    assert(last.action == "rebuilt" && last.kind == "ivf", last.toString)
    assert(last.maxMeanRatio > Similarity.DefaultMaxDriftRatio, last.toString)
    assert(spark.table("t_ivf_stream_centroids").collect().toSet != centsBefore,
      "rebuild must re-train the quantizer")
    assert(spark.table("t_ivf_stream_lists").count() == 400L,
      "rebuild must index everything ingested, exactly once")
    // post-rebuild search is green across both regions
    val hits = Similarity.ivfTopKIndexed(spark, "t_ivf_stream",
      Seq(0L, 100000L), 5, nProbe = 2)
    assert(hits.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == 5L))

    // contract: a PQ-bearing index is rejected up front (its rebuild
    // corpus is not recoverable from code tables)
    if (corpusPresent) {
      Similarity.buildIvfPqIndex(
        Tables.embeddings(spark, sf).select("vec_id", "embedding"),
        "t_ivfpq_stream_guard", centroids = 8)
      val e = intercept[IllegalArgumentException] {
        AnnIndexStream.maintainIvf(
          spark.readStream.schema(first.schema).parquet(srcDir),
          "t_ivfpq_stream_guard", ckpt)
      }
      assert(e.getMessage.contains("codebooks"), e.getMessage)
    }
  }
}
