package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame

object CheckpointRecoverySpec {
  val delivered = new ConcurrentLinkedQueue[Long]()
}

/** Delivery semantics (SURVEY §2.8): Structured Streaming's checkpoint
  * gives exactly-once progress tracking to an idempotent sink — a
  * RESTARTED query must resume after the last committed batch, neither
  * re-delivering old rows nor skipping new ones. This is the analog of
  * the reference's consumer-group offset commit behavior.
  */
class CheckpointRecoverySpec extends SparkSuite {

  test("restarted query resumes from checkpoint: no redelivery, no loss") {
    import spark.implicits._
    CheckpointRecoverySpec.delivered.clear()
    val srcDir = java.nio.file.Files.createTempDirectory("graft-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString

    def startQuery() = spark.readStream
      .schema(ratingsDf.schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("RATING_ID").collect()
          .foreach(r => CheckpointRecoverySpec.delivered.add(r.getLong(0)))
      }.start()

    // epoch 1: first half of the corpus
    Fixtures.ratings.take(6).toDF()
      .write.mode("append").parquet(srcDir)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    val afterFirst = CheckpointRecoverySpec.delivered.asScala.toVector
    assert(afterFirst.sorted == (1L to 6L).toVector, s"got $afterFirst")

    // epoch 2: new files arrive while no query is running; a NEW query
    // instance restarts from the same checkpoint
    Fixtures.ratings.drop(6).toDF()
      .write.mode("append").parquet(srcDir)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val all = CheckpointRecoverySpec.delivered.asScala.toVector
    // no loss: every rating delivered; no redelivery: each exactly once
    assert(all.sorted == (1L to 12L).toVector,
      s"expected exactly-once delivery of 1..12, got ${all.sorted}")
  }
}
