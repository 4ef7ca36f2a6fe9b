package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.Sessions
import graft.streaming.RatingsPipeline

/** Streaming throughput benchmark: drains N synthetic ratings through
  * the full pipeline (filter split → broadcast enrich → two windowed
  * aggregations) and reports events/second.
  *
  * Context (BASELINE.md): the reference's generator floor is ~1.33
  * events/s through ksqlDB; this measures the engine's single-node
  * streaming throughput on the same topology shape.
  *
  * Usage: runMain graft.StreamBench [nEvents] [batches]
  */
object StreamBench {
  final case class R(RATING_ID: Long, USER_ID: Int, STARS: Double,
                     CHANNEL: String, MESSAGE: String, ts: java.sql.Timestamp)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.build("graft-stream-bench", cpus)
    implicit val sql = spark.sqlContext
    import spark.implicits._

    val channels = Array("ios", "android", "web", "ios-test")
    val base = 1704100000000L
    def mkBatch(b: Int, size: Int): Seq[R] =
      (0 until size).map { i =>
        val id = b.toLong * size + i
        R(id, (id % 200).toInt + 1, (id % 5).toDouble + 1,
          channels((id % 4).toInt), s"msg$id",
          new java.sql.Timestamp(base + id * 100))
      }
    // Warm-up events sit strictly BEFORE the timed range: if they were
    // later, the watermark would advance past every timed event and the
    // stateful aggregations would late-drop all timed data — the bench
    // would measure filter-and-discard, not windowed aggregation.
    def warmupBatch(size: Int): Seq[R] =
      (0 until size).map { i =>
        R(-1L - i, (i % 200) + 1, (i % 5).toDouble + 1,
          channels(i % 4), s"warm$i",
          new java.sql.Timestamp(base - (size - i).toLong * 100))
      }

    val customers = (1 to 200).map(i =>
      (i, s"First$i", s"Last$i", s"first$i@x.test",
        Seq("platinum", "gold", "silver", "bronze")(i % 4)))
      .toDF("id", "first_name", "last_name", "email", "club_status")

    val ms = MemoryStream[R]
    val pipe = RatingsPipeline(ms.toDF(), customers, watermark = "10 minutes")
    val q1 = pipe.unhappyPlatinum.writeStream.format("noop").start()
    val q2 = pipe.perCustomer15min.writeStream.format("memory")
      .queryName("sb_p15").outputMode("update").start()
    val q3 = pipe.byClubStatus1min.writeStream.format("memory")
      .queryName("sb_c1").outputMode("update").start()

    val perBatch = n / nBatches
    val timedEvents = perBatch.toLong * nBatches
    // warm-up batch (untimed): session/codegen/state-store init
    ms.addData(warmupBatch(perBatch))
    Seq(q1, q2, q3).foreach(_.processAllAvailable())

    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      ms.addData(mkBatch(b, perBatch))
      Seq(q1, q2, q3).foreach(_.processAllAvailable())
    }
    val secs = (System.nanoTime() - t0) / 1e9
    // sanity: the windowed aggregations actually aggregated the timed
    // events (guards against watermark-drop measuring an empty topology)
    val aggregated = spark.table("sb_c1")
      .agg(org.apache.spark.sql.functions.sum("RATING_COUNT"))
      .collect().head.getLong(0)
    val evPerSec = timedEvents / secs
    Seq(q1, q2, q3).foreach(_.stop())
    println(f"""{"metric":"stream_events_per_sec","value":$evPerSec%.0f,"unit":"ev/s","events":$timedEvents,"batches":$nBatches,"secs":$secs%.2f,"agg_rows_counted":$aggregated}""")
    spark.stop()
  }
}
