package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kafka-topic materialization (SURVEY.md §2.2 K3): every ksqlDB
  * CSAS/CTAS writes its result to a topic
  * (/root/reference/ksqldb-statements.sql:50–51 — `KAFKA_TOPIC=
  * 'ratings-enriched'`), keyed per `PARTITION BY` (:68, L3).
  *
  * The record contract is `key` + JSON `value` of the whole row — in
  * Spark, `to_json(struct(*))` plus the key column, exactly what a
  * `writeStream.format("kafka")` sink consumes. Offline we persist the
  * same two-column frame to a directory; the transformation
  * (`records`) is pure and oracle-verifiable.
  */
final case class KafkaShapeSink(dir: String, topic: String, keyCol: String)
  extends SinkDef {

  override def writeBatch(df: DataFrame, epochId: Long): Unit =
    KafkaShapeSink.records(df, keyCol)
      // repartition on key = the producer's key→partition placement (L3);
      // overwrite-per-epoch keeps crash-replays idempotent (SinkDef).
      .repartition(col("key"))
      .write.mode("overwrite").json(s"$dir/topic=$topic/epoch=$epochId")
}

object KafkaShapeSink {

  /** The pure record transformation: (key string, value json-of-row). */
  def records(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))
}
