package graft

import org.apache.spark.sql.functions._
import graft.sources.{Cdc, KafkaShape}

/** S2 CDC semantics: Debezium envelope unwrap (ExtractNewRecordState) +
  * key extraction (ExtractField$Key) — ksqldb-statements.sql:31–34 —
  * over JSON-serialized envelopes, incl. the delete/tombstone path.
  */
class CdcSpec extends SparkSuite {

  test("unwrap keeps create/update/read after-images and extracts the key") {
    import spark.implicits._
    val rowSchema = customersDf.schema
    val creates = Cdc.wrap(customersDf, op = "c")
      .select(to_json(col("value")).as("value"))
    val out = Cdc.unwrapJson(creates, "value", rowSchema, "id")
    assert(out.count() == 20)
    assert(out.columns.head == "key")
    val rick = out.filter(col("id") === 1).collect().head
    assert(rick.getString(0) == "1") // key extracted from PK field
    assert(rick.getAs[String]("first_name") == "First1")
  }

  test("deletes are dropped by unwrap and surfaced by the delete stream") {
    import spark.implicits._
    val rowSchema = customersDf.schema
    val mixed = Cdc.wrap(customersDf.limit(3), op = "u")
      .union(Cdc.wrap(customersDf.limit(2), op = "d")
        // deletes carry the before-image, not after
        .select(struct(
          col("value.after").as("before"),
          lit(null).cast(rowSchema).as("after"),
          col("value.op"), col("value.ts_ms")).as("value")))
      .select(to_json(col("value")).as("value"))

    assert(Cdc.unwrapJson(mixed, "value", rowSchema, "id").count() == 3)
    val dels = Cdc.deletes(mixed
      .select(from_json(col("value"), Cdc.envelopeSchema(rowSchema)).as("v")),
      col("v"), "id")
    assert(dels.count() == 2)
  }

  test("malformed payloads decode to nulls and flow to the ES dead-letter (K2 end-to-end)") {
    import spark.implicits._
    val corrupt = Seq(
      ("""{"RATING_ID":7,"USER_ID":1,"STARS":5.0,"CHANNEL":"ios","MESSAGE":"ok","ts":"2024-01-01 10:00:00"}""", "good"),
      ("""{"RATING_ID": oops not json""", "bad"))
      .toDF("value", "tag")
      .select(col("value").cast("binary").as("value"),
        lit("ratings").as("topic"),
        lit(ts("2024-01-01 10:00:00")).as("timestamp"), col("tag"))
    val decoded = graft.sources.KafkaShape.decode(corrupt, ratingsDf.schema)
    // corrupt JSON → all-null row, not an exception (errors.tolerance)
    assert(decoded.count() == 2)
    assert(decoded.filter(col("RATING_ID").isNull).count() == 1)

    // the ES sink routes the null-id row to the dead letter, keeps the good one
    val dir = java.nio.file.Files.createTempDirectory("cdc-es").toString
    val dl = java.nio.file.Files.createTempDirectory("cdc-dl").toString
    graft.sinks.EsBulkNdjsonSink(dir, "ratings", "RATING_ID",
      deadLetterDir = Some(dl)).writeBatch(decoded, 0)
    assert(spark.read.text(s"$dir/epoch=0").count() == 2)  // action + doc lines
    assert(spark.read.text(s"$dl/epoch=0").count() == 1)
  }

  test("kafka-shaped encode/decode round-trips the payload (S3 registry analog)") {
    val encoded = KafkaShape.encode(ratingsDf, "RATING_ID", "ts", "ratings")
    assert(encoded.columns.toSeq == KafkaShape.columns)
    val decoded = KafkaShape.decode(encoded, ratingsDf.schema)
    assert(rows(decoded) == rows(ratingsDf))
    // M3 offset-reset analog: earliest replays all, latest sees nothing new
    assert(KafkaShape.fromOffsets(encoded, "earliest").count() == 12)
    assert(KafkaShape.fromOffsets(encoded, "latest").count() == 0)
    intercept[IllegalArgumentException](
      KafkaShape.fromOffsets(encoded, "bogus").collect())
  }
}
