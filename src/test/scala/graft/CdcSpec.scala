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
