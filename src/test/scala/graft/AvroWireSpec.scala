package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{AvroWire, KafkaShape}

/** Registry-Avro decode over the Kafka seam (S3 — closes the round-2
  * "registry Avro" gap): Confluent wire format round-trips bit-exactly,
  * malformed records obey errors.tolerance=all, and by-name conversion
  * gives registry evolution-lite (two schema versions, one target).
  */
class AvroWireSpec extends SparkSuite {

  private val ratingsSchema = new StructType()
    .add("RATING_ID", LongType, nullable = false)
    .add("USER_ID", IntegerType, nullable = false)
    .add("STARS", DoubleType, nullable = false)
    .add("CHANNEL", StringType)
    .add("MESSAGE", StringType)
    .add("ts", TimestampType)

  test("avro wire round-trip: encode to magic+id+binary, decode back to identical rows") {
    val encoded = AvroWire.encode(ratingsDf, "RATING_ID", "ts", "ratings-avro",
      schemaId = 7)
    assert(encoded.columns.toSeq == KafkaShape.columns)
    // wire shape: magic byte 0, big-endian id 7
    val v = encoded.select("value").collect().head.getAs[Array[Byte]](0)
    assert(v(0) == 0x00 && java.nio.ByteBuffer.wrap(v, 1, 4).getInt == 7)

    val registry = Map(7 -> AvroWire.avroSchemaJson(ratingsDf.schema))
    val decoded = KafkaShape.decodeAvro(encoded, registry, ratingsSchema)
    assert(rows(decoded) == rows(ratingsDf))
  }

  test("undecodable records are skipped, good ones survive (errors.tolerance=all)") {
    import spark.implicits._
    val encoded = AvroWire.encode(ratingsDf, "RATING_ID", "ts", "t", schemaId = 1)
    val registry = Map(1 -> AvroWire.avroSchemaJson(ratingsDf.schema))
    val junk = Seq(
      "no magic here".getBytes("UTF-8"),              // wrong magic
      Array[Byte](0x00, 0, 0, 0, 99),                  // unknown schema id
      Array[Byte](0x00, 0, 0, 0, 1, 0x7f),             // truncated payload
      null)                                            // null value
      .toDF("value")
    val mixed = encoded.select("value").union(junk)
    val decoded = AvroWire.decode(mixed, registry, ratingsSchema)
    assert(decoded.count() == ratingsDf.count())
    assert(rows(decoded) == rows(ratingsDf))
  }

  test("registry evolution-lite: v1 and v2 writers decode against one target by field name") {
    // v2 adds a nullable SOURCE field; both versions live on one topic
    val v1 = ratingsDf.limit(4)
    val v2 = ratingsDf.orderBy(col("RATING_ID").desc).limit(4)
      .withColumn("SOURCE", lit("mobile-sdk"))
    val registry = Map(
      1 -> AvroWire.avroSchemaJson(v1.schema),
      2 -> AvroWire.avroSchemaJson(v2.schema))
    val topic = AvroWire.encode(v1, "RATING_ID", "ts", "t", schemaId = 1)
      .union(AvroWire.encode(v2, "RATING_ID", "ts", "t", schemaId = 2))

    // target = v1 shape: v2 records project down by name
    val decodedV1 = AvroWire.decode(topic, registry, ratingsSchema)
    assert(decodedV1.count() == 8)

    // target = v2 shape: v1 records null-fill the missing SOURCE field
    val targetV2 = ratingsSchema.add("SOURCE", StringType)
    val decodedV2 = AvroWire.decode(topic, registry, targetV2)
    val bySource = decodedV2.collect().groupBy(r =>
      Option(r.getAs[String]("SOURCE")))
    assert(bySource(Some("mobile-sdk")).length == 4)
    assert(bySource(None).length == 4)
  }

  test("type evolution: int writer field widens to long target; true mismatches skip, not crash") {
    import spark.implicits._
    val writer = Seq((1, 5L)).toDF("USER_ID", "RATING_ID") // USER_ID int
    val enc = AvroWire.encode(writer, "RATING_ID", "RATING_ID", "t", schemaId = 1)
    // target declares USER_ID long: standard avro widening must decode
    val widened = new StructType()
      .add("USER_ID", LongType).add("RATING_ID", LongType)
    val ok = AvroWire.decode(enc,
      Map(1 -> AvroWire.avroSchemaJson(writer.schema)), widened).collect()
    assert(ok.length == 1 && ok.head.getLong(0) == 1L)
    // target declares USER_ID string: unconvertible -> record skipped
    // inside the decode try (errors.tolerance=all), not a lazy encoder
    // crash when the iterator is consumed
    val mismatched = new StructType()
      .add("USER_ID", StringType).add("RATING_ID", LongType)
    val skipped = AvroWire.decode(enc,
      Map(1 -> AvroWire.avroSchemaJson(writer.schema)), mismatched)
    assert(skipped.count() == 0)
  }

  test("CDC over avro: the Debezium envelope (nested record) round-trips and unwraps") {
    import graft.sources.Cdc
    // the reference's S2 shape: AvroConverter-encoded Debezium envelopes
    // {before, after, op, ts_ms} on asgard.demo.CUSTOMERS
    val envelopes = Cdc.wrap(customersDf)           // op 'r' snapshot reads
      .union(Cdc.wrap(customersDf.limit(2), "d"))   // plus delete markers
    val topic = AvroWire.encode(envelopes, "value.after.id", "value.ts_ms",
      "asgard.demo.CUSTOMERS", schemaId = 11)
    val registry = Map(11 -> AvroWire.avroSchemaJson(envelopes.schema))
    val target = new StructType()
      .add("value", Cdc.envelopeSchema(customersDf.schema))
    val decoded = AvroWire.decode(topic, registry, target)
    // ExtractNewRecordState drops the deletes and yields the after-image
    val unwrapped = Cdc.unwrap(decoded, col("value"), "id")
    assert(rows(unwrapped) == rows(Cdc.unwrap(envelopes, col("value"), "id")))
    assert(unwrapped.count() == customersDf.count())
  }

  test("timestamps survive with microsecond precision") {
    import spark.implicits._
    val t = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-01T12:34:56.123456Z"))
    val df = Seq((1L, t)).toDF("RATING_ID", "ts")
    val enc = AvroWire.encode(df, "RATING_ID", "ts", "t", schemaId = 3)
    val dec = AvroWire.decode(enc,
      Map(3 -> AvroWire.avroSchemaJson(df.schema)),
      new StructType().add("RATING_ID", LongType).add("ts", TimestampType))
    assert(dec.collect().head.getTimestamp(1) == t)
  }
}
