package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sinks.{EsBulkNdjsonSink, KafkaShapeSink}
import graft.sources.Cdc
import graft.tables.LatestByKey

/** Oracle coverage for the pipeline-infrastructure operators: the
  * latest-by-key table (S4), CDC envelope unwrap (S2), and the pure
  * record transformations of the Kafka/ES sinks (K1/K3/K5). Each is the
  * exact production code path (LatestByKey/Cdc/sink objects), verified
  * value-for-value against DuckDB.
  */
object PipelineQueries {

  val defs: Seq[QueryDef] = Seq(

    // S4: changelog-table semantics, batch materialization — the latest
    // event per user (ts desc, event_id desc tiebreak for determinism).
    QueryDef("t_latest_by_key",
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      LatestByKey.batch(Tables.events(s, d), "user_id", "ts", "event_id")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    }.sortedBy(col("user_id")),

    // S2: Debezium envelope unwrap (ExtractNewRecordState +
    // ExtractField$Key) — wrap the dim table into CDC-JSON envelopes,
    // then the production unwrap must recover it exactly (including a
    // JSON round-trip of the double column).
    QueryDef("c_cdc_unwrap",
      """SELECT CAST(c_custkey AS VARCHAR) AS key, c_custkey, c_name,
        |       c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val envelopes = Cdc.wrap(cust)
        .select(to_json(col("value")).as("value"))
      Cdc.unwrapJson(envelopes, "value", cust.schema, "c_custkey")
    }.sortedBy(col("c_custkey")),

    // K3: Kafka-record materialization of the unhappy-platinum alert
    // stream — key + JSON value, the exact bytes a Kafka producer gets.
    // Payload restricted to string/long fields so the JSON text is
    // engine-independent (floats/timestamps are pre-rendered).
    QueryDef("k_kafka_records",
      ParityOracle.prelude +
        """SELECT CAST(rating_id AS VARCHAR) AS key,
          |       '{"RATING_ID":' || rating_id ||
          |       ',"FULL_NAME":"' || full_name ||
          |       '","STARS_CENTS":' || CAST(round(stars*100) AS BIGINT) ||
          |       ',"TS_ISO":"' || strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') || 'Z"}'
          |         AS value
          |FROM enriched
          |WHERE stars < 50.0 AND club_status = 'BUILDING'
          |ORDER BY key""".stripMargin) { (s, d) =>
      val payload = graft.ops.RatingsOps
        .unhappyPlatinum(ParityQueries.enriched(s, d), 50.0, "BUILDING")
        .select(col("RATING_ID"),
          col("FULL_NAME"),
          round(col("STARS") * 100).cast("long").as("STARS_CENTS"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("TS_ISO"))
      KafkaShapeSink.records(payload, "RATING_ID")
    }.sortedBy(col("key")),

    // K1+K5: ES bulk-NDJSON transformation — action line with
    // doc-id-from-key, document line with the *_TS→ISO-8601 rule applied
    // by the sink itself (bulkLines serializes TimestampType columns).
    QueryDef("k_es_bulk",
      ParityOracle.prelude +
        """SELECT '{"index":{"_index":"ratings-enriched","_id":"' || rating_id || '"}}' AS action,
          |       '{"RATING_ID":' || rating_id ||
          |       ',"CHANNEL":"' || channel ||
          |       '","STARS_CENTS":' || CAST(round(stars*100) AS BIGINT) ||
          |       ',"RATING_TS":"' || strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') || 'Z"}'
          |         AS doc
          |FROM enriched ORDER BY action""".stripMargin) { (s, d) =>
      val payload = ParityQueries.enriched(s, d)
        .select(col("RATING_ID"),
          col("CHANNEL"),
          round(col("STARS") * 100).cast("long").as("STARS_CENTS"),
          col("ts").as("RATING_TS"),
          col("RATING_ID").cast("string").as("__id"))
      EsBulkNdjsonSink.bulkLines(payload, "ratings-enriched", "__id")
    }.sortedBy(col("action"))
  )
}
