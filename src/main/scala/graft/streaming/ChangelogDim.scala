package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.tables.LatestByKey

/** S4 → J1 integration: a ksqlDB TABLE fed by a change stream, joined
  * live into an enrichment query (the reference's signature probe:
  * UPDATE a customer row and the running join reflects it —
  * /root/reference/README.md:201–210 — now through the FULL streaming
  * topology, not a static dim snapshot).
  *
  * Shape: [[maintain]] runs [[graft.tables.LatestByKey.streaming]]
  * (one row of state per key) and upserts each micro-batch's changed
  * keys into a key-partitioned parquet dim store via dynamic partition
  * overwrite — only the touched keys' partitions are rewritten, and an
  * epoch replay rewrites them with identical rows (idempotent).
  * [[joinEachBatch]] then enriches the fact stream in `foreachBatch`,
  * re-reading the dim store at each micro-batch — the Spark expression
  * of a stream–changelog-table join with as-of-processing-time
  * semantics, exactly ksqlDB's stream–table join contract.
  *
  * Scale note: per-key directory partitioning fits dimension-table
  * cardinalities (the reference's customers table). The raw-parquet
  * stand-in is NOT transactional: a join micro-batch listing the store
  * exactly while an upsert replaces a partition can see missing files.
  * [[ManifestStore]] is the transactional backend behind the same two
  * seams (maintain / joinEachBatch): immutable version dirs + atomic
  * manifest commits, readers pin a committed snapshot — use it when a
  * retried or torn batch is not tolerable; this class remains the
  * lighter per-key-overwrite variant.
  */
object ChangelogDim {

  /** Maintain `dir` as the latest-by-key view of a stream of versioned
    * rows. Update-mode changelog: only keys whose latest value changed
    * are rewritten each micro-batch.
    */
  def maintain(versions: DataFrame, key: String, ts: String, dir: String,
               checkpointDir: String, tiebreak: Seq[String] = Nil): StreamingQuery =
    LatestByKey.streaming(versions, key, ts, tiebreak = tiebreak)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        upsert(batch.toDF(), key, dir)
      }
      .start()

  /** Seed the dim store with its initial table state (reference analog:
    * the pre-loaded customers table).
    */
  def seed(initial: DataFrame, key: String, dir: String): Unit =
    initial.write.partitionBy(key).mode("overwrite").parquet(dir)

  /** Idempotent per-key upsert: dynamic partition overwrite replaces
    * exactly the partitions present in `latest` (the changed keys),
    * leaving every other key's partition untouched. The overwrite mode
    * is a per-WRITE option, not a session-conf toggle — a toggle would
    * race with any concurrent write on the shared session (another
    * thread's partitioned overwrite silently turning dynamic, or this
    * write turning static mid-flight and wiping the whole store).
    */
  def upsert(latest: DataFrame, key: String, dir: String): Unit =
    latest.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(key).mode("overwrite").parquet(dir)

  /** Flatten a batch of Debezium-shaped envelopes to each key's LATEST
    * change row (`__op`, `__ts`, `__seq` + the row columns). `__seq`
    * preserves ARRIVAL order as the equal-ts tiebreak: ts_ms is
    * millisecond-granular, so an update-then-delete of one key in the
    * same millisecond is routine — the later log event must win (an
    * op-string tiebreak would keep 'u' over 'd' and leak the row
    * forever). monotonically_increasing_id is ordered within each input
    * partition, and a keyed source (Kafka) delivers one key's events
    * through one partition in order. Shared by this raw-parquet store
    * and [[ManifestStore.maintainCdc]] so the CDC semantics cannot
    * drift between backends.
    */
  private[streaming] def cdcLatest(batch: DataFrame, envelope: Column,
                                   keyField: String): DataFrame = {
    val flat = batch.select(envelope.alias("__env"))
      .select(col("__env.op").as("__op"), col("__env.ts_ms").as("__ts"),
        coalesce(col("__env.after"), col("__env.before")).as("__row"))
      .select(col("__op"), col("__ts"), col("__row.*"))
      .withColumn("__seq", monotonically_increasing_id())
    LatestByKey.batch(flat, keyField, "__ts", "__seq")
  }

  /** Maintain the dim store directly from a stream of Debezium-shaped
    * CDC envelopes (`{before, after, op, ts_ms}` in `envelope`),
    * COMPLETE ksqlDB-table semantics: creates/updates/snapshot-reads
    * upsert the key's partition, DELETES (op 'd' — the tombstone path
    * ksqlDB drops table rows on) REMOVE it. Per batch, only each key's
    * LATEST version applies ([[cdcLatest]]), so an update+delete of one
    * key in one batch resolves deterministically; cross-batch, a later
    * re-insert simply recreates the partition. Partition-dir removal is
    * a driver-side filesystem call — bounded by keys-DELETED-per-batch
    * (dimension-churn small), not data volume.
    */
  def maintainCdc(envelopes: DataFrame, envelope: Column, keyField: String,
                  dir: String, checkpointDir: String): StreamingQuery =
    envelopes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // persist: the aggregation feeds three actions (isEmpty probe,
        // upsert write, delete-key collect) — without it each would
        // re-scan the batch and recompute the groupBy
        val latest = cdcLatest(batch.toDF(), envelope, keyField)
        latest.persist()
        try {
          val ups = latest.filter(col("__op") =!= "d")
            .drop("__op", "__ts", "__seq")
          if (!ups.isEmpty) upsert(ups, keyField, dir)
          val delKeys = latest.filter(col("__op") === "d")
            .select(col(keyField).cast("string")).collect()
            .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
          if (delKeys.nonEmpty) deleteKeys(batch.sparkSession, delKeys, keyField, dir)
        } finally latest.unpersist()
      }
      .start()

  /** Remove the named keys' partitions (tombstone application). Paths
    * use Spark's own partition-value escaping, so string keys with
    * special characters (':', '/', spaces) and null keys resolve to the
    * directories the writer actually produced — a raw `k=$v` probe
    * would silently miss them and leak the row forever.
    */
  def deleteKeys(spark: org.apache.spark.sql.SparkSession, keys: Seq[String],
                 keyField: String, dir: String): Unit = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    keys.foreach { k =>
      val v = if (k == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
              else ExternalCatalogUtils.escapePathName(k)
      val p = new org.apache.hadoop.fs.Path(base,
        s"${ExternalCatalogUtils.escapePathName(keyField)}=$v")
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  /** Join the fact stream against the CURRENT dim state: `foreachBatch`
    * re-reads the store per micro-batch, so an update upserted by
    * [[maintain]] is visible to the very next batch of facts (a
    * stream-static join would pin the file listing captured at plan
    * time). `join` receives (facts-batch, current-dim); `sink` receives
    * (joined, epochId) and must be idempotent on epoch replay.
    */
  def joinEachBatch(stream: DataFrame, dimDir: String, checkpointDir: String,
                    join: (DataFrame, DataFrame) => DataFrame)
                   (sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        val dim = batch.sparkSession.read.parquet(dimDir)
        sink(join(batch.toDF(), dim), epoch)
      }
      .start()
}
