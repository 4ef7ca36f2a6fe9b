package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ext.Dedup

/** Streaming ingest dedup gate: a document stream is admitted batch by
  * batch against a PERSISTED signature store — redelivered ids, exact
  * copies and near-duplicates of anything already ingested are dropped;
  * novel documents flow to the sink and their signatures append to the
  * store. The reference's pipeline is the same shape one stage earlier:
  * a continuously maintained derived stream others consume
  * (ksqldb-statements.sql:13–17); this is its training-data analog —
  * the corpus a crawler feeds stays deduplicated *as it ingests*, not
  * in a nightly rewrite.
  *
  * Store layout (the write-once index lifecycle of
  * [[graft.ext.Similarity.buildLshIndex]]): `<name>_feats` (id, hashes,
  * sig) bucketed by id — the redelivery anti-join is bucket-colocated;
  * `<name>_bands` (id, band, bkey) bucketed AND sorted by bkey — the
  * per-batch candidate join broadcasts the tiny batch side and prunes
  * the store scan with the batch's band-key set (pushed to parquet
  * row-group stats via the sort). Per batch, work scales with
  * batch-size × collisions, never with store size.
  *
  * Delivery contract (same as [[ChangelogDim.joinEachBatch]]): the sink
  * runs BEFORE the store append, so a crash between them replays the
  * batch — the sink must be idempotent per epoch (at-least-once); the
  * store append itself is replay-safe, because a replayed document
  * matches its own stored signature (Jaccard 1) and is dropped before
  * a second append.
  */
object IngestDedupGate {

  def featsTable(name: String): String = s"${name}_feats"
  def bandsTable(name: String): String = s"${name}_bands"

  def storeExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(featsTable(name))

  /** Batch-mode admit decision: which of `batch`'s documents are novel
    * vs the store? Within-batch exact copies collapse to their min-id
    * representative first ([[Dedup.withExactReps]]); then store-known
    * ids drop (redelivery, any text), then store near-dups drop (band
    * candidates + exact Jaccard ≥ num/den), then WITHIN-BATCH near-dups
    * drop pairwise: a doc with a smaller-id near-dup among the batch's
    * survivors is rejected (its keeper is being admitted in this very
    * batch). Pairwise, not transitive — a chain a~b~c admits a and
    * drops b, c (each has a smaller direct near-dup), but a member
    * whose only near-dup link was itself dropped can survive; the full
    * transitive collapse is [[graft.ext.Dedup.dedupedCorpus]]'s job at
    * corpus level. Returns the novel documents' FEATURE rows (id,
    * hashes, sig, simhash), localCheckpointed — the decision is frozen
    * before any store mutation.
    */
  def filterNovel(batch: DataFrame, name: String, idCol: String = "doc_id",
                  textCol: String = "text", n: Int = 3, numBands: Int = 4,
                  rowsPerBand: Int = 2, jaccardNum: Int = 8,
                  jaccardDen: Int = 10): DataFrame = {
    val spark = batch.sparkSession
    val batchReps = Dedup.withExactReps(
        Dedup.features(batch, idCol, textCol, n), idCol)
      .filter(col(idCol) === col("rep")).drop("rep")
      .localCheckpoint()
    val survivors =
      if (!storeExists(spark, name)) batchReps
      else {
        // 1. redelivered ids (bucket-colocated anti-join on the id key)
        val unknownIds = batchReps.join(
          spark.table(featsTable(name)).select(col(idCol)),
          Seq(idCol), "left_anti")
        // 2. near-dups of stored content: batch band keys vs the store.
        //    The BOUNDED side is the batch (|batch| × numBands rows) —
        //    it carries the broadcast hint; the store side is only ever
        //    scanned, pruned by the batch's key set when it is small
        //    enough to inline (pushed to parquet row-group stats via
        //    the store's bkey sort). Never broadcast the store: one
        //    popular band key can match millions of stored rows.
        val bb = Dedup.bands(unknownIds, idCol, numBands, rowsPerBand)
          .filter(col("bkey").isNotNull)
        val batchKeys = bb.select("bkey").distinct().collect().map(_.getString(0))
        val store = spark.table(bandsTable(name))
        val pruned = if (batchKeys.length <= 10000)
          store.filter(col("bkey").isin(batchKeys.toSeq: _*)) else store
        val cand = broadcast(bb).join(
            pruned.select(col("band"), col("bkey"), col(idCol).as("__sid")),
            Seq("band", "bkey"))
          .select(col(idCol), col("__sid")).distinct()
        val dupIds = Dedup.withJaccard(cand, idCol, "__sid",
            unknownIds, spark.table(featsTable(name)), idCol)
          .filter(Dedup.jaccardAtLeast(jaccardNum, jaccardDen))
          .select(col(idCol))
        unknownIds.join(dupIds, Seq(idCol), "left_anti")
      }
    // within-batch near-dups: lshCandidates emits canonically-ordered
    // (doc_a < doc_b) pairs, so doc_b always has a smaller-id near-dup
    // being admitted alongside it — drop doc_b. The survivor frame is
    // already materialized on the first-batch path (survivors eq
    // batchReps); only the store-filtered branch needs its own
    // checkpoint before feeding the self-join's branches.
    val checked =
      if (survivors eq batchReps) batchReps else survivors.localCheckpoint()
    val over = Dedup.bandOverflow(checked, idCol, numBands, rowsPerBand)
      .limit(21).collect()
    if (over.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ingest gate: ${over.length}${if (over.length > 20) "+" else ""} within-batch " +
          s"band bucket(s) over the width cap excluded from near-dup checking " +
          s"(recall loss, not a failure): " +
          over.take(20).map(r => s"(band=${r.get(0)}, bkey=${r.get(1)}, n=${r.get(2)})").mkString(", "))
    val bcand = Dedup.lshCandidates(checked, idCol, numBands, rowsPerBand)
    val batchDups = Dedup.withJaccard(bcand, "doc_a", "doc_b", checked, checked, idCol)
      .filter(Dedup.jaccardAtLeast(jaccardNum, jaccardDen))
      .select(col("doc_b").as(idCol)).distinct()
    checked.join(batchDups, Seq(idCol), "left_anti").localCheckpoint()
  }

  /** Append admitted feature rows to the store (creating it on first
    * use): band rows into `<name>_bands`, then signatures into
    * `<name>_feats` — both via the bucketed write/append lifecycle.
    *
    * The two writes are not one transaction; the BANDS-FIRST order
    * makes the possible crash states benign. Crash between the writes:
    * the doc's id is NOT yet in `_feats`, so the replayed batch
    * re-admits it (its own orphan band rows find no `_feats` hash row —
    * the candidate join is inner on the feats table) and the re-append
    * only duplicates band rows, which the DISTINCT in the candidate
    * join already absorbs. The reverse order would leave a doc id in
    * `_feats` with no band rows: silently invisible to every future
    * near-dup probe — a permanent recall hole. First-batch crash
    * between the writes self-heals the same way: [[storeExists]] keys
    * on `_feats`, so the next batch recreates BOTH tables fresh.
    */
  def appendToStore(novelFeats: DataFrame, name: String,
                    idCol: String = "doc_id", numBands: Int = 4,
                    rowsPerBand: Int = 2, buckets: Int = 8): Unit = {
    val spark = novelFeats.sparkSession
    val featRows = novelFeats.select(col(idCol), col("hashes"), col("sig"))
    val bandRows = Dedup.bands(novelFeats, idCol, numBands, rowsPerBand)
      .filter(col("bkey").isNotNull)
    if (!storeExists(spark, name)) {
      graft.core.Layout.writeBucketed(bandRows, bandsTable(name), "bkey", buckets)
      graft.core.Layout.writeBucketed(featRows, featsTable(name), idCol, buckets)
    } else {
      graft.core.Layout.appendBucketed(bandRows, bandsTable(name), "bkey", buckets)
      graft.core.Layout.appendBucketed(featRows, featsTable(name), idCol, buckets)
    }
  }

  /** The streaming gate: per micro-batch, admit novel documents, hand
    * them (with their original payload columns) to `sink`, then persist
    * their signatures. `sink` receives (novel-docs, epochId) and must be
    * idempotent per epoch.
    */
  def gate(docs: DataFrame, name: String, checkpointDir: String,
           idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
           numBands: Int = 4, rowsPerBand: Int = 2, jaccardNum: Int = 8,
           jaccardDen: Int = 10, buckets: Int = 8)
          (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        val b = batch.toDF()
        val novel = filterNovel(b, name, idCol, textCol, n, numBands,
          rowsPerBand, jaccardNum, jaccardDen)
        sink(b.join(novel.select(col(idCol)), Seq(idCol), "left_semi"), epoch)
        appendToStore(novel, name, idCol, numBands, rowsPerBand, buckets)
      }
      .start()
}
