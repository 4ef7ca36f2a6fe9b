package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ext.{Dedup, FreqSketch}

/** STREAMING distinct-count sketch maintenance: fold every ingested
  * micro-batch into a persisted per-group HyperLogLog register table
  * ([[FreqSketch.hllRegisters]]'s (group, reg, rank) state), so "how
  * many distinct shingles has each source contributed so far?" is
  * answerable at any moment from 64 small rows per group — the running
  * corpus-composition monitor a 100 TB ingest wants, at a cost that
  * never grows with history.
  *
  * The merge is the sketch's own algebra: registers of batch ∪ history
  * = elementwise MAX — which is IDEMPOTENT and COMMUTATIVE, so unlike
  * the ANN index appends ([[AnnIndexStream]]) this stream needs no
  * epoch markers or presence probes: a crash-replayed batch re-maxes
  * the same ranks and changes nothing, by algebra rather than by
  * bookkeeping (spec-gated). The maintained table is bit-identical to
  * a single batch build over everything ingested.
  *
  * Publication is crash-safe by the scratch-swap precedent of
  * [[graft.ext.Similarity.compactIndex]]: the merged registers are
  * written to a scratch table first (live table untouched, its files
  * immutable while the merge plan reads them), then DROP + RENAME; a
  * crash between the two leaves only the scratch table, which the next
  * batch (or [[recoverRegisters]]) republishes before merging.
  */
object SketchStream {

  /** One merge decision, reported per batch via `onBatch`: `groups` =
    * distinct groups present in the maintained table after the merge,
    * `regRows` its total register rows (≤ 64 × groups by construction).
    */
  final case class SketchEvent(epoch: Long, action: String, groups: Long,
                               regRows: Long)

  /** The maintained register table's name for a sketch `name`. */
  def registersTable(name: String): String = s"${name}_regs"

  private def scratch(name: String): String = s"${name}_regs__merge"

  /** Finish an interrupted swap: if the live table is missing but the
    * scratch table exists (a crash landed between DROP and RENAME),
    * republish the scratch — it already holds the complete merged
    * registers. Safe to call any time; every batch calls it first.
    */
  def recoverRegisters(spark: SparkSession, name: String): Boolean = {
    val live = registersTable(name)
    if (!spark.catalog.tableExists(live) &&
        spark.catalog.tableExists(scratch(name))) {
      spark.sql(s"ALTER TABLE ${scratch(name)} RENAME TO $live")
      true
    } else false
  }

  /** Current distinct-count estimates from the maintained registers —
    * (group, n_regs, max_rank, hll_distinct) via
    * [[FreqSketch.hllEstimate]]'s pure-integer raw estimator.
    */
  def distinctEstimate(spark: SparkSession, name: String): DataFrame =
    FreqSketch.hllEstimate(spark.table(registersTable(name)))

  /** Maintain per-`groupCol` HLL registers of distinct `n`-shingles
    * over a document stream. Each batch: build the batch's registers
    * (one partial-aggregated pass over the batch only), max-merge with
    * the persisted table, publish via scratch-swap. Null text/group
    * rows carry no shingles and are excluded, matching
    * [[FreqSketch.hllShingleReport]].
    */
  def maintainHll(docs: DataFrame, name: String, checkpointDir: String,
                  groupCol: String = "source", textCol: String = "text",
                  n: Int = 3,
                  onBatch: SketchEvent => Unit = _ => ()): StreamingQuery = {
    val owner = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        val spark = batch.sparkSession
        recoverRegisters(spark, name)
        val live = registersTable(name)
        val items = batch.toDF()
          .filter(col(textCol).isNotNull && col(groupCol).isNotNull)
          .select(col(groupCol).as("group"),
            explode(Dedup.shingleHashes(col(textCol), n)).as("h"))
        val batchRegs = FreqSketch.hllRegisters(items, col("group"), col("h"))
        // pinned BEFORE the swap: the merge plan reads the live table's
        // files; materializing first keeps the read/overwrite disjoint
        val merged = (if (spark.catalog.tableExists(live))
            spark.table(live).unionByName(batchRegs)
          else batchRegs)
          .groupBy("group", "reg").agg(max("rank").as("rank"))
          .localCheckpoint()
        graft.core.Layout.writeBucketed(merged, scratch(name), "group", 1)
        spark.sql(s"DROP TABLE IF EXISTS $live")
        spark.sql(s"ALTER TABLE ${scratch(name)} RENAME TO $live")
        if (owner.catalog.tableExists(live)) owner.catalog.refreshTable(live)
        val groups = merged.select("group").distinct().count()
        onBatch(SketchEvent(epoch, "merged", groups, merged.count()))
      }
      .start()
  }
}
