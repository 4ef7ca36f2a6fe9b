package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING faces of the RLHF/SFT prep operators — scored responses
  * and chat turns arrive continuously (a labeling queue, a reward
  * model scoring online, a conversation logger), and the training-pair
  * / rendered-conversation views stay current per micro-batch instead
  * of waiting for a nightly batch over the full log. Both stages are
  * the [[EventFeatureStream.rateAnomalies]] accumulate-and-recompute
  * posture: per-batch partial state rows keyed (entity, EPOCH) land in
  * a [[ManifestStore]] — a replayed epoch OVERWRITES its own rows, so
  * exactly-once arithmetic needs no idempotent-sink leap of faith —
  * and each batch re-derives the final view for its TOUCHED entities
  * only, against their full accumulated history, with the exact batch
  * operator's law.
  *
  * Keys embed in the store row key with the 0x1F unit separator (the
  * rateAnomalies contract): entity ids containing it are rejected up
  * front.
  */
object PreferenceStream {

  private val Sep = "\u001F"

  /** Streaming DPO-pair maintenance over a scored-response stream —
    * the online face of [[graft.ext.Preference.dpoPairs]]: each
    * micro-batch folds its responses into per-prompt partial verdicts
    * (the argmax/argmin as `min` over (±score, id) structs — the SAME
    * associative fold the batch operator runs, so partials of batches
    * merge into exactly the batch answer over the union), upserts them
    * under (prompt, epoch), and re-derives the CURRENT pair for every
    * prompt the batch touched from its full partial history. `sink`
    * receives the batch operator's row shape (promptCol, chosen_id,
    * chosen_score, rejected_id, rejected_score, margin, n_responses)
    * for touched prompts that clear `minMargin`, plus the epoch.
    *
    * Score integrality is enforced by the batch operator's own guard
    * (the fold delegates to the same struct law); null prompt /
    * response / score rows don't vote, prompts whose spread is under
    * the margin floor emit nothing this batch (they may later — more
    * responses can widen the spread, never narrow it).
    *
    * Scale shape: per batch ONE prompt-keyed partial aggregation over
    * the batch, one store upsert of ≤ touched-prompt rows, and a
    * prompt-PRUNED store read ([[ManifestStore.readWhere]]) whose cost
    * tracks the touched prompts' history, not store size.
    * `compactEvery` folds version dirs on the gate cadence.
    */
  def maintainDpo(responses: DataFrame, storeDir: String,
                  checkpointDir: String, promptCol: String = "prompt_id",
                  respCol: String = "response_id",
                  scoreCol: String = "score", minMargin: Long = 1L,
                  compactEvery: Int = 0)
                 (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(minMargin >= 1L, s"minMargin must be >= 1, got $minMargin")
    responses.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        val spark = batch.sparkSession
        val scoreType = batch.toDF().select(col(scoreCol))
          .schema.head.dataType
        require(scoreType.isInstanceOf[org.apache.spark.sql.types.ByteType]
            || scoreType.isInstanceOf[org.apache.spark.sql.types.ShortType]
            || scoreType.isInstanceOf[org.apache.spark.sql.types.IntegerType]
            || scoreType.isInstanceOf[org.apache.spark.sql.types.LongType],
          s"maintainDpo needs an integral score column ($scoreCol is " +
            s"$scoreType) — the dpoPairs contract")
        // the batch's own partial verdicts — the associative fold
        val partial = batch.toDF()
          .filter(col(promptCol).isNotNull && col(respCol).isNotNull &&
            col(scoreCol).isNotNull)
          .select(col(promptCol).cast("string").as("prompt"),
            col(respCol), col(scoreCol).cast("long").as("__dp_s"))
          .groupBy(col("prompt"))
          .agg(
            min(struct((-col("__dp_s")).as("ns"), col(respCol).as("id")))
              .as("c"),
            min(struct(col("__dp_s").as("s"), col(respCol).as("id")))
              .as("r"),
            count(lit(1)).as("n"))
          .localCheckpoint() // read twice: upsert + touched list
        val touched = partial.select(col("prompt"))
          .collect().map(_.getString(0)).toSeq
        if (touched.nonEmpty) {
          require(!touched.exists(_.contains(Sep)),
            "maintainDpo: prompt ids must not contain the 0x1F separator")
          val rows = partial.select(
            concat_ws(Sep, col("prompt"), lit(epoch)).as("row_key"),
            col("prompt"), col("c"), col("r"), col("n"))
          if (ManifestStore.latestManifest(spark, storeDir).isEmpty)
            ManifestStore.seed(rows, "row_key", storeDir)
          else ManifestStore.upsert(rows, "row_key", storeDir)
          // merge the touched prompts' full partial history with the
          // SAME fold, then apply the pair law — bit-equal to the
          // batch operator over every response ingested so far
          val merged = ManifestStore
            .readWhere(spark, storeDir, "row_key",
              col("prompt").isin(touched: _*))
            .groupBy(col("prompt"))
            .agg(min(col("c")).as("c"), min(col("r")).as("r"),
              sum(col("n")).as("n_responses"))
          val pairs = merged.select(
            col("prompt").as(promptCol),
            col("c.id").as("chosen_id"),
            (-col("c.ns")).as("chosen_score"),
            col("r.id").as("rejected_id"),
            col("r.s").as("rejected_score"),
            (-col("c.ns") - col("r.s")).as("margin"),
            col("n_responses"))
            .filter(col("margin") >= minMargin)
          sink(pairs, epoch)
          if (compactEvery > 0 &&
              ManifestStore.latestManifest(spark, storeDir)
                .exists(_.dirs.size >= compactEvery)) {
            ManifestStore.compact(spark, storeDir, "row_key")
            ManifestStore.vacuum(spark, storeDir, minVersionsToKeep = 2)
          }
        } else sink(spark.emptyDataFrame, epoch)
      }
      .start()
  }

  /** Streaming chat-render maintenance over a turn stream — the online
    * face of [[graft.ext.Packing.renderChat]] (+ [[
    * graft.ext.Packing.chatSpans]] via the same store): turns upsert
    * under (conv, turn_idx, epoch); each batch re-renders every
    * conversation it touched from the turns' full history. Read-back
    * keeps the LATEST epoch per (conv, turn_idx) — so an in-lineage
    * replay changes nothing, and a turn RE-SENT in a later epoch
    * REPLACES its predecessor (edit semantics: the batch guard's
    * duplicate-turn_idx fail-loud stays for genuine same-relation
    * duplicates, while the stream's at-least-once redelivery can never
    * trip it). `sink` receives renderChat's row shape (convCol, text,
    * n_turns, n_chars) for the touched conversations, plus the epoch.
    *
    * Scale shape: per batch one conv-keyed dedup over the batch, one
    * store upsert, and a conv-PRUNED store read bounded by the touched
    * conversations' turn counts — never the corpus.
    */
  def maintainChat(turns: DataFrame, storeDir: String,
                   checkpointDir: String, convCol: String = "conv_id",
                   idxCol: String = "turn_idx", roleCol: String = "role",
                   contentCol: String = "content", compactEvery: Int = 0)
                  (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    turns.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        val spark = batch.sparkSession
        // within one batch the LAST occurrence of a (conv, turn) wins
        // (the same latest-wins law the cross-epoch read applies) —
        // max over the (role, content) struct is deterministic only
        // under distinct payloads, so take max_by over a batch-local
        // sequence to honor arrival order deterministically: the
        // engine's RNG-free rule is (epoch, then struct order), which
        // a replayed batch reproduces exactly
        val batchTurns = batch.toDF()
          .filter(col(convCol).isNotNull && col(idxCol).isNotNull &&
            col(roleCol).isNotNull && col(contentCol).isNotNull)
          .select(col(convCol).cast("string").as("conv"),
            col(idxCol).cast("long").as("turn_idx"),
            col(roleCol).cast("string").as("role"),
            col(contentCol).cast("string").as("content"))
          .groupBy(col("conv"), col("turn_idx"))
          .agg(max(struct(col("role"), col("content"))).as("rc"))
          .select(col("conv"), col("turn_idx"),
            col("rc.role").as("role"), col("rc.content").as("content"))
          .localCheckpoint()
        val touched = batchTurns.select(col("conv")).distinct()
          .collect().map(_.getString(0)).toSeq
        if (touched.nonEmpty) {
          require(!touched.exists(_.contains(Sep)),
            "maintainChat: conv ids must not contain the 0x1F separator")
          val rows = batchTurns.select(
            concat_ws(Sep, col("conv"), col("turn_idx"), lit(epoch))
              .as("row_key"),
            col("conv"), col("turn_idx"), col("role"), col("content"),
            lit(epoch).as("epoch"))
          if (ManifestStore.latestManifest(spark, storeDir).isEmpty)
            ManifestStore.seed(rows, "row_key", storeDir)
          else ManifestStore.upsert(rows, "row_key", storeDir)
          // latest epoch wins per (conv, turn_idx): replay-idempotent
          // AND turn-edit semantics in one rule
          val hist = ManifestStore
            .readWhere(spark, storeDir, "row_key",
              col("conv").isin(touched: _*))
            .groupBy(col("conv"), col("turn_idx"))
            .agg(max_by(struct(col("role"), col("content")), col("epoch"))
              .as("rc"))
            .select(col("conv").as(convCol), col("turn_idx"),
              col("rc.role").as("role"), col("rc.content").as("content"))
          sink(graft.ext.Packing.renderChat(hist, convCol, "turn_idx",
            "role", "content"), epoch)
          if (compactEvery > 0 &&
              ManifestStore.latestManifest(spark, storeDir)
                .exists(_.dirs.size >= compactEvery)) {
            ManifestStore.compact(spark, storeDir, "row_key")
            ManifestStore.vacuum(spark, storeDir, minVersionsToKeep = 2)
          }
        } else sink(spark.emptyDataFrame, epoch)
      }
      .start()
  }
}
