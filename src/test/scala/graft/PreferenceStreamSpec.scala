package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.streaming.PreferenceStream

/** The streaming RLHF/SFT prep faces: per-batch partial state
  * accumulates in a ManifestStore (epoch-keyed — replays overwrite
  * themselves) and each batch re-derives the current view for its
  * touched entities with the exact batch operator's law, so stream ≡
  * batch over a closed log.
  */
class PreferenceStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streaming DPO pairs: cross-batch fold equals the batch operator over the closed log; margin floor; tie law") {
    val got = new ConcurrentLinkedQueue[(Long, org.apache.spark.sql.Row)]()
    val srcDir = java.nio.file.Files.createTempDirectory("dpo-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dpo-ckpt").toString
    val store = java.nio.file.Files.createTempDirectory("dpo-store").toString
    val schema = Seq(("", 0L, 0L))
      .toDF("prompt_id", "response_id", "score").schema
    def start() = PreferenceStream.maintainDpo(
        spark.readStream.schema(schema).parquet(srcDir), store, ckpt) {
      (pairs, epoch) =>
        if (!pairs.isEmpty)
          pairs.collect().foreach(r => got.add((epoch, r)))
    }
    // batch 1: prompt A gets mid scores; B complete; C a lone response
    val b1 = Seq(("A", 10L, 5L), ("A", 11L, 3L),
      ("B", 20L, 7L), ("B", 21L, 2L), ("C", 30L, 4L))
    b1.toDF("prompt_id", "response_id", "score")
      .write.mode("append").parquet(srcDir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // batch 1's A verdict reflects partial history (live view)
    val a0 = got.asScala.find(e => e._1 == 0L &&
      e._2.getString(0) == "A").get._2
    assert(a0.getLong(a0.fieldIndex("chosen_id")) == 10L &&
      a0.getLong(a0.fieldIndex("margin")) == 2L, a0)
    // C under the margin floor → no emission
    assert(!got.asScala.exists(_._2.getString(0) == "C"))

    // RESTART; batch 2 widens A's pool (new best AND new worst) and
    // adds tie-law prompt D (top tie → smaller id chosen)
    val b2 = Seq(("A", 12L, 9L), ("A", 13L, 1L),
      ("D", 40L, 6L), ("D", 41L, 6L), ("D", 42L, 1L))
    b2.toDF("prompt_id", "response_id", "score")
      .write.mode("append").parquet(srcDir)
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    // latest emission per prompt == the batch operator over the FULL log
    val latest = got.asScala.groupBy(_._2.getString(0))
      .map { case (p, es) => p -> es.maxBy(_._1)._2 }
    val batch = graft.ext.Preference.dpoPairs(
        (b1 ++ b2).toDF("prompt_id", "response_id", "score"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(latest.keySet == batch.keySet, s"${latest.keySet} vs ${batch.keySet}")
    batch.foreach { case (p, want) =>
      assert(latest(p).toSeq == want.toSeq, s"$p: ${latest(p)} vs $want")
    }
    // the cross-batch fold found batch-2's best/worst for A
    val a1 = latest("A")
    assert(a1.getLong(a1.fieldIndex("chosen_id")) == 12L &&
      a1.getLong(a1.fieldIndex("rejected_id")) == 13L &&
      a1.getLong(a1.fieldIndex("margin")) == 8L &&
      a1.getLong(a1.fieldIndex("n_responses")) == 4L, a1)
    // tie law: D's top tie picks the smaller id
    assert(latest("D").getLong(latest("D").fieldIndex("chosen_id")) == 40L)
  }

  test("streaming chat render: cross-batch turns re-render touched conversations; a re-sent turn_idx is an EDIT (latest epoch wins)") {
    val got = new ConcurrentLinkedQueue[(Long, org.apache.spark.sql.Row)]()
    val srcDir = java.nio.file.Files.createTempDirectory("chat-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("chat-ckpt").toString
    val store = java.nio.file.Files.createTempDirectory("chat-store").toString
    val schema = Seq((1L, 0L, "", ""))
      .toDF("conv_id", "turn_idx", "role", "content").schema
    def start() = PreferenceStream.maintainChat(
        spark.readStream.schema(schema).parquet(srcDir), store, ckpt) {
      (rendered, epoch) =>
        if (!rendered.isEmpty)
          rendered.collect().foreach(r => got.add((epoch, r)))
    }
    Seq((1L, 0L, "user", "hi"), (1L, 1L, "assistant", "hello"),
        (2L, 0L, "user", "draft"))
      .toDF("conv_id", "turn_idx", "role", "content")
      .write.mode("append").parquet(srcDir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val c1e0 = got.asScala.find(e => e._1 == 0L &&
      e._2.getString(0) == "1").get._2
    assert(c1e0.getString(c1e0.fieldIndex("text")) ==
      "<|user|>\nhi\n<|assistant|>\nhello\n", c1e0)

    // RESTART; batch 2 extends conv 1 and EDITS conv 2's turn 0
    Seq((1L, 2L, "user", "bye"), (2L, 0L, "user", "final"))
      .toDF("conv_id", "turn_idx", "role", "content")
      .write.mode("append").parquet(srcDir)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val latest = got.asScala.groupBy(_._2.getString(0))
      .map { case (c, es) => c -> es.maxBy(_._1)._2 }
    // conv 1 re-rendered with all three turns — the batch operator's
    // exact output over the accumulated log
    val batchC1 = graft.ext.Packing.renderChat(
        Seq((1L, 0L, "user", "hi"), (1L, 1L, "assistant", "hello"),
          (1L, 2L, "user", "bye"))
          .toDF("conv_id", "turn_idx", "role", "content"))
      .collect().head
    assert(latest("1").getString(latest("1").fieldIndex("text")) ==
      batchC1.getString(batchC1.fieldIndex("text")))
    assert(latest("1").getLong(latest("1").fieldIndex("n_turns")) == 3L)
    // conv 2's re-sent turn replaced, not duplicated (no fail-loud, no
    // double render)
    assert(latest("2").getString(latest("2").fieldIndex("text")) ==
      "<|user|>\nfinal\n", latest("2"))
    assert(latest("2").getLong(latest("2").fieldIndex("n_turns")) == 1L)
  }

  test("merge read-backs follow the store's chunked-IN pruning law; semi-join fallback and chunked path agree; empty batch keeps the operator schema") {
    val store = java.nio.file.Files.createTempDirectory("dpo-prune").toString
    val b1 = Seq(("A", 10L, 5L), ("A", 11L, 3L), ("B", 20L, 7L),
      ("B", 21L, 2L), ("C", 30L, 9L), ("C", 31L, 1L))
      .toDF("prompt_id", "response_id", "score")
    // isinChunk = 2 with 3 touched prompts → 2 chunks → 2 store scans,
    // EACH with its own pushed IN list on the prune key (the
    // IngestGateSpec per-chunk pushed-filter proof, applied to the
    // PreferenceStream read-back — one unchunked isin was the r20 weak)
    val out = PreferenceStream.mergeDpoBatch(b1, store, epoch = 0L,
      isinChunk = 2)
    val plan = out.queryExecution.executedPlan.toString
    // one scan per chunk, each with its own pushed prompt filter (a
    // 1-element chunk's IN is rewritten to EqualTo by Catalyst)
    assert("PushedFilters: \\[[^\\]]*prompt".r.findAllIn(plan).length == 2,
      plan)
    val chunked = out.collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(chunked.keySet == Set("A", "B", "C"))
    // the over-limit path (broadcast semi-join against the batch
    // partial, no pushdown) must produce the identical verdicts —
    // replay the same epoch, which overwrites its own rows
    val semi = PreferenceStream.mergeDpoBatch(b1, store, epoch = 0L,
      pushdownKeyLimit = 0)
    val semiPlan = semi.queryExecution.executedPlan.toString
    assert(!semiPlan.contains("In(prompt"), semiPlan)
    assert(semi.collect().map(r => r.getString(0) -> r.toSeq).toMap == chunked)
    // empty batch: operator row shape, zero rows — not a zero-column
    // frame a column-selecting sink would crash on
    val empty = PreferenceStream.mergeDpoBatch(
      Seq.empty[(String, Long, Long)].toDF("prompt_id", "response_id", "score"),
      store, epoch = 1L)
    assert(empty.columns.toSeq == Seq("prompt_id", "chosen_id",
      "chosen_score", "rejected_id", "rejected_score", "margin",
      "n_responses"), empty.columns.mkString(","))
    assert(empty.count() == 0L)
    val chatStore = java.nio.file.Files.createTempDirectory("chat-prune").toString
    PreferenceStream.mergeChatBatch(
      Seq((1L, 0L, "user", "hi")).toDF("conv_id", "turn_idx", "role", "content"),
      chatStore, epoch = 0L)
    val emptyChat = PreferenceStream.mergeChatBatch(
      Seq.empty[(Long, Long, String, String)]
        .toDF("conv_id", "turn_idx", "role", "content"),
      chatStore, epoch = 1L)
    assert(emptyChat.columns.toSeq ==
      Seq("conv_id", "text", "n_turns", "n_chars"),
      emptyChat.columns.mkString(","))
    assert(emptyChat.count() == 0L)
  }
}
