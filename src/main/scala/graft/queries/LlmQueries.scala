package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM-data-pipeline operators as oracle-verified queries (BASELINE
  * north star: dedup, similarity search, multimodal, text analysis —
  * first-class components alongside SURVEY §2).
  */
object LlmQueries {

  /** The full LLM-ops registry: the per-family files concatenated in
    * the original (pre-split) order.
    */
  val defs: Seq[QueryDef] = LlmEvalQueries.defs ++
    LlmTokenizerQueries.defs ++
    LlmDedupQueries.defs ++
    LlmAnnQueries.defs ++
    LlmCorpusQueries.defs ++
    LlmClassifierQueries.defs ++
    LlmRetrievalQueries.defs ++
    LlmPackingQueries.defs ++
    LlmMixQueries.defs ++
    LlmStreamQueries.defs ++
    LlmSemanticQueries.defs ++
    LlmMultimodalQueries.defs

  // Stable public aliases for members callers outside the queries
  // package reach through this object (ScaleCheck, specs).
  def dpoPrepOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    LlmShared.dpoPrepOf(docs)
  def chatPrepOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    LlmShared.chatPrepOf(docs)
  val BpeTrainMerges: Int = LlmShared.BpeTrainMerges
}
