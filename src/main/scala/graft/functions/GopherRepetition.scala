package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The full Gopher word-n-gram repetition vector (Rae et al. 2021,
  * Table A1) as ONE native expression: per document,
  *
  *  - `topN` (n = 2, 3, 4): the maximum over n-grams of
  *    count · byte-length — the characters covered by the most
  *    repetition-heavy single n-gram (ties between distinct grams
  *    resolve to the larger product, so the statistic is the max
  *    char-fraction numerator itself, deterministic with no
  *    lexicographic tiebreak);
  *  - `dupN` (n = 5..10): Σ count · byte-length over n-grams occurring
  *    ≥ 2 times — the characters inside duplicated n-grams.
  *
  * The query layer divides by the document's byte length for the
  * filterable x100 fractions. Gram identity and length are exact gram
  * BYTES (the contiguous `words[w..w+n)` range joined by 0x20 — byte
  * length == char length on the ASCII corpus, matching the oracle's
  * `length()`).
  *
  * Like [[RepetitionStats]] (the 2-gram-only precursor kept for its
  * query surface), this exists because the `aggregate`-HOF formulation
  * runs in Catalyst's lambda interpreter at ~1 ms/doc·n; here all nine
  * n-sizes share ONE word-boundary scan and nine zero-copy counting
  * passes at byte speed. doGenCode uses the reference-object pattern so
  * enclosing operators stay whole-stage-codegen'd.
  *
  * Fewer than n words → that size's counters are 0; null text → null
  * (the query layer coalesces).
  */
case class GopherRepetition(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(
    GopherRepetition.TopNs.map(n =>
      StructField(s"top$n", LongType, nullable = false)) ++
      GopherRepetition.DupNs.map(n =>
        StructField(s"dup$n", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_repetition needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Called from both eval and generated code. */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val starts = mutable.ArrayBuffer(0)
    val ends = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { ends += i; starts += i + 1 }
      i += 1
    }
    ends += bytes.length
    val nWords = starts.length
    val out = new Array[Any](GopherRepetition.TopNs.length +
      GopherRepetition.DupNs.length)
    var slot = 0
    (GopherRepetition.TopNs ++ GopherRepetition.DupNs).foreach { n =>
      val wantTop = n <= GopherRepetition.TopNs.last
      var stat = 0L
      if (nWords >= n) {
        val counts = new java.util.HashMap[UTF8String, java.lang.Long]
        var w = 0
        while (w <= nWords - n) {
          val g = UTF8String.fromBytes(bytes, starts(w),
            ends(w + n - 1) - starts(w))
          val prev = counts.get(g)
          counts.put(g, if (prev == null) 1L else prev + 1L)
          w += 1
        }
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val chars = e.getValue.longValue() * e.getKey.numBytes()
          if (wantTop) { if (chars > stat) stat = chars }
          else if (e.getValue.longValue() >= 2L) stat += chars
        }
      }
      out(slot) = stat
      slot += 1
    }
    new GenericInternalRow(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherRepetition", this,
      classOf[GopherRepetition].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherRepetition =
    copy(child = newChild)
}

object GopherRepetition {
  /** top-n-gram char sizes (max single gram) and dup sizes (Σ over
    * duplicated grams) — the Gopher Table A1 n ranges.
    */
  val TopNs: Seq[Int] = Seq(2, 3, 4)
  val DupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)
}
