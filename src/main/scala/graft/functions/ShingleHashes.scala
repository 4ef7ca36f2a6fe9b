package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle PolyHash set of a text — the dedup
  * pipeline's hot path as ONE native expression instead of an
  * interpreted higher-order-function chain
  * (split → transform(concat_ws) → transform(polyhash) → array_distinct),
  * which costs ~1 ms/document in Catalyst's lambda interpreter. At
  * 100 TB text dedup this map stage IS the workload.
  *
  * Semantics are bit-identical to the declarative chain (asserted in
  * NativeExprSpec): split on single space keeping trailing empties
  * (Spark `split` semantics), shingle = n consecutive words joined by
  * one space, hash = PolyHash over UTF-8 bytes, distinct preserving
  * first occurrence; fewer than n words → the whole text is the single
  * shingle.
  */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs a string argument, got ${child.dataType}")

  private def polyhash(bytes: Array[Byte], acc0: Long): Long = {
    var acc = acc0
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % 2147483647L
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // limit -1: keep trailing empty words, matching Spark's split()
    val words = text.split(" ", -1)
    val out = new mutable.LinkedHashSet[Long]
    if (words.length < n) {
      out += polyhash(text.getBytes("UTF-8"), 0L)
    } else {
      var i = 0
      while (i <= words.length - n) {
        // rolling over the shingle's bytes: words joined by ' ' (0x20)
        var acc = 0L
        var j = 0
        while (j < n) {
          if (j > 0) acc = (acc * 31L + 0x20L) % 2147483647L
          acc = polyhash(words(i + j).getBytes("UTF-8"), acc)
          j += 1
        }
        out += acc
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
