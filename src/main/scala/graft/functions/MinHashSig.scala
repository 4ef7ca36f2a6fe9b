package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a shingle-hash set: per permutation (a, b),
  * min over hashes of (a·h + b) mod P — one fused pass over the input
  * array computing all permutations, instead of `perms` separate
  * interpreted `transform`/`array_min` passes. Empty input → P per slot
  * (matches the declarative coalesce fallback).
  *
  * Together with [[ShingleHashes]] this makes the whole dedup
  * signature path native: text → hash set → signature with no Catalyst
  * lambda interpretation. Values are identical to the HOF formulation
  * (asserted bitwise in NativeExprSpec) and to the DuckDB oracle
  * (t_minhash_sig).
  */
case class MinHashSig(child: Expression, perms: Seq[(Long, Long)])
  extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val k = perms.length
    val mins = Array.fill(k)(P)
    val as = perms.map(_._1).toArray
    val bs = perms.map(_._2).toArray
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
