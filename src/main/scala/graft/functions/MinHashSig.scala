package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  extends UnaryExpression {

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    computeSig(input.asInstanceOf[ArrayData])

  /** Called from both eval and generated code (reference-object pattern:
    * the stage stays whole-stage-codegen'd, the per-row work is one
    * virtual call into this compiled loop — no CodegenFallback, which
    * would exclude the whole operator from stage fusion).
    */
  def computeSig(hashes: ArrayData): ArrayData = {
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.computeSig($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
