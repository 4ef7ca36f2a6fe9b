package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash of a shingle-hash set in ONE fused pass: bit b of the result
  * is the majority vote of bit b across the set (ties → 1, matching the
  * HOF spec's `ones * 2 >= size`). Replaces `bits` interpreted
  * `size(filter(...))` passes per row (the declarative round-2 shape,
  * kept as [[graft.ext.Dedup.simhashHof]], the executable spec this is
  * bitwise-tested against) with a single compiled loop that counts all
  * bit positions per element.
  *
  * Empty set: `ones * 2 >= size` is 0 ≥ 0 = true for every bit, so the
  * HOF sets ALL bits — reproduced exactly here. Null input → null.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"need 1 <= bits <= 63, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash needs array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    computeSimhash(input.asInstanceOf[ArrayData])

  /** Called from both eval and generated code (reference-object pattern:
    * whole-stage codegen is preserved, per-row work is one virtual call
    * into this compiled loop).
    */
  def computeSimhash(hashes: ArrayData): Long = {
    val counts = new Array[Int](bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < bits) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (2 * counts(b) >= n) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this, classOf[SimHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeSimhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}
