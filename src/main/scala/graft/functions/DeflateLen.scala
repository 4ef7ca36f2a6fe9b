package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a text/binary payload — the
  * compression-ratio quality signal of the Gopher/Dolma lineage:
  * near-duplicate boilerplate and machine-generated repetition
  * compress far harder than natural prose, so `deflate_len / n_bytes`
  * separates template spam from real text with one pass and no model.
  *
  * Level 6, raw-deflate (nowrap), one Deflater per row — deterministic
  * for a given zlib implementation (the JDK's bundled zlib here), and
  * the SIGNAL (relative ordering of ratios) is stable across zlib
  * versions even where exact byte counts could differ by a few bytes —
  * which is why this rung is SPEC-gated (ordering + determinism laws),
  * not DuckDB-oracle-gated: no SQL engine replays zlib.
  *
  * Runs inside whole-stage codegen via an expression reference (the
  * compress loop itself is JNI-backed zlib; codegen fuses the row
  * plumbing, which is all the JVM side does).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType || child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_len needs a string or binary argument, got ${child.dataType}")

  private def isBinary: Boolean = child.dataType == BinaryType

  def deflateLen(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override def nullSafeEval(input: Any): Any =
    deflateLen(
      if (isBinary) input.asInstanceOf[Array[Byte]]
      else input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("deflateExpr", this,
        classOf[DeflateLen].getName)
      val src = if (isBinary) c else s"$c.getBytes()"
      s"${ev.value} = $ref.deflateLen($src);"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
