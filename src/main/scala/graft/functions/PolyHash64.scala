package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 62-bit packed double polynomial fingerprint:
  *
  *   h31 = fold(bytes)(acc, c => (acc · 31 + c) mod 2³¹−1)
  *   h37 = fold(bytes)(acc, c => (acc · 37 + c) mod 2³¹−19)
  *   h64 = h31 · (2³¹−19) + h37
  *
  * Two INDEPENDENT rolling hashes (different multiplier AND modulus,
  * both Mersenne-adjacent primes) computed in one fused byte loop and
  * packed into one positive Long (max ≈ 2⁶². The packing is injective:
  * (h31, h37) recovers by divmod). The point vs [[PolyHash]]: a 31-bit
  * key space birthday-collides around 2¹⁶ distinct values — fatal for
  * CONTENT-KEYED dedup at 100 TB, where a collision silently merges
  * unrelated passages/documents. 62 bits pushes the birthday bound
  * past 2³¹ distinct keys; the exact operators that key whole
  * relations on content hashes use THIS.
  *
  * Same cross-engine contract as [[PolyHash]]: plain 64-bit integer
  * ops on UTF-8 bytes, every intermediate far inside Long (max acc
  * ≈ 2³¹·37 + 255 ≈ 2³⁶·1.2), replayed in DuckDB with two
  * `list_reduce` folds.
  */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType || child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyhash64 needs a string or binary argument, got ${child.dataType}")

  private def isBinary: Boolean = child.dataType == BinaryType

  override def nullSafeEval(input: Any): Any = {
    val bytes =
      if (isBinary) input.asInstanceOf[Array[Byte]]
      else input.asInstanceOf[UTF8String].getBytes
    var a = 0L
    var b = 0L
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xffL
      a = (a * 31L + c) % 2147483647L
      b = (b * 37L + c) % 2147483629L
      i += 1
    }
    a * 2147483629L + b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val ch = ctx.freshName("ch")
      val src = if (isBinary) c else s"$c.getBytes()"
      s"""
         |byte[] $bytes = $src;
         |long $a = 0L; long $b = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  long $ch = $bytes[$i] & 0xffL;
         |  $a = ($a * 31L + $ch) % 2147483647L;
         |  $b = ($b * 37L + $ch) % 2147483629L;
         |}
         |${ev.value} = $a * 2147483629L + $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}
