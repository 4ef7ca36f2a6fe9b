package graft.functions

/** The GPT-2 byte→unicode symbol table (Radford et al. 2019's
  * bytes_to_unicode, reproduced from its published definition): every
  * possible UTF-8 BYTE gets a printable single-character symbol, so
  * BPE can merge ACROSS multibyte characters — 'é' (0xC3 0xA9) starts
  * as the two symbols "Ã" "©" and a learned merge can join them,
  * where the code-point walk keeps 'é' atomic forever. Printable
  * bytes (33–126, 161–172, 174–255) map to themselves-as-chars; the
  * 68 others (0–32, 127–160, 173) map to 256+k in increasing byte
  * order — so byte 32 (space) becomes U+0120 'Ġ', the leading-space
  * marker every GPT-lineage vocabulary shows.
  *
  * The mapping is a bijection byte ↔ char, so [[decode]] recovers the
  * exact original bytes of any concatenation of learned tokens — the
  * round-trip law NativeExprSpec asserts. The same table is replayed
  * arithmetically by the DuckDB oracles (ord → UTF-8 byte expansion →
  * the three CASE ranges), one definition per engine of the same
  * published constant.
  */
object ByteLevel {

  val byteToChar: Array[Char] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var shift = 0
    (0 until 256).foreach { b =>
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
    }
    out
  }

  val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Encode a string's UTF-8 bytes as the mapped symbol chars. */
  def encode(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = byteToChar(bytes(i) & 0xff)
      i += 1
    }
    new String(out)
  }

  /** Recover the original string from encoded symbols (token table
    * inspection / detokenization). Throws on a char outside the table —
    * that input was never byte-level-encoded.
    */
  def decode(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      bytes(i) = charToByte.getOrElse(s.charAt(i),
        throw new IllegalArgumentException(
          s"'${s.charAt(i)}' (U+${s.charAt(i).toInt.toHexString}) is not " +
            "a byte-level symbol — input was not byte-level encoded")).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}
