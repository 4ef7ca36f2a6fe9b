package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.functions._

/** Column-level function surface of the engine.
  *
  * The reference pipeline uses only three scalar constructs
  * (SURVEY.md §2.3/§2.9): `TIMESTAMPTOSTRING`, `LCASE`, and `+` string
  * concatenation — all thin wrappers over codegen'd Spark built-ins here.
  * `polyFingerprint` is the one native Catalyst expression this engine
  * adds (ext/ text analysis).
  */
package object functions {

  /** ksqlDB `TIMESTAMPTOSTRING(epochMillis, fmt)`
    * (/root/reference/ksqldb-statements.sql:96; README.md:238).
    * Input is epoch millis (ksqlDB ROWTIME/WINDOWSTART are BIGINT millis).
    */
  def timestampToString(epochMillis: Column, fmt: String): Column =
    date_format(timestamp_millis(epochMillis), fmt)

  /** ksqlDB `LCASE` (/root/reference/ksqldb-statements.sql:14). */
  def lcase(c: Column): Column = lower(c)

  /** ksqlDB `EXTRACTJSONFIELD(json, '$.path')` — part of ksqlDB's scalar
    * surface for JSON-string payloads like the corpus' `events.props`
    * (TESTDATA.md). Thin wrapper over Spark's codegen'd
    * `get_json_object`: returns the field as STRING (ksqlDB semantics —
    * callers cast), null for missing paths or malformed JSON.
    */
  def extractJsonField(json: Column, path: String): Column =
    get_json_object(json, path)

  /** ksqlDB `FIRST_NAME + ' ' + LAST_NAME` — null-propagating string
    * concat (/root/reference/ksqldb-statements.sql:54). `concat` (not
    * `concat_ws`) matches the null-propagation semantics exactly.
    */
  def fullName(first: Column, last: Column): Column =
    concat(first, lit(" "), last)

  /** Deterministic 31-polynomial rolling-hash fingerprint (custom
    * codegen'd Catalyst expression, see [[graft.functions.PolyHash]]).
    */
  def polyFingerprint(c: Column): Column =
    Bridge.column(PolyHash(Bridge.expression(c)))

  /** 62-bit packed double polynomial fingerprint (see
    * [[graft.functions.PolyHash64]]) — the content-dedup key whose
    * birthday bound survives corpus scale.
    */
  def polyFingerprint64(c: Column): Column =
    Bridge.column(PolyHash64(Bridge.expression(c)))

  /** Energy-delta acoustic fingerprint of an 8-bit PCM buffer (custom
    * codegen'd Catalyst expression, see
    * [[graft.functions.PcmFingerprint]]).
    */
  def pcmFingerprint(c: Column): Column =
    Bridge.column(PcmFingerprint(Bridge.expression(c)))

  /** DEFLATE-compressed byte length (custom codegen'd Catalyst
    * expression, see [[graft.functions.DeflateLen]]) — the
    * compression-ratio quality signal.
    */
  def deflateLen(c: Column): Column =
    Bridge.column(DeflateLen(Bridge.expression(c)))

  /** Cosine similarity of two float/double vectors (custom codegen'd
    * Catalyst expression, see [[graft.functions.CosineSim]]) — the
    * fused-loop hot path for similarity search.
    */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  /** Integer dot product of two int/long vectors (custom codegen'd
    * Catalyst expression, see [[graft.functions.IntDot]]) — the exact
    * integer scoring kernel of the INT8-quantized similarity path.
    */
  def intDot(a: Column, b: Column): Column =
    Bridge.column(IntDot(Bridge.expression(a), Bridge.expression(b)))

  /** Per-document word term-frequencies `array<struct<word, tf>>` in one
    * row-local pass (custom codegen'd Catalyst expression, see
    * [[graft.functions.WordTfs]]) — deletes the (doc, word) exchange
    * from keyword extraction.
    */
  def wordTfs(c: Column): Column =
    Bridge.column(WordTfs(Bridge.expression(c)))

  /** Per-document character-TRIGRAM term-frequencies in one row-local
    * pass (custom codegen'd Catalyst expression, see
    * [[graft.functions.CharTrigramTfs]]) — the fused hot path of the
    * char-n-gram language ID: identical semantics to
    * `wordTfs(charTrigrams(c))` without the 4× re-encoded string
    * round-trip.
    */
  def charTrigramTfs(c: Column): Column =
    Bridge.column(CharTrigramTfs(Bridge.expression(c)))

  /** C4 page-cleaning statistics struct (line filter + page flags) in
    * one row-local pass (custom codegen'd Catalyst expression, see
    * [[graft.functions.C4Stats]]).
    */
  def c4Stats(c: Column): Column =
    Bridge.column(C4Stats(Bridge.expression(c)))
}
