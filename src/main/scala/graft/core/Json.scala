package graft.core

/** Minimal JSON string escaping shared by the hand-rolled JSON emitters
  * (Bench's metrics line, RestServer's payloads) — one definition so an
  * escaping fix cannot drift between them.
  */
object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}
