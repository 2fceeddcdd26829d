package graft.util

/** The one JSON string-escape table every emitter in this library uses
  * (sink blocks, logger records, the oracle dump) — quote, backslash,
  * the short escapes, and every other control char as `\\u%04x`. One
  * definition so the emitters cannot drift. */
object JsonText {

  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
