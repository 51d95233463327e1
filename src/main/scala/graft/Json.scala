package graft

/** Single JSON string escaper for the tool mains (Bench/Verify emit
  * hand-assembled JSON lines; two drifting copies of this logic is how a
  * control character ends up breaking the driver's parse).
  */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
