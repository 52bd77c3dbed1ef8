package graft

/** The one JSON string escaper for the harness's hand-rolled JSON
  * (Bench's metric line, Verify's oracle/error dumps) — backslash,
  * quote, and ALL control chars (<0x20); a stray tab or CR in
  * builder-authored SQL or an exception message would otherwise break
  * the driver's json.load and silently zero a round's artifacts.
  */
object Jsons {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
