package graft

/** JSON string escaping shared by the two driver-facing artifact writers
  * (Bench's one-line metrics JSON and Verify's oracle_sql.json). One copy:
  * the escape set must cover backslash, quote, and ALL control chars
  * (<0x20) — a tab or CR in builder-authored SQL would otherwise make the
  * driver's json.load fail and silently zero the round — and a fix to the
  * escape logic must reach both artifacts.
  */
private[graft] object Jsons {
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
