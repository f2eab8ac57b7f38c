package graft

/** Shared JSON string escaping for the harness mains (Bench, Verify) —
  * ONE copy so an escaping fix can never apply to one evidence file
  * and miss the other. Escapes backslash, quote, and ALL control
  * chars: a tab or CR in builder-authored SQL (or an exotic path)
  * would otherwise make the driver's json.load fail and zero the
  * round's evidence.
  */
private[graft] object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
