package graft.config

/** Minimal parser for the momyre.yml config shape (reference
  * `momyre.yml:1-15`, parse loop `run.go:82-125`). Supports exactly the
  * subset the reference uses: top-level `inp`/`out` scalars and a `tables:`
  * map of `table -> {column -> type}` with an optional nested `defaults:`
  * sub-map per table. No external YAML dependency (zero-egress build).
  *
  * Divergence from the reference, by design:
  *  - a declared `_id` column is ignored (parity with `run.go:105-107`);
  *  - `defaults:` is parsed and carried (the reference parses it but never
  *    applies it, `mysql.go:286-287` — we keep it inert too, documented).
  */
object ConfigParser {
  def parse(text: String): MappingConfig = {
    // strip comments + blank lines, keep indentation
    val lines = text.linesIterator
      .map(l => l.replaceAll("(?<!\\\\)#.*$", "").replaceAll("\\s+$", ""))
      .filter(_.trim.nonEmpty)
      .toVector

    var inp = ""
    var out = ""
    val tables = Vector.newBuilder[TableSpec]

    var i = 0
    def indentOf(s: String) = s.takeWhile(_ == ' ').length
    def keyVal(s: String): (String, String) = {
      val idx = s.indexOf(':')
      require(idx > 0, s"malformed config line: $s")
      (unquote(s.take(idx).trim), unquote(s.drop(idx + 1).trim))
    }
    def unquote(s: String): String =
      if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
        s.substring(1, s.length - 1)
      else s

    while (i < lines.length) {
      val (k, v) = keyVal(lines(i))
      k match {
        case "inp" => inp = v; i += 1
        case "out" => out = v; i += 1
        case "tables" =>
          i += 1
          val tblIndent = if (i < lines.length) indentOf(lines(i)) else 0
          while (i < lines.length && indentOf(lines(i)) == tblIndent) {
            val (tname, _) = keyVal(lines(i)); i += 1
            val cols = Vector.newBuilder[ColumnSpec]
            var defaults = Map.empty[String, String]
            val colIndent = if (i < lines.length) indentOf(lines(i)) else 0
            while (i < lines.length && indentOf(lines(i)) >= colIndent && indentOf(lines(i)) > tblIndent) {
              val (cname, cval) = keyVal(lines(i)); i += 1
              if (cname == "defaults") {
                // nested defaults sub-map (run.go:108-115)
                while (i < lines.length && indentOf(lines(i)) > colIndent) {
                  val (dk, dv) = keyVal(lines(i)); i += 1
                  defaults += (dk -> dv)
                }
              } else if (cname != "_id") { // implicit PK, run.go:105-107
                cols += ColumnSpec(cname, cval)
              }
            }
            val withDefaults = cols.result().map(c =>
              c.copy(default = defaults.get(c.sourceName)))
            tables += TableSpec(tname, withDefaults)
          }
        case other => i += 1 // unknown top-level keys are ignored
      }
    }
    MappingConfig(inp, out, tables.result())
  }
}
