package graft.catalog

/** Include/exclude table filtering with the reference's wildcard
  * semantics — `internal/systemcatalog/tablefiltering/tablefilter.go:29-183`
  * and the documented rules at `README.md:535-625`:
  *
  *   - patterns are `schema.table` with wildcards `*` (any run, incl.
  *     empty), `+` (one or more chars), `?` (exactly one char)
  *   - unquoted identifier parts are case-folded to lowercase
  *   - quoted parts (`"Foo"`) match literally, case-sensitively
  *   - excludes win over includes
  *
  * Spark-first: the compiled patterns are exposed as Java-regex strings so
  * selection can be a Catalyst `rlike` filter (pushed into the scan), not
  * a driver-side loop. `matches` exists for driver-side catalog pruning
  * (choosing which streams to subscribe at all — the cheaper place to
  * filter, as in the reference).
  */
final case class TableFilter(includes: Seq[String], excludes: Seq[String]) {
  val includeRegexes: Seq[String] = includes.map(TableFilter.compile)
  val excludeRegexes: Seq[String] = excludes.map(TableFilter.compile)

  private val inc = includeRegexes.map(_.r)
  private val exc = excludeRegexes.map(_.r)

  /** Excludes win; empty include list means include-all
    * (`tablefilter.go:68-95`). */
  def matches(canonicalName: String): Boolean = {
    if (exc.exists(_.matches(canonicalName))) false
    else inc.isEmpty || inc.exists(_.matches(canonicalName))
  }
}

object TableFilter {

  /** Compile one `schema.table` pattern to an anchored Java regex,
    * mirroring `tablefiltering/tablefilter.go:104-183`: regex-escape
    * everything, then `*`→`.*`, `+`→`.+`, `?`→`.`; unquoted parts fold
    * to lowercase; quoted parts are literal.
    */
  def compile(pattern: String): String = {
    val parts = splitQualified(pattern)
    parts.map(compilePart).mkString("^", "\\.", "$")
  }

  /** Split on the first '.' outside double quotes. */
  private def splitQualified(p: String): Seq[String] = {
    var inQuote = false
    val idx = p.indexWhere {
      case '"' => inQuote = !inQuote; false
      case '.' => !inQuote
      case _   => false
    }
    if (idx < 0) Seq(p) else Seq(p.substring(0, idx), p.substring(idx + 1))
  }

  private def compilePart(part: String): String = {
    val (body, quoted) =
      if (part.length >= 2 && part.head == '"' && part.last == '"')
        (part.substring(1, part.length - 1), true)
      else (part.toLowerCase, false)
    val sb = new StringBuilder
    body.foreach {
      case '*' if !quoted => sb.append(".*")
      case '+' if !quoted => sb.append(".+")
      case '?' if !quoted => sb.append(".")
      case c if "\\^$.|![](){}".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c if !quoted && "*+?".indexOf(c) >= 0 => sb.append(c) // unreachable
      case c if quoted && "*+?".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.toString
  }
}
