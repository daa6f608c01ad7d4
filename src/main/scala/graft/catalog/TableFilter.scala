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

  /** Continuous-aggregate-aware check (`tablefilter.go:139-160`): a cagg
    * hypertable is matched by its *view* schema/name — the user-facing
    * identity — not the materialization hypertable's internal name; a
    * cagg whose view identity is unknown never matches. */
  def matchesEntity(schema: String, table: String,
                    isContinuousAggregate: Boolean = false,
                    viewSchema: Option[String] = None,
                    viewName: Option[String] = None): Boolean = {
    if (isContinuousAggregate) {
      (viewSchema, viewName) match {
        case (Some(vs), Some(vn)) => matches(s"$vs.$vn")
        case _ => false
      }
    } else matches(s"$schema.$table")
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

  /** One token, `tablefilter.go:211-269` semantics:
    *   - wildcards `*`/`?`/`+` are active in BOTH quoted and unquoted
    *     tokens; inside quotes a literal wildcard is written `\*` etc.
    *   - unquoted tokens reject illegal characters (anything that isn't a
    *     letter, digit, underscore, or wildcard) and must start with a
    *     letter, underscore, or wildcard — like the reference, which
    *     errors instead of regex-escaping them
    *   - quoted tokens admit any character (regex-escaped when special)
    *   - length cap 63 (65 with the surrounding quotes)
    */
  private def compilePart(part: String): String = {
    val quoted = part.length >= 2 && part.head == '"' && part.last == '"'
    if (part.length > 63 && (!quoted || part.length > 65))
      throw new IllegalArgumentException(
        s"a pattern cannot be longer than 63 characters: '$part'")
    val body =
      if (quoted) part.substring(1, part.length - 1)
      else part.toLowerCase
    if (!quoted && body.nonEmpty) {
      val c0 = body.head
      if (!c0.isLetter && c0 != '_' && c0 != '*' && c0 != '?' && c0 != '+')
        throw new IllegalArgumentException(
          s"'$c0' is an illegal first character of pattern '$part'")
    }
    def escapeLiteral(c: Char, sb: StringBuilder): Unit =
      if ("\\^$.|![](){}*+?".indexOf(c) >= 0) sb.append('\\').append(c)
      else sb.append(c)
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (quoted && c == '\\' && i + 1 < body.length &&
          "*?+".indexOf(body.charAt(i + 1)) >= 0) {
        sb.append('\\').append(body.charAt(i + 1)); i += 1
      } else c match {
        case '*' => sb.append(".*")
        case '+' => sb.append(".+")
        case '?' => sb.append(".")
        case _ if quoted => escapeLiteral(c, sb)
        case _ if c.isLetterOrDigit || c == '_' => sb.append(c)
        case _ => throw new IllegalArgumentException(
          s"illegal character in pattern '$part' at index $i")
      }
      i += 1
    }
    sb.toString
  }
}
