package graft.filter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr

/** P5 — the expression event filter
  * (`internal/eventing/eventfiltering/eventfilter.go:47-152`; config
  * `README.md:366-389`).
  *
  * The reference embeds the Expr language (expr-lang/expr) and evaluates
  * user conditions like `value.op == "c" && value.after.user_id > 5`
  * against each envelope. Spark-first: translate the documented Expr
  * subset to a Spark SQL expression and let Catalyst compile it — the
  * filter then participates in predicate pushdown instead of running as
  * an interpreted per-row closure.
  *
  * The translator is a real tokenizer + recursive-descent parser (not
  * textual replacement), so operators inside string literals survive
  * byte-for-byte and unsupported constructs fail loudly at parse time.
  *
  * Supported dialect subset:
  * `==`/`!=`/`<`/`<=`/`>`/`>=`, `&&`/`||`/`!`, parentheses, string/number/
  * boolean/nil literals, dotted field paths, `in [..]` / `not in [..]`,
  * `matches`/`contains`/`startsWith`/`endsWith`, ternary `?:`, nil-
  * coalescing `??`, numeric `+ - * / %`, array literals, and the stdlib
  * builtins with exact Catalyst twins: `len` (polymorphic
  * string/binary/array/map via the custom PolyLen expression), `upper
  * lower trim trimPrefix trimSuffix hasPrefix hasSuffix replace split
  * repeat indexOf abs ceil floor round int float string min max`
  * (`split` requires a literal separator — regex-quoted for Spark's
  * regex-based split), plus the array-closure builtins
  * `filter map all any none one count` with `#`/`#.field` placeholders
  * and the `{...}` brace shorthand, translated to Catalyst higher-order
  * functions (`filter`/`transform`/`forall`/`exists`/`size∘filter`);
  * postfix indexing/slicing `x[i]` / `x[a:b]` / `x[:b]` / `x[a:]`
  * (0-based end-exclusive over strings/arrays, key lookup over maps,
  * negative indices count from the end, via the polymorphic
  * PolyAt/PolySlice expressions); map literals
  * `{a: 1, "b": 2}` and `in` over maps (KEY membership) / array values
  * (graft_in); `now()` (a PLAN-TIME constant — one value per query, the
  * deterministic deviation a distributed filter needs), `duration()`
  * over Go literals → interval constants, `date()`, and `type()` with
  * expr-lang's type names; wave 3: inclusive integer ranges `a..b`
  * (empty when descending, usable with `in`/closures), `let x = e;`
  * binding preludes (inlined at each reference — Catalyst CSE dedups),
  * `find`/`findIndex` closures (nil / -1 when absent), `take`,
  * `sum` (type-correct zero, empty sums to 0), and `reduce` with the
  * `#acc` accumulator placeholder (init's type is the accumulator
  * type, Spark's aggregate contract); wave 5: bit builtins
  * (`bitand/bitor/bitxor/bitnot/bitshl/bitshr/bitushr` → Catalyst
  * bitwise operators) and `lastIndexOf` (reverse-trick compile,
  * 0-based, -1 absent).
  * Literal `matches` patterns are
  * checked against a non-RE2 reject-list (backreferences, lookarounds,
  * atomic groups, possessive quantifiers) since expr-lang compiles Go
  * RE2 while `rlike` is java.util.regex. Envelope field paths are
  * mapped to columns: `value.after.x`/`value.before.x`/`value.x`/`key.x`
  * address the payload (the flat envelope columns here);
  * `keySchema.*`/`valueSchema.*` — schema introspection — folds at
  * COMPILE time against the plan-time-constant Debezium descriptor
  * (the reference env's other two members, `eventfilter.go:127-138`).
  * Per-filter table scoping and the `default` inversion mirror
  * `eventfilter.go:95-152`.
  */
final case class EventFilter(
    condition: String,
    tables: graft.catalog.TableFilter = graft.catalog.TableFilter(Nil, Nil),
    defaultValue: Boolean = true) {

  /** The Catalyst predicate for this filter. */
  def predicate: Column = expr(EventFilter.translate(condition))

  /** Apply to an envelope DataFrame carrying a `table_name` column:
    * events on non-matching tables pass through with `defaultValue`
    * semantics (`eventfilter.go:118-131`: filters scoped to other tables
    * yield their default — ALL filters are AND-ed).
    */
  def apply(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // len() translates to the polymorphic graft_len expression —
    // idempotent registration into this session's function registry
    graft.GraftExtensions.registerTo(df.sparkSession)
    // Scoping matches the CANONICAL `schema.table` name — the identity
    // TableFilter patterns compile against (`^schema\.table$`). A frame
    // carrying only `table_name` (pre-resolution WAL shapes) matches on
    // the bare name; rlike against an anchored schema-qualified pattern
    // would otherwise NEVER match and silently reduce every scoped
    // filter to its default.
    val nameCol =
      if (df.columns.contains("schema_name"))
        concat_ws(".", col("schema_name"), col("table_name"))
      else col("table_name")
    val inScope = (tables.includeRegexes.map(nameCol.rlike) match {
      case Nil => Seq(lit(true))
      case rs  => rs
    }).reduce(_ || _) &&
      !(tables.excludeRegexes.map(nameCol.rlike) match {
        case Nil => Seq(lit(false))
        case rs  => rs
      }).reduce(_ || _)
    df.filter(when(inScope, predicate).otherwise(lit(defaultValue)))
  }
}

object EventFilter {

  // ------------------------------- lexer -------------------------------

  private sealed trait Tok
  private final case class TStr(value: String) extends Tok   // decoded
  private final case class TNum(text: String) extends Tok
  private final case class TIdent(path: String) extends Tok  // dotted path
  private final case class TOp(sym: String) extends Tok

  private def lex(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    def fail(msg: String) =
      throw new IllegalArgumentException(s"$msg at index $i in filter condition: $s")
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || c == '\'') {
        // expr-lang string literal with backslash escapes
        val quote = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < s.length && !closed) {
          s.charAt(i) match {
            case '\\' if i + 1 < s.length =>
              s.charAt(i + 1) match {
                case 'n'   => sb.append('\n')
                case 't'   => sb.append('\t')
                case 'r'   => sb.append('\r')
                case other => sb.append(other) // \" \' \\ and any passthrough
              }
              i += 2
            case `quote` => closed = true; i += 1
            case ch      => sb.append(ch); i += 1
          }
        }
        if (!closed) fail("unterminated string literal")
        out += TStr(sb.toString)
      } else if (c.isDigit ||
                 (c == '.' && i + 1 < s.length && s.charAt(i + 1).isDigit)) {
        val start = i
        // a '.' followed by another '.' is the range operator, not a
        // decimal point — "1..5" lexes as TNum(1), TOp(..), TNum(5)
        while (i < s.length && (s.charAt(i).isDigit ||
               (s.charAt(i) == '.' &&
                 !(i + 1 < s.length && s.charAt(i + 1) == '.')) ||
               s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
               ((s.charAt(i) == '+' || s.charAt(i) == '-') && i > start &&
                (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
        val numText = s.substring(start, i)
        // fail-loudly-at-parse contract: a malformed literal like '1.2.3'
        // or '1e' must not be spliced into SQL for Spark analysis to trip
        // over later
        if (!numText.matches("""(\d+(\.\d+)?|\.\d+)([eE][+-]?\d+)?"""))
          fail(s"malformed numeric literal '$numText'")
        out += TNum(numText)
      } else if (c.isLetter || c == '_') {
        // a '.' followed by another '.' is the range operator — 'lo..hi'
        // must lex as two identifiers, not one dotted path
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit ||
               s.charAt(i) == '_' ||
               (s.charAt(i) == '.' &&
                 !(i + 1 < s.length && s.charAt(i + 1) == '.')))) i += 1
        out += TIdent(s.substring(start, i))
      } else if (c == '#') {
        // closure placeholder, optionally with member access: # or #.a.b
        val start = i
        i += 1
        while (i < s.length && (s.charAt(i).isLetterOrDigit ||
               s.charAt(i) == '_' ||
               (s.charAt(i) == '.' &&
                 !(i + 1 < s.length && s.charAt(i + 1) == '.')))) i += 1
        out += TIdent(s.substring(start, i))
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        two match {
          // NOTE: "?." lexes greedily, so a ternary whose then-branch
          // starts with the brace-closure member shorthand (`c ? .f : x`)
          // must parenthesize (`c ? (.f) : x`) — same greediness as
          // expr-lang's own scanner; the unparenthesized form fails
          // loudly at parse, never silently re-reads
          case "==" | "!=" | "<=" | ">=" | "&&" | "||" | "??" | ".." | "?." =>
            out += TOp(two); i += 2
          case _ =>
            c match {
              case '<' | '>' | '!' | '(' | ')' | '[' | ']' | ',' | '?' | ':' |
                   '+' | '-' | '*' | '/' | '%' | '{' | '}' | '.' | '=' | ';' =>
                out += TOp(c.toString); i += 1
              case _ => fail(s"unexpected character '$c'")
            }
        }
      }
    }
    out.toList
  }

  // ------------------------------- parser ------------------------------

  private final class Parser(cond: String, var toks: List[Tok]) {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg in filter condition: $cond")

    // stack of active closure lambda variables; `#` binds the innermost
    private var lambdaVars: List[String] = Nil
    // accumulator variables of enclosing reduce() closures (`#acc`)
    private var accVars: List[String] = Nil
    private var lambdaSeq = 0
    // let-bound names → their translated (parenthesized) SQL
    private[EventFilter] var bindings: Map[String, String] = Map.empty

    private def placeholderPath(p: String): String = {
      if (p == "#acc" || p.startsWith("#acc.")) {
        val a = accVars.headOption.getOrElse(
          fail(s"accumulator placeholder '$p' outside a reduce closure"))
        if (p == "#acc") return a
        val segs = p.substring("#acc.".length).split('.')
        if (segs.isEmpty || segs.exists(_.isEmpty)) fail(s"malformed placeholder '$p'")
        return (a +: segs.toSeq.map(s => s"`$s`")).mkString(".")
      }
      val v = lambdaVars.headOption.getOrElse(
        fail(s"placeholder '$p' outside a closure"))
      if (p == "#") v
      else {
        // fail-loudly-at-parse: '#x' (no dot) and '#.'/'#.a..b' (empty
        // segments) are not valid placeholder member paths
        if (!p.startsWith("#.")) fail(s"malformed placeholder '$p'")
        val segs = p.substring(2).split('.')
        if (segs.isEmpty || segs.exists(_.isEmpty)) fail(s"malformed placeholder '$p'")
        (v +: segs.toSeq.map(s => s"`$s`")).mkString(".")
      }
    }

    /** `let name = expr; …` prelude (expr-lang variable bindings):
      * each binding is translated once and INLINED at every reference —
      * the natural columnar reading of a pure expression language
      * (Catalyst's common-subexpression elimination dedups the work).
      * Bindings may reference earlier bindings; member access on a
      * binding uses indexing (`m["k"]`), not dotted paths. */
    // words that primary()/comparison() resolve BEFORE the bindings
    // lookup — a binding named one of these would silently lose
    private val reservedWords = Set("let", "nil", "true", "false", "not",
      "in", "matches", "contains", "startsWith", "endsWith")

    def parseLets(): Unit = {
      while (peek.contains(TIdent("let"))) {
        next()
        val name = next() match {
          case TIdent(n) if reservedWords(n) =>
            fail(s"let binding '$n' shadows a reserved word")
          case TIdent(n) if !n.contains(".") && !n.startsWith("#") => n
          case other => fail(s"expected let variable name, got $other")
        }
        expectOp("=")
        val value = ternary()
        expectOp(";")
        bindings += name -> s"($value)"
      }
    }

    def peek: Option[Tok] = toks.headOption
    def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil    => fail("unexpected end of expression")
    }
    def expectOp(sym: String): Unit = next() match {
      case TOp(`sym`) => ()
      case other      => fail(s"expected '$sym', got $other")
    }
    def peekOp(sym: String): Boolean = peek.contains(TOp(sym))
    def eatOp(sym: String): Boolean =
      if (peekOp(sym)) { next(); true } else false

    // precedence ladder (loosest first), matching expr-lang's operator
    // powers: ?: | ||(10) | &&(15) | comparison(20) | additive(30) |
    // unary not/!(50) | multiplicative(60) | unary -(90) | ??(500) |
    // primary. Consequences worth noting: `!a == b` negates a first
    // (50>20); `not a * b` negates the product (60>50); `!x ?? y`
    // coalesces first (500>50) — all as the reference dialect evaluates
    // them, so unparenthesized filters keep their meaning.
    def ternary(): String = {
      val c = orExpr()
      if (eatOp("?")) {
        val a = orExpr()
        expectOp(":")
        val b = ternary()
        s"IF($c, $a, $b)"
      } else c
    }

    def orExpr(): String = {
      var l = andExpr()
      while (eatOp("||")) l = s"($l OR ${andExpr()})"
      l
    }

    def andExpr(): String = {
      var l = comparison()
      while (eatOp("&&")) l = s"($l AND ${comparison()})"
      l
    }

    def comparison(): String = {
      val l = rangeExpr()
      peek match {
        case Some(TOp(sym @ ("==" | "!=" | "<" | "<=" | ">" | ">="))) =>
          next()
          val r = rangeExpr()
          // expr-lang `x == nil` is a real nil TEST (true/false), but SQL
          // `x = NULL` is NULL — compile nil comparisons to IS [NOT] NULL
          // (either side; `nil == nil` folds to true like expr-lang)
          (sym, l, r) match {
            case ("==", "NULL", "NULL") => "true"
            case ("!=", "NULL", "NULL") => "false"
            case ("==", _, "NULL") => s"$l IS NULL"
            case ("==", "NULL", _) => s"$r IS NULL"
            case ("!=", _, "NULL") => s"$l IS NOT NULL"
            case ("!=", "NULL", _) => s"$r IS NOT NULL"
            case _ =>
              val sql = sym match { case "==" => "="; case "!=" => "<>"; case s => s }
              s"$l $sql $r"
          }
        case Some(TIdent("matches")) =>
          next()
          val before = toks
          val r = rangeExpr()
          // literal pattern (exactly one TStr consumed): reject non-RE2
          // syntax — expr-lang compiles Go RE2, Spark rlike is Java regex;
          // constructs RE2 lacks would silently diverge
          before match {
            case TStr(pat) :: rest if rest eq toks => checkRe2(pat, cond)
            case _                                 => ()
          }
          s"rlike($l, $r)"
        case Some(TIdent("contains"))   => next(); s"contains($l, ${rangeExpr()})"
        case Some(TIdent("startsWith")) => next(); s"startswith($l, ${rangeExpr()})"
        case Some(TIdent("endsWith"))   => next(); s"endswith($l, ${rangeExpr()})"
        case Some(TIdent("in"))         => next(); inRhs(l, negate = false)
        case Some(TIdent("not")) =>
          next()
          next() match {
            case TIdent("in") => inRhs(l, negate = true)
            case other        => fail(s"expected 'in' after 'not', got $other")
          }
        case _ => l
      }
    }

    /** Range literal `a..b` (expr-lang power 25 — between comparisons
      * and additive): an INCLUSIVE integer array. Spark's `sequence`
      * counts DOWN when a > b where expr-lang yields an empty range, so
      * the descending case is pinned to empty explicitly. */
    def rangeExpr(): String = {
      val l = additive()
      if (eatOp("..")) {
        val r = additive()
        s"IF(($l) <= ($r), sequence(CAST($l AS BIGINT), CAST($r AS BIGINT)), " +
          "CAST(array() AS ARRAY<BIGINT>))"
      } else l
    }

    /** `l in <rhs>`: a `[..]` literal keeps the SQL IN-list form; any
      * other operand (range, map literal, array-valued path, slice…)
      * becomes the polymorphic graft_in — array membership, or KEY
      * membership for maps, as the dialect defines `in` over each type. */
    def inRhs(l: String, negate: Boolean): String = {
      val base =
        if (peekOp("[")) s"$l IN ${listLiteral()}"
        else s"graft_in($l, ${rangeExpr()})"
      if (negate) s"(NOT $base)" else base
    }

    def listLiteral(): String = {
      expectOp("[")
      val items = scala.collection.mutable.ListBuffer.empty[String]
      if (!peekOp("]")) {
        items += additive()
        while (eatOp(",")) items += additive()
      }
      expectOp("]")
      items.mkString("(", ", ", ")")
    }

    def additive(): String = {
      var l = notUnary()
      while (peekOp("+") || peekOp("-")) {
        val op = next().asInstanceOf[TOp].sym
        l = s"($l $op ${notUnary()})"
      }
      l
    }

    def notUnary(): String =
      if (eatOp("!")) s"(NOT ${notUnary()})"
      else peek match {
        // keyword form `not x`; binary `l not in [..]` is consumed in
        // comparison() after an operand, so `not` at operand position is
        // always unary. Power 50: absorbs * / % (60) and ?? (500) but
        // not + - (30) or comparisons (20).
        case Some(TIdent("not")) => next(); s"(NOT ${notUnary()})"
        case _ => multiplicative()
      }

    def multiplicative(): String = {
      var l = negUnary()
      while (peekOp("*") || peekOp("/") || peekOp("%")) {
        val op = next().asInstanceOf[TOp].sym
        l = s"($l $op ${negUnary()})"
      }
      l
    }

    def negUnary(): String =
      if (eatOp("-")) s"(- ${negUnary()})" else nullCoalesce()

    def nullCoalesce(): String = {
      // expr-lang power 500 — the tightest binary, inside even unary -.
      // A negative-literal RHS (`x ?? -1`) still reads naturally: the
      // sign is absorbed into the coalesce operand
      def operand(): String =
        if (eatOp("-")) s"(- ${operand()})" else postfix(primary())
      var l = postfix(primary())
      while (eatOp("??")) l = s"coalesce($l, ${operand()})"
      l
    }

    /** Postfix index/slice chain: `x[i]`, `x[a:b]`, `x[:b]`, `x[a:]`,
      * `x[:]` — 0-based, end-exclusive, over strings/arrays (index also
      * over maps), via the polymorphic graft_at/graft_slice expressions
      * (type dispatch at analysis, builtin codegen at run time).
      * Negative indices count from the end — `x[-1]` is the last
      * element, python/expr-lang semantics, literal or computed. */
    def postfix(e0: String): String = {
      var e = e0
      var more = true
      while (more) {
        if (eatOp("[")) {
          def sliceTo(a: String): String = {
            val b = if (peekOp("]")) s"graft_len($e)" else ternary()
            s"graft_slice($e, $a, $b)"
          }
          if (eatOp(":")) { e = sliceTo("0"); expectOp("]") }
          else {
            val a = ternary()
            if (eatOp(":")) { e = sliceTo(a); expectOp("]") }
            else { expectOp("]"); e = s"graft_at($e, $a)" }
          }
        } else if (eatOp("?.")) {
          // wave 7 — optional chaining: `a?.b.c` is nil-safe member
          // access. graft_at already yields nil on a nil base for
          // map/array/string, and its struct arm (PolyAt) rides
          // GetStructField's null propagation — so `?.` and `.` compile
          // IDENTICALLY, which is exactly expr-lang's semantics lifted
          // to columns (every access is already total). The operator
          // exists so reference conditions parse verbatim.
          next() match {
            case TIdent(path) if !path.startsWith("#") =>
              path.split('.').foreach { seg => e = s"graft_at($e, ${sqlString(seg)})" }
            case other => fail(s"expected field name after '?.', got $other")
          }
        } else more = false
      }
      e
    }

    def primary(): String = next() match {
      case TStr(v)  => sqlString(v)
      case TNum(t)  => t
      case TOp("(") => val e = ternary(); expectOp(")"); s"($e)"
      case TOp("[") =>
        // array literal as a value (expr-lang array syntax); `in [..]`
        // keeps its dedicated IN-list form in comparison()
        val items = scala.collection.mutable.ListBuffer.empty[String]
        if (!peekOp("]")) {
          items += ternary()
          while (eatOp(",")) items += ternary()
        }
        expectOp("]")
        items.mkString("array(", ", ", ")")
      case TOp("{") =>
        // map literal {a: 1, "b": 2} (the closure brace shorthand eats
        // its '{' inside closureCall, so '{' at operand position is
        // always a map)
        val items = scala.collection.mutable.ListBuffer.empty[String]
        def entry(): Unit = {
          val key = next() match {
            case TIdent(k) if !k.contains(".") && !k.startsWith("#") => k
            case TStr(k) => k
            case other   => fail(s"expected map key, got $other")
          }
          expectOp(":")
          items += sqlString(key)
          items += ternary()
        }
        if (!peekOp("}")) { entry(); while (eatOp(",")) entry() }
        expectOp("}")
        items.mkString("map(", ", ", ")")
      case TIdent("true")  => "true"
      case TIdent("false") => "false"
      case TIdent("nil")   => "NULL"
      case TIdent(name) if peekOp("(") => call(name)
      case TIdent(p) if p.startsWith("#") => placeholderPath(p)
      case TOp(".") =>
        // expr-lang brace-closure member shorthand: {.field op ...}
        next() match {
          case TIdent(path) => placeholderPath("#." + path)
          case other        => fail(s"expected field name after '.', got $other")
        }
      case TIdent(path) if bindings.contains(path) => bindings(path)
      case TIdent(path) if path.contains(".") &&
          bindings.contains(path.takeWhile(_ != '.')) =>
        fail(s"dotted access on let binding '$path' — index it instead " +
          s"""(${path.takeWhile(_ != '.')}["${path.dropWhile(_ != '.').drop(1)}"])""")
      case TIdent(path)    => mapPath(path)
      case other => fail(s"unexpected token $other")
    }

    /** expr-lang array-closure builtins → Catalyst higher-order
      * functions. The closure body may use `#` (the item), `#.field`, or
      * the brace shorthand `{.field ...}`; nested closures bind `#` to
      * the innermost, matching expr-lang. Lambdas compile into the same
      * codegen'd plan as hand-written `exists`/`forall`/`filter` columns
      * — the filter stays a single narrow projection at any scale. */
    def closureCall(name: String): String = {
      val arr = ternary()
      expectOp(",")
      val v = s"x${lambdaSeq}_"
      lambdaSeq += 1
      if (name == "reduce") {
        // reduce(arr, <body with # and #acc>, init) → aggregate(). The
        // init's TYPE is the accumulator type (Spark's aggregate
        // contract) — `reduce(xs, #acc + #, int(0))` for long arrays;
        // a mismatched init fails loudly at analysis, never silently.
        val a = s"acc${lambdaSeq}_"
        lambdaSeq += 1
        lambdaVars = v :: lambdaVars
        accVars = a :: accVars
        val braced = eatOp("{")
        val body = ternary()
        if (braced) expectOp("}")
        lambdaVars = lambdaVars.tail
        accVars = accVars.tail
        expectOp(",")
        val init = ternary()
        expectOp(")")
        return s"aggregate($arr, $init, ($a, $v) -> $body)"
      }
      lambdaVars = v :: lambdaVars
      val saved = toks
      val braced = eatOp("{")
      val body = ternary()
      if (braced) expectOp("}")
      lambdaVars = lambdaVars.tail
      // groupBy consumes the key lambda under TWO bound variables (keys
      // projection + per-key filter) — re-parse the identical token
      // span with a fresh name; tokens are immutable so the rewind is a
      // pointer reset
      val (vars, bodies) =
        if (name == "groupBy") {
          val v2 = s"x${lambdaSeq}_"
          lambdaSeq += 1
          toks = saved
          lambdaVars = v2 :: lambdaVars
          val braced2 = eatOp("{")
          val body2 = ternary()
          if (braced2) expectOp("}")
          lambdaVars = lambdaVars.tail
          (Seq(v, v2), Seq(body, body2))
        } else (Seq(v), Seq(body))
      expectOp(")")
      name match {
        case "filter" => s"filter($arr, $v -> $body)"
        case "map"    => s"transform($arr, $v -> $body)"
        case "all"    => s"forall($arr, $v -> $body)"
        case "any"    => s"exists($arr, $v -> $body)"
        case "none"   => s"(NOT exists($arr, $v -> $body))"
        case "one"    => s"(size(filter($arr, $v -> $body)) = 1)"
        case "count"  => s"size(filter($arr, $v -> $body))"
        // find: first matching element or nil; findIndex: 0-based index
        // of the first match, -1 when absent (the dialect's documented
        // reading of the expr-lang pair)
        case "find"      => s"graft_at(filter($arr, $v -> $body), 0)"
        case "findIndex" => s"(array_position(transform($arr, $v -> $body), true) - 1)"
        // findLast / findLastIndex: the same pair scanned from the end.
        // The predicate column appears twice in findLastIndex's CASE —
        // a pure per-row expression, so double evaluation is just work,
        // never a semantic hazard
        case "findLast" => s"graft_at(reverse(filter($arr, $v -> $body)), 0)"
        case "findLastIndex" =>
          val tr = s"array_position(reverse(transform($arr, $v -> $body)), true)"
          s"(CASE WHEN $tr = 0 THEN -1 ELSE graft_len($arr) - $tr END)"
        // sortBy: expr-lang's STABLE ascending sort by key function —
        // decorate with (key, original index, value), sort by the
        // struct's natural field order (index breaks key ties, which IS
        // stability), undecorate
        case "sortBy" =>
          val i = s"i${lambdaSeq}_"; val z = s"z${lambdaSeq}_"
          lambdaSeq += 1
          s"transform(array_sort(transform($arr, ($v, $i) -> " +
            s"struct(($body) AS k, $i AS p, $v AS x))), $z -> $z.x)"
        // groupBy: map from each distinct key to the elements producing
        // it, keys in first-occurrence order (array_distinct's
        // contract). The key lambda is needed under TWO different bound
        // variables (keys projection + per-key filter), so the body was
        // parsed twice from the same token span — see closureCall.
        // Spark maps reject null keys (NULL_MAP_KEY aborts the job), so
        // a nil-yielding key closure nil-propagates the whole result —
        // the same total-function stance as every other builtin here
        case "groupBy" =>
          val body2 = bodies(1)
          val v2 = vars(1)
          val k = s"k${lambdaSeq}_"
          val n = s"n${lambdaSeq}_"
          lambdaSeq += 1
          val keysRaw = s"transform($arr, $v -> $body)"
          val keys = s"array_distinct($keysRaw)"
          s"CASE WHEN exists($keysRaw, $n -> $n IS NULL) THEN NULL " +
            s"ELSE map_from_arrays($keys, transform($keys, $k -> " +
            s"filter($arr, $v2 -> ($body2) <=> $k))) END"
      }
    }

    /** expr-lang built-in functions (the stdlib subset with exact Spark
      * SQL twins — `eventfilter.go:73-83` compiles the full language;
      * anything outside this list still fails loudly). */
    def call(name: String): String = {
      expectOp("(")
      if (Set("filter", "map", "all", "any", "none", "one", "count",
          "find", "findIndex", "findLast", "findLastIndex", "sortBy",
          "groupBy", "reduce")(name))
        return closureCall(name)
      val args = scala.collection.mutable.ListBuffer.empty[String]
      // raw value of an argument that was exactly one string literal —
      // needed where the Spark twin takes a regex but expr-lang a
      // literal (split), mirroring the matches RE2 pre-check
      val litArgs = scala.collection.mutable.ListBuffer.empty[Option[String]]
      def parseArg(): Unit = {
        val before = toks
        val sql = ternary()
        args += sql
        litArgs += (before match {
          case TStr(v) :: rest if rest eq toks => Some(v)
          case _                               => None
        })
      }
      if (!peekOp(")")) {
        parseArg()
        while (eatOp(",")) parseArg()
      }
      expectOp(")")
      def arity(n: Int): Unit = if (args.length != n)
        fail(s"$name expects $n argument(s), got ${args.length}")
      name match {
        // graft_len = custom PolyLen expression: expr-lang len is
        // type-dispatched (string/bytes/array/map); Spark's length is
        // string-only and size is array-only
        case "len"   => arity(1); s"graft_len(${args(0)})"
        case "upper" => arity(1); s"upper(${args(0)})"
        case "lower" => arity(1); s"lower(${args(0)})"
        case "trim" =>
          if (args.length == 1) s"trim(${args(0)})"
          else { arity(2); s"trim(BOTH ${args(1)} FROM ${args(0)})" }
        case "trimPrefix" =>
          arity(2)
          s"IF(startswith(${args(0)}, ${args(1)}), substring(${args(0)}, length(${args(1)}) + 1), ${args(0)})"
        case "trimSuffix" =>
          arity(2)
          s"IF(endswith(${args(0)}, ${args(1)}), left(${args(0)}, length(${args(0)}) - length(${args(1)})), ${args(0)})"
        case "hasPrefix" => arity(2); s"startswith(${args(0)}, ${args(1)})"
        case "hasSuffix" => arity(2); s"endswith(${args(0)}, ${args(1)})"
        case "replace"   => arity(3); s"replace(${args(0)}, ${args(1)}, ${args(2)})"
        // expr-lang split is LITERAL; Spark's split takes a Java regex —
        // only literal separators translate (regex-quoted), else fail
        case "split" =>
          arity(2)
          val sep = litArgs(1).getOrElse(
            fail("split separator must be a string literal in the columnar subset"))
          s"split(${args(0)}, ${sqlString(java.util.regex.Pattern.quote(sep))})"
        case "repeat"    => arity(2); s"repeat(${args(0)}, ${args(1)})"
        // expr-lang indexOf: 0-based, -1 when absent; instr is 1-based, 0
        case "indexOf" => arity(2); s"(instr(${args(0)}, ${args(1)}) - 1)"
        case "abs"   => arity(1); s"abs(${args(0)})"
        case "ceil"  => arity(1); s"ceiling(${args(0)})"
        case "floor" => arity(1); s"floor(${args(0)})"
        case "round" => arity(1); s"round(${args(0)})"
        case "int"    => arity(1); s"CAST(${args(0)} AS BIGINT)"
        case "float"  => arity(1); s"CAST(${args(0)} AS DOUBLE)"
        case "string" => arity(1); s"CAST(${args(0)} AS STRING)"
        case "min" =>
          if (args.length < 2) fail("min expects at least 2 arguments")
          s"least(${args.mkString(", ")})"
        case "max" =>
          if (args.length < 2) fail("max expects at least 2 arguments")
          s"greatest(${args.mkString(", ")})"
        // array/map builtins with exact Catalyst twins (wave 2 batch 2)
        case "join" =>
          if (args.length == 1) s"array_join(${args(0)}, '')"
          else { arity(2); s"array_join(${args(0)}, ${args(1)})" }
        case "keys"   => arity(1); s"map_keys(${args(0)})"
        case "values" => arity(1); s"map_values(${args(0)})"
        // Spark's reverse is already polymorphic over string/array —
        // the one builtin that needs no dispatch shim
        case "reverse" => arity(1); s"reverse(${args(0)})"
        case "sort"    => arity(1); s"array_sort(${args(0)})"
        case "first"   => arity(1); s"graft_at(${args(0)}, 0)"
        case "last"    => arity(1); s"graft_at(${args(0)}, graft_len(${args(0)}) - 1)"
        case "take"    => arity(2); s"graft_slice(${args(0)}, 0, ${args(1)})"
        // takeLast via double reverse: the dialect compiles to plain
        // expression trees (no CSE), so every extra reference to $a
        // duplicates its whole subtree — reverse(take(reverse(x), n))
        // references x ONCE vs thrice for the slice-arithmetic form
        case "takeLast" =>
          arity(2)
          s"reverse(graft_slice(reverse(${args(0)}), 0, ${args(1)}))"
        case "flatten" => arity(1); s"flatten(${args(0)})"
        // uniq: first-occurrence order preserved — array_distinct's
        // documented behavior, the exact expr-lang contract
        case "uniq" => arity(1); s"array_distinct(${args(0)})"
        case "concat" =>
          if (args.length < 2) fail("concat expects at least 2 arguments")
          s"concat(${args.mkString(", ")})"
        // get: polymorphic index (array 0-based / map key) — the same
        // PolyAt the [] operator compiles to, but total (nil on miss)
        case "get" => arity(2); s"graft_at(${args(0)}, ${args(1)})"
        // mean/median return float; the empty array yields nil (Spark
        // null-division) where expr-lang errors — documented deviation,
        // same stance as the other total-function readings
        case "mean" =>
          arity(1); val a = args(0)
          val va = s"x${lambdaSeq}_"; val vb = s"y${lambdaSeq}_"
          lambdaSeq += 1
          s"try_divide(aggregate($a, CAST(0 AS DOUBLE), ($va, $vb) -> $va + $vb), graft_len($a))"
        case "median" =>
          arity(1); val a = args(0)
          val s = s"array_sort($a)"
          s"((CAST(graft_at($s, (graft_len($a) - 1) div 2) AS DOUBLE) + " +
            s"CAST(graft_at($s, graft_len($a) div 2) AS DOUBLE)) / 2)"
        case "toBase64"   => arity(1); s"base64(${args(0)})"
        case "fromBase64" => arity(1); s"CAST(unbase64(${args(0)}) AS STRING)"
        // expr-lang bit builtins → Catalyst bitwise operators (64-bit
        // int semantics both sides; shifts take an INT distance)
        case "bitand"  => arity(2); s"(${args(0)} & ${args(1)})"
        case "bitor"   => arity(2); s"(${args(0)} | ${args(1)})"
        case "bitxor"  => arity(2); s"(${args(0)} ^ ${args(1)})"
        case "bitnot"  => arity(1); s"(~${args(0)})"
        // value operand widened to BIGINT: Spark's shift on an INT uses
        // 32-bit Java semantics (distance mod 32, zero-fill at bit 31),
        // but expr-lang ints are 64-bit — an int literal must shift as one
        case "bitshl"  => arity(2); s"shiftleft(CAST(${args(0)} AS BIGINT), CAST(${args(1)} AS INT))"
        case "bitshr"  => arity(2); s"shiftright(CAST(${args(0)} AS BIGINT), CAST(${args(1)} AS INT))"
        case "bitushr" => arity(2); s"shiftrightunsigned(CAST(${args(0)} AS BIGINT), CAST(${args(1)} AS INT))"
        // last occurrence via the reverse trick (no lastIndexOf builtin
        // in Catalyst): 0-based like indexOf, -1 when absent, null-
        // propagating on null input (instr(NULL) is NULL both engines)
        case "lastIndexOf" =>
          arity(2)
          val (s0, sub) = (args(0), args(1))
          s"(CASE WHEN instr(reverse($s0), reverse($sub)) = 0 THEN -1 " +
            s"ELSE length($s0) - instr(reverse($s0), reverse($sub)) - length($sub) + 1 END)"
        // sum via aggregate with a TYPE-CORRECT zero (first element × 0
        // keeps long arrays long — a literal 0.0 would force doubles and
        // lose exactness past 2^53). ONLY the empty array maps to 0: a
        // nil element or nil array propagates null — a coalesce would
        // silently read a null-poisoned fold as "empty", violating the
        // fail-loud stance
        case "sum" =>
          arity(1)
          val a  = args(0)
          val va = s"x${lambdaSeq}_"; val vb = s"y${lambdaSeq}_"
          lambdaSeq += 1
          s"IF(graft_len($a) = 0, 0, " +
            s"aggregate($a, graft_at($a, 0) * 0, ($va, $vb) -> $va + $vb))"
        // DETERMINISM STANCE: expr-lang's now() reads the wall clock per
        // evaluation; current_timestamp() is a PLAN-TIME constant (one
        // value per query) — the only defensible semantics for a
        // distributed columnar filter, documented as a deviation. The
        // same batch therefore filters identically on every executor
        // and every retry.
        case "now" => arity(0); "current_timestamp()"
        // Go duration literal ("1h45m", "300ms", "1.5s") → a day-time
        // interval constant; timestamp arithmetic/comparisons against it
        // are Catalyst builtins. Literal-only: a runtime-composed
        // duration string is not a columnar constant.
        case "duration" =>
          arity(1)
          val lit = litArgs(0).getOrElse(
            fail("duration argument must be a string literal in the columnar subset"))
          val micros = parseGoDuration(lit).getOrElse(
            fail(s"malformed duration literal '$lit'"))
          s"make_dt_interval(0, 0, 0, ${micros / 1000000.0d})"
        // date(x) casts; date(x, layout) parses a Go reference-time
        // layout; date(x, layout, tz) is time.ParseInLocation — the
        // wall-clock string is IN the zone, and the result compares as
        // the instant it denotes (session zone is UTC, so
        // to_utc_timestamp IS that instant). Layout literal-only, with
        // the Go→Spark token table checked at compile time.
        case "date" =>
          if (args.isEmpty || args.length > 3)
            fail(s"date expects 1-3 arguments, got ${args.length}")
          // The Go-parity of every date() form (time.Parse reads
          // zone-less strings as UTC; the to_utc_timestamp composition)
          // holds ONLY under spark.sql.session.timeZone=UTC. Every graft
          // entry point sets it, but a future non-UTC session would
          // silently shift all parsed instants — so the compile fails
          // loudly here, like every other unsupported shape.
          // one-arg conf.get: resolves the entry's REAL default (the JVM
          // timezone) when unset — the two-arg form would substitute
          // "UTC" and wave through exactly the session this guard exists
          // to catch
          org.apache.spark.sql.SparkSession.getActiveSession.foreach { s =>
            val tz = s.conf.get("spark.sql.session.timeZone")
            if (tz != "UTC" && tz != "Etc/UTC")
              fail(s"date() requires spark.sql.session.timeZone=UTC for Go " +
                s"time.Parse parity (zone-less strings read as UTC); session has '$tz'")
          }
          if (args.length == 1) s"CAST(${args(0)} AS TIMESTAMP)"
          else {
            val fmtLit = litArgs(1).getOrElse(
              fail("date format must be a string literal in the columnar subset"))
            val pattern = EventFilter.goLayoutToSpark(fmtLit).getOrElse(
              fail(s"unsupported Go time layout '$fmtLit'"))
            // Go's ParseInLocation IGNORES the location when the string
            // itself carries a zone — applying to_utc_timestamp on top
            // of an offset-resolved parse would double-shift. No
            // columnar expression can branch on "did the string carry a
            // zone", so the 3-arg form rejects zone-bearing layouts.
            // Detected from the TRANSLATED pattern's zone letters
            // (X/x/z/Z/O/V, quoted literals stripped) so any zone token
            // later added to goLayoutTokens is covered automatically.
            val unquoted = pattern.replaceAll("'[^']*'", "")
            if (args.length == 3 && unquoted.exists("XxzZOV".contains(_)))
              fail(s"date layout '$fmtLit' carries an explicit zone — " +
                "ParseInLocation would ignore the timezone() argument; drop it")
            val parsed = s"to_timestamp(${args(0)}, ${sqlString(pattern)})"
            if (args.length == 2) parsed
            else s"to_utc_timestamp($parsed, ${args(2)})"
          }
        // expr-lang's timezone(name) yields a *time.Location consumed
        // by date()'s third argument; columnar-ly the validated zone id
        // IS the value. Literal-only, checked against the JVM tz db at
        // COMPILE time — an unknown zone fails the filter's creation,
        // not each row (eventfilter.go compiles conditions up front the
        // same way).
        case "timezone" =>
          arity(1)
          val lit = litArgs(0).getOrElse(
            fail("timezone argument must be a string literal in the columnar subset"))
          try java.time.ZoneId.of(lit)
          catch { case e: java.time.DateTimeException =>
            fail(s"unknown timezone '$lit' (${e.getMessage})") }
          sqlString(lit)
        // expr-lang type names over Spark's typeof(): int/float/string/
        // bool/array/map/nil (structs read as map — the dialect views
        // envelope structs as maps)
        case "type" =>
          arity(1)
          val a = args(0)
          s"(CASE WHEN $a IS NULL THEN 'nil' " +
            s"WHEN typeof($a) IN ('tinyint', 'smallint', 'int', 'bigint') THEN 'int' " +
            s"WHEN typeof($a) IN ('float', 'double') OR typeof($a) LIKE 'decimal%' THEN 'float' " +
            s"WHEN typeof($a) = 'string' THEN 'string' " +
            s"WHEN typeof($a) = 'boolean' THEN 'bool' " +
            s"WHEN typeof($a) LIKE 'array%' THEN 'array' " +
            s"WHEN typeof($a) LIKE 'map%' OR typeof($a) LIKE 'struct%' THEN 'map' " +
            s"ELSE typeof($a) END)"
        // map ↔ pairs: the dialect reads structs as maps, so Spark's
        // native entry structs ARE expr-lang pairs — no re-encoding
        case "toPairs"   => arity(1); s"map_entries(${args(0)})"
        case "fromPairs" => arity(1); s"map_from_entries(${args(0)})"
        // splitAfter keeps the separator attached to every piece but the
        // last (expr-lang contract); literal-only like split. The split
        // subtree appears twice (length probe + transform input) — pure
        // expression, duplication is work not semantics
        case "splitAfter" =>
          arity(2)
          val sep = litArgs(1).getOrElse(
            fail("splitAfter separator must be a string literal in the columnar subset"))
          val q = sqlString(java.util.regex.Pattern.quote(sep))
          val parts = s"split(${args(0)}, $q, -1)"
          val v = s"x${lambdaSeq}_"; val i = s"i${lambdaSeq}_"
          lambdaSeq += 1
          s"transform($parts, ($v, $i) -> " +
            s"IF($i = graft_len($parts) - 1, $v, concat($v, ${args(1)})))"
        // toJSON over the dialect's composite values (maps/structs/
        // arrays — Spark's to_json domain; a scalar argument fails at
        // analysis, matching the fail-loud stance). fromJSON is the
        // COLUMNAR-SUBSET reading: JSON objects of string values →
        // map<string,string> (the envelope's hstore/tags shape); full
        // dynamic decoding has no typed columnar equivalent
        case "toJSON"   => arity(1); s"to_json(${args(0)})"
        case "fromJSON" => arity(1); s"from_json(${args(0)}, 'map<string,string>')"
        case other =>
          fail(s"unsupported function '$other' (expr-lang builtin outside the columnar subset)")
      }
    }
  }

  /** Reject regex constructs Go RE2 does not support (backreferences,
    * lookarounds, atomic groups, possessive quantifiers): expr-lang's
    * `matches` compiles RE2 while Spark's `rlike` is java.util.regex, so
    * these would change meaning silently instead of failing as the
    * reference would. Only literal patterns are checkable. */
  private def checkRe2(pattern: String, cond: String): Unit = {
    def bad(what: String): Nothing = throw new IllegalArgumentException(
      s"non-RE2 regex construct ($what) in matches pattern '$pattern' in filter condition: $cond")
    var i = 0
    var inClass = false // inside [...] metacharacters are literals
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '\\' if i + 1 < pattern.length =>
          if (!inClass && pattern.charAt(i + 1).isDigit && pattern.charAt(i + 1) != '0')
            bad("backreference")
          i += 2 // escaped char: skip both (keeps \+ from looking possessive)
        case '[' if !inClass => inClass = true; i += 1
        case ']' if inClass  => inClass = false; i += 1
        case '(' if !inClass &&
            (pattern.startsWith("(?=", i) || pattern.startsWith("(?!", i)) =>
          bad("lookahead")
        case '(' if !inClass &&
            (pattern.startsWith("(?<=", i) || pattern.startsWith("(?<!", i)) =>
          bad("lookbehind")
        case '(' if !inClass && pattern.startsWith("(?>", i) =>
          bad("atomic group")
        case '*' | '+' | '?' | '}' if !inClass && i + 1 < pattern.length &&
            pattern.charAt(i + 1) == '+' =>
          bad("possessive quantifier")
        case _ => i += 1
      }
    }
  }

  /** The schema half of the reference's filter env: the Debezium
    * descriptors for the events envelope, parsed ONCE from the same
    * builder the envelope artifact ships (`DebeziumSchema`). The
    * descriptor is a plan-time constant per table, so `keySchema.*` /
    * `valueSchema.*` paths FOLD AT COMPILE TIME — no per-row work at
    * any scale. */
  private lazy val schemaEnv: Map[String, com.fasterxml.jackson.databind.JsonNode] = {
    import org.apache.spark.sql.types._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val rowSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType), StructField("props", StringType,
        nullable = true, new MetadataBuilder()
          .putString("debezium.name", graft.model.DebeziumSchema.JsonSchemaName).build())))
    Map(
      "valueSchema" -> m.readTree(graft.model.DebeziumSchema
        .envelopeSchemaJson(rowSchema, "graft.public.events")),
      "keySchema" -> m.readTree(graft.model.DebeziumSchema
        .keySchemaJson("graft.public.events", Seq("event_id" -> LongType))))
  }

  /** Compile-time JSON → SQL literal. Scalars keep their native type;
    * objects inline as `map<string,string>` (nested values stringified —
    * compact JSON for non-scalars) and arrays as arrays thereof, so the
    * runtime `[i]`/`["k"]` postfix machinery indexes them. */
  private def inlineJson(n: com.fasterxml.jackson.databind.JsonNode): String = {
    import scala.jdk.CollectionConverters._
    def asStringValue(v: com.fasterxml.jackson.databind.JsonNode): String =
      if (v.isTextual) sqlString(v.asText) else sqlString(v.toString)
    if (n.isTextual) sqlString(n.asText)
    else if (n.isBoolean || n.isNumber) n.asText
    else if (n.isArray) n.elements().asScala.map(inlineJson).mkString("array(", ", ", ")")
    else n.properties().asScala.toSeq
      .flatMap(e => Seq(sqlString(e.getKey), asStringValue(e.getValue)))
      .mkString("map(", ", ", ")")
  }

  /** Navigate a dotted schema path through the descriptor tree —
    * numeric components index arrays (`valueSchema.fields.0.field`).
    * A path that walks off the descriptor fails loudly with the valid
    * keys at the failure point. */
  private def resolveSchemaPath(path: String): String = {
    import scala.jdk.CollectionConverters._
    val parts = path.split('.')
    var node = schemaEnv(parts.head)
    parts.tail.foreach { p =>
      val next =
        if (node.isArray && p.forall(_.isDigit)) node.get(p.toInt)
        else node.get(p)
      if (next == null) {
        val have =
          if (node.isArray) s"array of ${node.size()}"
          else node.properties().asScala.map(_.getKey).mkString(", ")
        throw new IllegalArgumentException(
          s"schema path '$path': no '$p' at this level (have: $have)")
      }
      node = next
    }
    inlineJson(node)
  }

  /** Envelope field-path → column mapping. The reference's Expr env is
    * `{key, value, keySchema, valueSchema}` over the Debezium envelope
    * (`eventfilter.go:127-138`); here the payload fields are the flat
    * envelope columns, so the payload prefixes strip away, and the two
    * schema members fold to literals from the constant descriptor. */
  private def mapPath(path: String): String = {
    if (path.startsWith("keySchema.") || path.startsWith("valueSchema.") ||
        path == "keySchema" || path == "valueSchema")
      return resolveSchemaPath(path)
    val stripped =
      if (path.startsWith("value.after."))  path.substring("value.after.".length)
      else if (path.startsWith("value.")) path.substring("value.".length)
      else if (path.startsWith("key."))   path.substring("key.".length)
      else path // incl. value.before.* → before.* struct path (analysis
                // fails loudly if the envelope carries no before image)
    // quote each component so reserved words survive as column names
    stripped.split('.').map(p => s"`$p`").mkString(".")
  }

  /** Go duration literal → total microseconds: a sequence of
    * `<number><unit>` terms with units ns/us/µs/ms/s/m/h (the format
    * `time.ParseDuration` accepts, which is what expr-lang's duration()
    * parses). Sub-microsecond precision truncates. */
  private[graft] def parseGoDuration(s: String): Option[Long] = {
    val body = s.stripPrefix("+")
    if (body.isEmpty) return None
    val microsPerUnit = Map(
      "ns" -> 0.001, "us" -> 1.0, "µs" -> 1.0, "ms" -> 1000.0,
      "s" -> 1000000.0, "m" -> 60000000.0, "h" -> 3600000000.0)
    val term = java.util.regex.Pattern
      .compile("""\G(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)""")
      .matcher(body)
    var micros = 0.0d
    var idx = 0
    while (idx < body.length) {
      if (!term.find(idx) || term.start != idx) return None
      micros += term.group(1).toDouble * microsPerUnit(term.group(2))
      idx = term.end
    }
    Some(micros.toLong)
  }

  /** Go reference-time layout ("2006-01-02 15:04:05") → Spark datetime
    * pattern, token-by-token with the longest Go token winning. Only
    * layout tokens with EXACT Spark twins convert; an unknown token
    * yields None and the caller fails loudly — a half-translated format
    * would parse plausible-but-wrong timestamps. 'T' passes through
    * quoted (the RFC3339 literal); other stray letters are unknown
    * tokens. */
  private[graft] val goLayoutTokens: Seq[(String, String)] = Seq(
    "2006" -> "yyyy", "January" -> "MMMM", "Jan" -> "MMM",
    "Monday" -> "EEEE", "Mon" -> "EEE",
    ".000000" -> ".SSSSSS", ".000" -> ".SSS",
    "15" -> "HH", "03" -> "hh", "04" -> "mm", "05" -> "ss",
    "01" -> "MM", "02" -> "dd", "PM" -> "a",
    "Z07:00" -> "XXX", "-07:00" -> "xxx")

  private[graft] def goLayoutToSpark(layout: String): Option[String] = {
    val sb = new StringBuilder
    var i = 0
    while (i < layout.length) {
      goLayoutTokens.find { case (go, _) => layout.startsWith(go, i) } match {
        case Some((go, spark)) => sb.append(spark); i += go.length
        case None =>
          val c = layout.charAt(i)
          if (c == 'T') { sb.append("'T'"); i += 1 }
          else if (c.isLetter || c.isDigit) return None // unknown Go token
          else { sb.append(c); i += 1 }
      }
    }
    Some(sb.toString)
  }

  /** SQL string literal: single quotes doubled; backslashes doubled (the
    * Spark SQL parser treats backslash as an escape in literals). */
  private def sqlString(v: String): String =
    "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"

  /** Expr → Spark SQL translation for the supported subset. */
  def translate(cond: String): String = {
    val p = new Parser(cond, lex(cond))
    p.parseLets()
    val sql = p.ternary()
    if (p.toks.nonEmpty)
      p.fail(s"trailing tokens ${p.toks.take(3).mkString(", ")}")
    sql
  }
}
