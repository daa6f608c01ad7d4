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
  * coalescing `??`, and numeric `+ - * / %`. Envelope field paths are
  * mapped to columns: `value.after.x`/`value.before.x`/`value.x`/`key.x`
  * address the payload (the flat envelope columns here);
  * `keySchema.*`/`valueSchema.*` — schema introspection — is rejected.
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
    val inScope = (tables.includeRegexes.map(col("table_name").rlike) match {
      case Nil => Seq(lit(true))
      case rs  => rs
    }).reduce(_ || _) &&
      !(tables.excludeRegexes.map(col("table_name").rlike) match {
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
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
               s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
               ((s.charAt(i) == '+' || s.charAt(i) == '-') && i > start &&
                (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
        out += TNum(s.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit ||
               s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
        out += TIdent(s.substring(start, i))
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        two match {
          case "==" | "!=" | "<=" | ">=" | "&&" | "||" | "??" =>
            out += TOp(two); i += 2
          case _ =>
            c match {
              case '<' | '>' | '!' | '(' | ')' | '[' | ']' | ',' | '?' | ':' |
                   '+' | '-' | '*' | '/' | '%' =>
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
      val l = additive()
      peek match {
        case Some(TOp(sym @ ("==" | "!=" | "<" | "<=" | ">" | ">="))) =>
          next()
          val r = additive()
          val sql = sym match { case "==" => "="; case "!=" => "<>"; case s => s }
          s"$l $sql $r"
        case Some(TIdent("matches"))    => next(); s"rlike($l, ${additive()})"
        case Some(TIdent("contains"))   => next(); s"contains($l, ${additive()})"
        case Some(TIdent("startsWith")) => next(); s"startswith($l, ${additive()})"
        case Some(TIdent("endsWith"))   => next(); s"endswith($l, ${additive()})"
        case Some(TIdent("in"))         => next(); s"$l IN ${listLiteral()}"
        case Some(TIdent("not")) =>
          next()
          next() match {
            case TIdent("in") => s"$l NOT IN ${listLiteral()}"
            case other        => fail(s"expected 'in' after 'not', got $other")
          }
        case _ => l
      }
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
      // expr-lang power 500 — the tightest binary, inside even unary -
      var l = primary()
      while (eatOp("??")) l = s"coalesce($l, ${primary()})"
      l
    }

    def primary(): String = next() match {
      case TStr(v)  => sqlString(v)
      case TNum(t)  => t
      case TOp("(") => val e = ternary(); expectOp(")"); s"($e)"
      case TIdent("true")  => "true"
      case TIdent("false") => "false"
      case TIdent("nil")   => "NULL"
      case TIdent(path)    => mapPath(path)
      case other => fail(s"unexpected token $other")
    }
  }

  /** Envelope field-path → column mapping. The reference's Expr env is
    * `{key, value, keySchema, valueSchema}` over the Debezium envelope
    * (`eventfilter.go:127-138`); here the payload fields are the flat
    * envelope columns, so the payload prefixes strip away. Schema
    * introspection paths are not representable as a columnar predicate —
    * fail loudly rather than silently mis-evaluate. */
  private def mapPath(path: String): String = {
    if (path.startsWith("keySchema.") || path.startsWith("valueSchema.") ||
        path == "keySchema" || path == "valueSchema")
      throw new IllegalArgumentException(
        s"schema-introspection path '$path' is not supported in columnar filters")
    val stripped =
      if (path.startsWith("value.after."))  path.substring("value.after.".length)
      else if (path.startsWith("value.")) path.substring("value.".length)
      else if (path.startsWith("key."))   path.substring("key.".length)
      else path // incl. value.before.* → before.* struct path (analysis
                // fails loudly if the envelope carries no before image)
    // quote each component so reserved words survive as column names
    stripped.split('.').map(p => s"`$p`").mkString(".")
  }

  /** SQL string literal: single quotes doubled; backslashes doubled (the
    * Spark SQL parser treats backslash as an escape in literals). */
  private def sqlString(v: String): String =
    "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"

  /** Expr → Spark SQL translation for the supported subset. */
  def translate(cond: String): String = {
    val p = new Parser(cond, lex(cond))
    val sql = p.ternary()
    if (p.toks.nonEmpty)
      p.fail(s"trailing tokens ${p.toks.take(3).mkString(", ")}")
    sql
  }
}
