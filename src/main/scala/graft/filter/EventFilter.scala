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
  * Supported dialect subset (fail-loudly otherwise, SURVEY §7.4):
  * `==`/`!=`/`<`/`<=`/`>`/`>=`, `&&`/`||`/`!`, parentheses, string/number
  * literals, dotted field paths, `in [..]`. Per-filter table scoping and
  * the `default` inversion for negative filters mirror
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
  private val unsupported = Seq("matches", "contains", "startsWith", "endsWith",
    "all ", "any ", "one ", "none ", "map(", "filter(", "?:", "??")

  /** Expr → Spark SQL translation for the supported subset. */
  def translate(cond: String): String = {
    unsupported.find(cond.contains).foreach { tok =>
      throw new IllegalArgumentException(
        s"unsupported Expr construct '$tok' in filter condition: $cond")
    }
    cond
      .replaceAll("==", "=")
      .replaceAll("!=", "<>")
      .replaceAll("&&", " AND ")
      .replaceAll("\\|\\|", " OR ")
      .replaceAll("!(?=[a-zA-Z(])", "NOT ")
      .replaceAll("\\bin\\s*\\[([^\\]]*)\\]", "IN ($1)")
      .replaceAll("\"", "'")
  }
}
