package graft

import graft.catalog.TableFilter
import org.scalatest.funsuite.AnyFunSuite

/** Wildcard semantics parity with the reference's documented rules
  * (`/root/reference/README.md:535-625`,
  * `internal/systemcatalog/tablefiltering/tablefilter.go`). */
class TableFilterSpec extends AnyFunSuite {

  test("star matches any run including empty") {
    val f = TableFilter(Seq("public.*"), Nil)
    assert(f.matches("public.metrics"))
    assert(f.matches("public."))
    assert(!f.matches("other.metrics"))
  }

  test("plus requires at least one char") {
    val f = TableFilter(Seq("public.metrics+"), Nil)
    assert(f.matches("public.metrics1"))
    assert(f.matches("public.metrics_long"))
    assert(!f.matches("public.metrics"))
  }

  test("question mark is exactly one char") {
    val f = TableFilter(Seq("customer?.metrics"), Nil)
    assert(f.matches("customer1.metrics"))
    assert(!f.matches("customer12.metrics"))
    assert(!f.matches("customer.metrics"))
  }

  test("unquoted folds to lowercase, quoted is literal") {
    val f = TableFilter(Seq("PUBLIC.Metrics"), Nil)
    assert(f.matches("public.metrics"))
    val q = TableFilter(Seq("\"Public\".\"Metrics\""), Nil)
    assert(q.matches("Public.Metrics"))
    assert(!q.matches("public.metrics"))
  }

  test("quoted unescaped wildcards are still wildcards (tablefilter.go:227-269)") {
    val q = TableFilter(Seq("public.\"M*\""), Nil)
    assert(q.matches("public.Metrics")) // '*' active inside quotes
    assert(!q.matches("public.metrics")) // but case-sensitive
  }

  test("backslash-escaped wildcards in quoted parts are literal") {
    val q = TableFilter(Seq("public.\"m\\*\""), Nil)
    assert(q.matches("public.m*"))
    assert(!q.matches("public.metrics"))
  }

  test("illegal characters in unquoted parts are rejected") {
    intercept[IllegalArgumentException] { TableFilter(Seq("public.a-b"), Nil).matches("x.y") }
    intercept[IllegalArgumentException] { TableFilter(Seq("public.1abc"), Nil).matches("x.y") }
    // quoted admits anything, matched literally
    assert(TableFilter(Seq("public.\"a-b\""), Nil).matches("public.a-b"))
  }

  test("excludes win over includes") {
    val f = TableFilter(Seq("public.*"), Seq("public.secret"))
    assert(f.matches("public.ok"))
    assert(!f.matches("public.secret"))
  }

  test("empty includes means include-all") {
    val f = TableFilter(Nil, Seq("public.secret"))
    assert(f.matches("anything.at_all"))
    assert(!f.matches("public.secret"))
  }

  test("regex metacharacters in quoted names match literally") {
    val f = TableFilter(Seq("public.\"a.b\""), Nil)
    assert(f.matches("public.a.b"))
    assert(!f.matches("public.aXb"))
  }

  test("continuous aggregates match by view schema/name (tablefilter.go:139-160)") {
    val f = TableFilter(Seq("public.cagg_*"), Nil)
    // cagg's materialization hypertable lives in an internal schema, but
    // the filter must see its view identity
    assert(f.matchesEntity("_timescaledb_internal", "_materialized_hypertable_4",
      isContinuousAggregate = true,
      viewSchema = Some("public"), viewName = Some("cagg_hourly")))
    // unknown view identity → never matches
    assert(!f.matchesEntity("_timescaledb_internal", "_materialized_hypertable_4",
      isContinuousAggregate = true, viewSchema = None, viewName = None))
    // plain hypertable matches by its own name
    assert(!f.matchesEntity("_timescaledb_internal", "_materialized_hypertable_4"))
    assert(f.matchesEntity("public", "cagg_raw"))
  }
}
