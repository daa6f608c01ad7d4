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

  test("quoted wildcards are literal characters") {
    val q = TableFilter(Seq("public.\"m*\""), Nil)
    assert(q.matches("public.m*"))
    assert(!q.matches("public.metrics"))
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

  test("regex metacharacters in names are escaped") {
    val f = TableFilter(Seq("public.a.b"), Nil) // '.' inside part is literal
    // the part split happens on the first dot: schema=public, table=a.b
    assert(f.matches("public.a.b"))
    assert(!f.matches("public.aXb"))
  }
}
