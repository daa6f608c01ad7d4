package graft

/** SQL-surface registration of the custom expressions. Uses the shared
  * session + registerTo (the extensions-at-construction path applies the
  * same registration list; suite order means the shared session may
  * already exist without extensions). */
class ExtensionsSpec extends SparkSpec {
  test("registered SQL functions vec_dot/vec_norm2/fnv_hash64 evaluate") {
    GraftExtensions.registerTo(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       vec_norm2(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
        |       fnv_hash64('a') AS h""".stripMargin).head
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 25.0)
    assert(r.getLong(2) === 0xaf63dc4c8601ec8cL)
  }

  test("saturating_* SQL functions clamp at the exact i32 / pos bounds") {
    GraftExtensions.registerTo(spark)
    val r = spark.sql(
      """SELECT saturating_add(2147483647, 1) AS a,
        |       saturating_sub(-2147483648, 1) AS b,
        |       saturating_mul(65536, 65536) AS c,
        |       saturating_mul(-65536, 65536) AS d,
        |       saturating_add_pos(-5, 2) AS e,
        |       saturating_sub_pos(3, 5) AS f,
        |       saturating_add(100, 23) AS g""".stripMargin).head
    assert(r.getInt(0) === Int.MaxValue && r.getInt(1) === Int.MinValue)
    assert(r.getInt(2) === Int.MaxValue && r.getInt(3) === Int.MinValue)
    assert(r.getInt(4) === 0 && r.getInt(5) === 0 && r.getInt(6) === 123)
    intercept[Exception] { spark.sql("SELECT saturating_add(1)").head }
  }

  test("cms_estimate decodes the count_min_sketch aggregate in-plan") {
    GraftExtensions.registerTo(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col, count, expr, lit}
    val df = (Seq.fill(50)(7L) ++ Seq.fill(30)(9L) ++ Seq.fill(20)(11L)).toDF("k")
    val sketch = df.agg(
      expr("count_min_sketch(k, 0.001d, 0.99d, 42)").as("cms"))
    // probe the broadcast sketch per key — the distributed shape
    val probes = df.groupBy(col("k")).agg(count(lit(1)).as("true_cnt"))
      .crossJoin(broadcast(sketch))
      .selectExpr("k", "true_cnt", "cms_estimate(cms, k) AS est")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    probes.foreach { case (k, (t, est)) =>
      assert(est >= t, s"CMS undercounted key $k: est=$est true=$t")
      assert(est <= t + 1, s"CMS overshot eps*N for key $k: est=$est true=$t")
    }
    // absent key estimates near zero (<= eps*N)
    val absent = sketch.selectExpr("cms_estimate(cms, CAST(999 AS BIGINT))").head.getLong(0)
    assert(absent <= 1)
    // null propagates; wrong types rejected at analysis
    assert(sketch.selectExpr("cms_estimate(cms, CAST(NULL AS BIGINT))").head.isNullAt(0))
    val err = intercept[Exception](
      sketch.selectExpr("cms_estimate(cms, 'notalong')").head)
    assert(err.getMessage.toLowerCase.contains("bigint") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("ngrams_join is SQL-callable with a literal n; non-literal n rejected") {
    GraftExtensions.registerTo(spark)
    val r = spark.sql("SELECT ngrams_join(array('a', 'b', 'c'), 2) AS g").head
    assert(r.getSeq[String](0).toList === List("a b", "b c"))
    val err = intercept[Exception](
      spark.sql("SELECT ngrams_join(array('a'), CAST(rand() * 2 AS INT))").head)
    assert(err.getMessage.contains("integer literal"))
  }

  test("graft_len dispatches on type; codegen and interpreted paths agree") {
    GraftExtensions.registerTo(spark)
    val r = spark.sql(
      """SELECT graft_len('héllo') AS s,             -- numChars, not bytes
        |       graft_len(CAST('ab' AS BINARY)) AS b,
        |       graft_len(array(1, 2, 3)) AS a,
        |       graft_len(map('k', 1)) AS m,
        |       -- inside a higher-order lambda the expression runs
        |       -- INTERPRETED (nullSafeEval), not codegen
        |       transform(array('x', 'yy'), v -> graft_len(v)) AS hof
        |""".stripMargin).head
    assert(r.getInt(0) === 5, "unicode chars, not utf-8 bytes")
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 3)
    assert(r.getInt(3) === 1)
    assert(r.getSeq[Int](4) === Seq(1, 2))
    // analysis-time rejection of unsupported types
    val e = intercept[Exception] { spark.sql("SELECT graft_len(42)").collect() }
    assert(e.getMessage.contains("len requires"))
  }

  test("unicode_normalize merges NFC/NFD forms; codegen and HOF paths agree") {
    import graft.functions.TextFunctions.unicode_normalize
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pre = "café"        // precomposed
    val dec = "café"       // decomposed (combining acute)
    assert(pre != dec)
    val df = Seq((1, pre), (2, dec), (3, null: String)).toDF("id", "s")
    val out = df.select(col("id"), unicode_normalize(col("s")).as("n")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1) === pre && out(2) === pre, "both forms normalize to NFC")
    assert(out(3) === null, "null-intolerant: null in, null out")
    // NFD round-trip via the form parameter; bad form fails at plan time
    val nfd = df.filter(col("id") === 1)
      .select(unicode_normalize(col("s"), "NFD")).head.getString(0)
    assert(nfd === dec)
    intercept[IllegalArgumentException](unicode_normalize(col("s"), "NFX"))
    // interpreted path (inside a HOF lambda) matches codegen
    val hof = df.filter(col("id") === 2)
      .select(transform(array(col("s")), v => unicode_normalize(v)).as("a"))
      .head.getSeq[String](0)
    assert(hof === Seq(pre))
  }

  test("LevenshteinBoundRule: natural lev(a,b) <= k rewrites to the banded form + length guard") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.registerTo(spark)
    val words = Seq("kitten", "sitting", "kittens", "mitten", "flask",
      "flash", "a", "abcdefghij", "abc").toDF("w")
    val pairs = words.as("x").crossJoin(words.as("y"))
      .filter(col("x.w") < col("y.w"))
    val natural = pairs.filter(expr("levenshtein(x.w, y.w) <= 2"))
    // the optimized plan carries the three-arg banded call, never the full form
    val opt = natural.queryExecution.optimizedPlan.toString()
    assert(opt.contains("levenshtein(") && opt.contains("Some(2)"),
      s"expected banded levenshtein in:\n$opt")
    assert(opt.contains("length("), s"expected length guard in:\n$opt")
    // results identical to the brute-force distance computed WITHOUT the bound
    val expected = pairs
      .select(col("x.w").as("a"), col("y.w").as("b"), expr("levenshtein(x.w, y.w)").as("d"))
      .collect().filter(_.getInt(2) <= 2).map(r => (r.getString(0), r.getString(1))).toSet
    val got = natural.select(col("x.w"), col("y.w")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === expected && got.nonEmpty)
    // strict bound and equality forms rewrite too, same results
    val strict = pairs.filter(expr("levenshtein(x.w, y.w) < 2"))
      .select(col("x.w"), col("y.w")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val strictExpected = pairs
      .select(col("x.w"), col("y.w"), expr("levenshtein(x.w, y.w)").as("d"))
      .collect().filter(_.getInt(2) < 2).map(r => (r.getString(0), r.getString(1))).toSet
    assert(strict === strictExpected)
    val eq = pairs.filter(expr("levenshtein(x.w, y.w) = 1"))
    assert(eq.queryExecution.optimizedPlan.toString().contains("Some(1)"))
    assert(eq.count() === strictExpected.size - pairs
      .filter(expr("levenshtein(x.w, y.w) = 0")).count())
    // a non-literal bound is left alone (no threshold to band on)
    val dynamic = pairs.filter(expr("levenshtein(x.w, y.w) <= length(x.w) - 4"))
    val dynOpt = dynamic.queryExecution.optimizedPlan.toString()
    assert(!dynOpt.contains("Some("), s"must not rewrite:\n$dynOpt")
    // null inputs behave identically (filtered out both ways)
    val withNull = Seq(("a", null), ("ab", "ab")).toDF("a", "b")
      .filter(expr("levenshtein(a, b) <= 2"))
    assert(withNull.count() === 1)
  }
}
