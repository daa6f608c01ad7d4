package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Invariants for the corpus-shaping sampling operators (per-group caps
  * and quantile gates). */
class SamplingSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf001)

  test("capPerGroup keeps at most n per group and exactly the best-ranked") {
    val capped = Sampling.capPerGroup(docs, "source", 5,
      Seq(col("n_chars").desc, col("doc_id")))
    val counts = capped.groupBy(col("source")).count().collect()
    assert(counts.forall(_.getLong(1) <= 5))
    // survivors per group are the lexicographic top-5 by (n_chars desc, id)
    val bySource = docs.select(col("source"), col("n_chars"), col("doc_id"))
      .collect().groupBy(_.getString(0))
    val expected = bySource.toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r.getLong(1), r.getLong(2))).take(5).map(_.getLong(2)).toSeq
    }.toSet
    val got = capped.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("capPerGroup with a huge cap is the identity") {
    val capped = Sampling.capPerGroup(docs, "source", Int.MaxValue,
      Seq(col("doc_id")))
    assert(capped.count() === docs.count())
    assert(capped.columns.sameElements(docs.columns), "helper columns dropped")
  }

  test("topPercentPerGroup keeps floor(pct% of group) best rows") {
    val gated = Sampling.topPercentPerGroup(docs, "source", 25,
      Seq(col("n_chars").desc, col("doc_id")))
    val keptPerSource = gated.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, n) =>
      // rk*100 <= n*25  ⇔  rk <= floor(n*25/100)
      assert(keptPerSource.getOrElse(src, 0L) === n * 25 / 100, s"source $src")
    }
  }

  test("topPercentPerGroup at 100 percent is the identity; 0 percent is empty") {
    assert(Sampling.topPercentPerGroup(docs, "source", 100,
      Seq(col("doc_id"))).count() === docs.count())
    assert(Sampling.topPercentPerGroup(docs, "source", 0,
      Seq(col("doc_id"))).count() === 0)
  }

  test("topPercentPerGroup rejects out-of-range pct") {
    intercept[IllegalArgumentException] {
      Sampling.topPercentPerGroup(docs, "source", 101, Seq(col("doc_id")))
    }
  }
}
