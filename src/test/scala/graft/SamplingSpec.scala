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

  test("unimax allocation: budget never overshot, caps honored, unsaturated sources split evenly") {
    import spark.implicits._
    val mix = Seq(
      ("tiny", 100L), ("tiny", 50L),        // n=150, cap=300  — saturates
      ("small", 400L),                       // n=400, cap=800  — saturates
      ("big", 5000L), ("big", 5000L),        // n=10000, cap=20000
      ("huge", 30000L)                       // n=30000, cap=60000
    ).toDF("source", "n_chars").withColumn("doc_id", monotonically_increasing_id())
    val budget = 9000L
    val got = Sampling.unimaxAllocation(mix, budget, epochCap = 2)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("cap_tokens"), r.getAs[Long]("alloc_tokens")))
      .toMap
    // saturated: cap·remaining ≤ B − prefix → tiny (300·4 ≤ 9000) and
    // small (800·3 ≤ 8700); the rest split (9000 − 1100) div 2 = 3950
    assert(got("tiny")._3 === 300L && got("small")._3 === 800L)
    assert(got("big")._3 === 3950L && got("huge")._3 === 3950L)
    val total = got.values.map(_._3).sum
    assert(total <= budget, s"allocation $total must never overshoot the budget")
    got.values.foreach { case (_, cap, alloc) => assert(alloc <= cap) }
    // budget above all caps: everything saturates exactly at cap
    val all = Sampling.unimaxAllocation(mix, 1000000L, epochCap = 2)
      .collect().map(r => (r.getAs[Long]("cap_tokens"), r.getAs[Long]("alloc_tokens")))
    all.foreach { case (cap, alloc) => assert(alloc === cap) }
  }

  test("unimax degenerate (zero-token) source gets 0 epochs, matching temperatureMixRates") {
    import spark.implicits._
    val mix = Seq(("empty", 0L), ("real", 1000L))
      .toDF("source", "n_chars")
    val rows = Sampling.unimaxAllocation(mix, 500L, epochCap = 2).collect()
    // alloc·1000 div 0 is NULL under non-ANSI div — must be pinned to 0,
    // never NULL (getAs[Long] unboxes null to 0, so assert non-null
    // explicitly; the two mixing tables agree on degenerate sources)
    rows.foreach(r => assert(!r.isNullAt(r.fieldIndex("epochs_milli")),
      s"NULL epochs_milli for ${r.getAs[String]("source")}"))
    val got = rows.map(r => r.getAs[String]("source") ->
      r.getAs[Long]("epochs_milli")).toMap
    assert(got("empty") === 0L)
    assert(got("real") > 0L)
  }

  test("unimax refuses arithmetic that would wrap 64-bit token math") {
    import spark.implicits._
    val huge = Seq(("a", Long.MaxValue / 2), ("b", 10L))
      .toDF("source", "n_chars")
    val e = intercept[IllegalArgumentException] {
      Sampling.unimaxAllocation(huge, 1000L, epochCap = 4)
    }
    assert(e.getMessage.contains("overflows"))
    intercept[IllegalArgumentException] {
      Sampling.unimaxAllocation(huge, Long.MaxValue / 100L, epochCap = 1)
    }
  }

  test("packConcat: offsets slice every document back out of the blob, nothing lost") {
    val subset = docs.filter(col("doc_id") < 100)
    val shards = Sampling.packConcat(subset, budgetTokens = 256).collect()
    val eos = "<|eos|>"
    val reconstructed = shards.flatMap { r =>
      val (blob, offs) = (r.getAs[String]("blob"),
        r.getAs[String]("offsets_csv").split(',').map(_.toLong))
      assert(offs.length === r.getAs[Long]("n_docs"), "one offset per doc")
      val parts = blob.split(java.util.regex.Pattern.quote(eos), -1)
      assert(parts.length.toLong === r.getAs[Long]("n_docs"))
      // every offset points exactly at its document's first BYTE of the
      // UTF-8 blob (the unit a shard-file reader seeks by)
      val blobBytes = blob.getBytes("UTF-8")
      parts.zip(offs).foreach { case (doc, off) =>
        val docBytes = doc.getBytes("UTF-8")
        assert(blobBytes.slice(off.toInt, off.toInt + docBytes.length)
          .sameElements(docBytes), s"byte offset $off must locate its doc")
      }
      parts
    }
    val original = subset.select("text").collect().map(_.getString(0))
    assert(reconstructed.sorted.toSeq === original.sorted.toSeq,
      "blobs must carry the full corpus, nothing duplicated or dropped")
    intercept[IllegalArgumentException](Sampling.packConcat(docs, budgetTokens = 0))
  }

  test("packSequences: windows tile exactly, docs split across boundaries, nothing lost") {
    import spark.implicits._
    // group g: docs of 3, 5, 4 tokens, W=4 → stream of 12 tokens = 3
    // full windows; doc 2 (5 toks) must split across windows 0/1, doc 3
    // across 1/2
    val docs = Seq(
      ("g", 1L, "a b c"), ("g", 2L, "d e f g h"), ("g", 3L, "i j k l"),
      ("h", 9L, "x y")).toDF("source", "doc_id", "text")
    val out = Sampling.packSequences(docs, windowTokens = 4)
      .orderBy("source", "win", "doc_id")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("g", 0L, 1L, 0L, 3L, 0L),   // doc1 fully in window 0
      ("g", 0L, 2L, 0L, 1L, 3L),   // doc2 head fills window 0
      ("g", 1L, 2L, 1L, 4L, 0L),   // doc2 tail fills all of window 1
      ("g", 2L, 3L, 0L, 4L, 0L),   // doc3 exactly window 2
      ("h", 0L, 9L, 0L, 2L, 0L)))  // group h: short tail window
    // invariants on the real corpus: every non-final window holds
    // exactly W tokens; per-doc slices sum to the doc's token count
    val corpus = Tables.documents(spark, sf001)
    val w = 64
    val packed = Sampling.packSequences(corpus, windowTokens = w)
    val perWin = packed.groupBy(col("source"), col("win"))
      .agg(sum(col("slice_len")).as("nt"))
    val maxWin = packed.groupBy(col("source"))
      .agg(max(col("win")).as("last"))
    val nonFinal = perWin.join(maxWin, "source").filter(col("win") < col("last"))
    assert(nonFinal.filter(col("nt") =!= w).count() === 0L)
    val perDoc = packed.groupBy(col("doc_id")).agg(sum(col("slice_len")).as("nt"))
      .join(corpus.select(col("doc_id"),
        graft.ops.TextAnalysis.tokenCount(col("text")).cast("long").as("expect")), "doc_id")
    assert(perDoc.filter(col("nt") =!= col("expect")).count() === 0L)
    intercept[IllegalArgumentException] { Sampling.packSequences(docs, 0) }
  }

  test("split assignment is content-keyed (dup-safe), exhaustive, and partitioning-invariant") {
    import spark.implicits._
    val withDup = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.limit(1).select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val s = Sampling.assignSplits(withDup)
      .select(col("doc_id"), col("text"), col("split")).collect()
    // byte-identical texts NEVER straddle splits — the leakage contract
    s.groupBy(_.getString(1)).values.foreach { rows =>
      assert(rows.map(_.getString(2)).distinct.length === 1,
        "duplicate content must share one split")
    }
    val bySplit = s.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // deterministic across partitionings
    val a = Sampling.assignSplits(docs).select("doc_id", "split").collect().toSet
    val b = Sampling.assignSplits(docs.repartition(17)).select("doc_id", "split")
      .collect().toSet
    assert(a === b)
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, trainPpm = 900000, valPpm = 200000)
    }
  }

  test("temperature mix: zero-token sources keep nothing, not everything") {
    import spark.implicits._
    val mix = Seq(("live", 10000L), ("empty", 0L))
      .toDF("source", "n_chars")
    val rates = Sampling.temperatureMixRates(mix, budget = 5000L)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("rate_ppm")).toMap
    // the NULL-division trap: least(1e6, NULL) = 1e6 would keep 100 %
    // of a source that has no tokens at all
    assert(rates("empty") === 0L)
    assert(rates("live") > 0L && rates("live") <= 1000000L)
    // fully empty corpus: Σw = 0 must not promote every rate to the cap
    val allEmpty = Seq(("a", 0L), ("b", 0L)).toDF("source", "n_chars")
    Sampling.temperatureMixRates(allEmpty, budget = 5000L)
      .collect().foreach(r => assert(r.getAs[Long]("rate_ppm") === 0L))
  }

  test("packingEfficiency: closed-form waste/loss on a tiny corpus") {
    import spark.implicits._
    // docs of 3, 5, 10 tokens in one source; W = 4
    val df = Seq(
      (1L, "a b c", "s1"), (2L, "a b c d e", "s1"),
      (3L, "a b c d e f g h i j", "s1")).toDF("doc_id", "text", "source")
    val rep = Sampling.packingEfficiency(df, Seq(4))
      .collect().map(r => r.getAs[String]("strategy") ->
        (r.getAs[Long]("n_sequences"), r.getAs[Long]("content_tokens"),
          r.getAs[Long]("padding_tokens"), r.getAs[Long]("truncated_tokens"))).toMap
    // pad_doc: ceil(3/4)+ceil(5/4)+ceil(10/4)=1+2+3=6 seqs, 24 slots, 18 content
    assert(rep("pad_doc") === ((6L, 18L, 6L, 0L)))
    // clip: 3 seqs of 4; content 3+4+4=11; pad only doc1 (1); trunc 1+6=7
    assert(rep("clip") === ((3L, 11L, 1L, 7L)))
    // chop: T=18 → ceil(18/4)=5 seqs, pad 2, no loss
    assert(rep("chop") === ((5L, 18L, 2L, 0L)))
    // efficiency ordering: chop ≥ pad_doc (chop never pads mid-stream)
    val eff = Sampling.packingEfficiency(df, Seq(4))
      .collect().map(r => r.getAs[String]("strategy") -> r.getAs[Long]("efficiency_ppm")).toMap
    assert(eff("chop") >= eff("pad_doc"))
  }

  test("bpeEncodePacked: full windows except each source's last, mass conserved") {
    val docs = Tables.documents(spark, sf001)
    val packed = graft.ops.TextAnalysis
      .bpeEncodePacked(docs, nMerges = 6, windowTokens = 256).collect()
    val bySource = packed.groupBy(_.getString(0))
    bySource.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("win"))
      // contiguous window ids from 0
      assert(sorted.map(_.getAs[Long]("win")).toSeq === (0L until sorted.length))
      sorted.init.foreach { r =>
        assert(r.getAs[Long]("n_ids") === 256L, s"$src non-final window must be full")
        assert(r.getAs[String]("ids_csv").split(",").length === 256)
      }
    }
    // id mass ≡ the unpacked encoder's total
    val totalPacked = packed.map(_.getAs[Long]("n_ids")).sum
    val totalEnc = graft.ops.TextAnalysis.bpeEncode(docs, nMerges = 6)
      .agg(org.apache.spark.sql.functions.sum("n_ids")).head.getLong(0)
    assert(totalPacked === totalEnc)
  }

  test("qualityBudgetMix: waterfall fills by priority, caps at epochs, exhausts exactly") {
    import spark.implicits._
    // caps at 2.0 epochs: a→200, b→100, c→400; budget 250 fills a whole
    // (200), b partially (50), c nothing — strict priority order
    val stats = Seq(
      ("a", 100L, 900L), ("b", 50L, 800L), ("c", 200L, 700L)
    ).toDF("source", "n_tokens", "priority")
    val got = graft.ops.Sampling.qualityBudgetMix(stats, budget = 250L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("cap_tokens"), r.getAs[Long]("take_tokens"),
          r.getAs[Long]("epochs_milli")))).toMap
    assert(got("a") === ((200L, 200L, 2000L)))
    assert(got("b") === ((100L, 50L, 1000L)))
    assert(got("c") === ((400L, 0L, 0L)))
    // the takes sum to exactly the budget while any capacity remains
    assert(got.values.map(_._2).sum === 250L)
    // a budget beyond all caps saturates every source at its cap
    val full = graft.ops.Sampling.qualityBudgetMix(stats, budget = 10000L)
      .collect().map(r => r.getAs[Long]("take_tokens")).sum
    assert(full === 700L)
  }

  test("neymanAllocation: variance pulls share, largest remainder sums to k exactly") {
    import spark.implicits._
    // 'a': all docs length 4 (sd 0); 'b': lengths 1 and 7 (sd exactly
    // 3 → 3000 milli). Neyman weights n·sd = (0, 6000): b takes the
    // whole budget; proportional splits it evenly
    val docs = Seq(
      (1L, "a", "w w w w"), (2L, "a", "w w w w"),
      (3L, "b", "w"), (4L, "b", "w w w w w w w")
    ).toDF("doc_id", "source", "text")
    val got = graft.ops.Sampling.neymanAllocation(docs, k = 10L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Long]("sd_milli") === 0L)
    assert(got("b").getAs[Long]("sd_milli") === 3000L)
    assert(got("a").getAs[Long]("alloc_neyman") === 0L)
    assert(got("b").getAs[Long]("alloc_neyman") === 10L)
    assert(got("a").getAs[Long]("alloc_prop") === 5L)
    assert(got("b").getAs[Long]("alloc_prop") === 5L)
    // largest-remainder apportionment: Σalloc = k exactly even when the
    // floors undershoot (n = 2,2,1 at k = 7 → bases 2,2,1 + 2 leftovers)
    val uneven = docs.unionByName(Seq((5L, "c", "w w w w"))
      .toDF("doc_id", "source", "text"))
    val props = graft.ops.Sampling.neymanAllocation(uneven, k = 7L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc_prop")).toMap
    assert(props.values.sum === 7L)
    assert(props === Map("a" -> 3L, "b" -> 3L, "c" -> 1L),
      "remainder ties break to the smaller source name")
  }

  test("qualityBudgetMix: random stats respect the budget and the greedy-prefix law") {
    import spark.implicits._
    val rnd = new scala.util.Random(99) // fixed seed — deterministic run
    for (trial <- 1 to 3) {
      val stats = (0 until 12).map(i =>
        (s"s$i", rnd.nextInt(1000).toLong + 1, rnd.nextInt(1000).toLong))
      val budget = rnd.nextInt(3000).toLong
      val got = graft.ops.Sampling
        .qualityBudgetMix(stats.toDF("source", "n_tokens", "priority"), budget)
        .collect()
      val takes = got.map(r => r.getString(0) -> r.getAs[Long]("take_tokens")).toMap
      val caps = got.map(r => r.getString(0) -> r.getAs[Long]("cap_tokens")).toMap
      got.foreach { r =>
        val t = takes(r.getString(0))
        assert(t >= 0L && t <= caps(r.getString(0)), s"trial $trial: $r")
      }
      // exhausts exactly: total = min(budget, total capacity)
      assert(takes.values.sum === math.min(budget, caps.values.sum), s"trial $trial")
      // greedy-prefix law: after the first partially-filled source (in
      // priority order) every later source takes nothing
      val ordered = got.sortBy(r => (-r.getAs[Long]("priority"), r.getString(0)))
      val idxPartial = ordered.indexWhere(r =>
        takes(r.getString(0)) < caps(r.getString(0)))
      if (idxPartial >= 0)
        ordered.drop(idxPartial + 1).foreach(r =>
          assert(takes(r.getString(0)) === 0L, s"trial $trial: non-zero after partial"))
    }
  }

  test("prioritySample: deterministic, weight-sensitive, exactly k rows") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001)
    val s1 = Sampling.prioritySample(docs, k = 20, weightCol = "n_chars")
      .select("doc_id").as[Long].collect().toSeq
    val s2 = Sampling.prioritySample(docs.repartition(7), k = 20, weightCol = "n_chars")
      .select("doc_id").as[Long].collect().toSeq
    assert(s1 === s2, "partitioning must not change the sample")
    assert(s1.length === 20)
    // weights matter: zeroing them changes the winning set (the hash
    // lottery alone picks different rows than weight/hash)
    val flat = Sampling.prioritySample(
      docs.withColumn("w1", lit(1L)), k = 20, weightCol = "w1")
      .select("doc_id").as[Long].collect().toSet
    assert(flat !== s1.toSet, "weight column must influence selection")
    // heavier rows overrepresented: mean sampled weight > corpus mean
    val meanAll = docs.agg(avg(col("n_chars"))).head.getDouble(0)
    val meanSampled = Sampling.prioritySample(docs, 20, "n_chars")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(meanSampled > meanAll, s"weighted sample mean $meanSampled ≤ corpus mean $meanAll")
  }

  test("heavyHitters: bounded-state two-pass ≡ plain groupBy-HAVING") {
    import org.apache.spark.sql.functions._
    val toks = Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("tok"))
    // tiny bucket table (collision-heavy on purpose) still loses nothing
    val hh = graft.ops.Profile.heavyHitters(toks, "tok", minCount = 50L, nBuckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh === exact)
    assert(exact.nonEmpty, "fixture must contain heavy hitters")
  }

  test("k-center coreset: monotone coverage radius, distinct picks, farthest-point invariant") {
    import graft.ops.Sampling
    val emb = Tables.embeddings(spark, sf001)
    val sel = Sampling.kCenterSelect(emb, k = 6).orderBy("rank").collect()
    assert(sel.length === 6)
    assert(sel.map(_.getLong(1)).distinct.length === 6, "no vector selected twice")
    val radii = sel.drop(1).map(_.getDouble(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"coverage radius must be non-increasing: ${radii.mkString(", ")}")
    assert(radii.forall(_ > 0), "distinct embeddings must have positive radii")
    // farthest-point invariant: pick r's distance >= every point's final
    // min-distance to the first r centers — spot-check rank 1 against a
    // brute-force recompute
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val diff = a(i).toDouble - b(i).toDouble; s += diff * diff; i += 1
      }
      s
    }
    val c0 = vecs(sel(0).getLong(1))
    val bruteMax = vecs.map { case (_, v) => d2(v, c0) }.max
    assert(math.abs(sel(1).getDouble(2) - bruteMax) < 1e-6 * math.max(1.0, bruteMax),
      "rank-1 pick must be the farthest point from the seed")
  }
}
