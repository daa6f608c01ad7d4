package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build the synthetic "sf0.8" probe input (verdict-13 directive #3):
  * the sf0.1 documents table unioned with id-offset copies of itself —
  * `factor`× the rows, doc_id ranges disjoint per copy (offset = copy ·
  * (max_id + 1)) so every derived key (URL mods, edges, blocks) gets a
  * fresh id space while text/lang/source replicate verbatim, exactly as
  * the directive specifies. lineitem.parquet is copied through for the
  * Bench warm-up read.
  *
  * `salt` mode prefixes each copy's text with a per-copy marker: the
  * verbatim form manufactures `factor`-way EXACT-clone families whose
  * pair output is quadratic in the factor (a data property — 196× pairs
  * at 8×), so the salted arm is the input-linearity probe (each copy
  * keeps its internal duplicate structure, no cross-copy clones).
  * ALWAYS salt from the BASE fixture, never from an already-salted
  * output: the embedding salt is a per-copy rotation lag, and lags
  * compose additively across chained runs — copy (i, j-of-source)
  * pairs with equal total lag are verbatim clones again, silently
  * reintroducing the clone mass this arm exists to remove (the text
  * marker chains safely; the rotation does not).
  * Usage:
  *   runMain graft.ScaleReplicate <srcSfDir> <outDir> [factor] [salt]
  */
object ScaleReplicate {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleReplicate <srcSfDir> <outDir> [factor] [salt]")
    val src = args(0); val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 8
    val salt = args.length > 3 && args(3) == "salt"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(new java.io.File(s"$src/documents.parquet").exists,
      s"ScaleReplicate: $src/documents.parquet missing — documents is the primary probe input")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val stride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val replicated = (0 until factor).map { i =>
      val c = docs.withColumn("doc_id", col("doc_id") + lit(i * stride))
      if (salt && i > 0) c.withColumn("text", concat(lit(s"c$i "), col("text")))
      else c
    }.reduce(_ unionByName _)
    replicated.write.mode("overwrite").parquet(s"$out/documents.parquet")
    // One replication rule for every keyed twin: each copy offsets the
    // named keys by that key's stride (max + 1). A single definition so
    // a rule fix lands everywhere at once.
    def rep(df: org.apache.spark.sql.DataFrame,
            offsets: Map[String, Long]): org.apache.spark.sql.DataFrame =
      (0 until factor).map { i =>
        offsets.foldLeft(df) { case (d, (k, st)) =>
          d.withColumn(k, col(k) + lit(i * st))
        }
      }.reduce(_ unionByName _)
    def strideOf(df: org.apache.spark.sql.DataFrame, key: String): Long = {
      // explicit cast + null guard: an empty table yields max=NULL
      // (head.getLong would NPE) and a non-long key would CCE — fail
      // with a message naming the table/key instead
      val m = df.agg(max(col(key)).cast("long")).head
      require(!m.isNullAt(0), s"ScaleReplicate: table has no rows for key '$key'")
      m.getLong(0) + 1L
    }
    def existsTable(name: String): Boolean =
      new java.io.File(s"$src/$name.parquet").exists
    // events twin (r15): the CDC-path probe input. event_id offsets by
    // copy; ts/user_id replicate verbatim — 8× events per chunk and per
    // user is exactly what data growth inside a fixed retention window
    // looks like, so the chunk catalog stays DDL-sized while the data
    // fans out (the property the J1 broadcast posture relies on). The
    // stride rounds UP to a multiple of the txn size (xid = event_id
    // div 10) so transactions never merge across copy boundaries — the
    // injective-xid claim must hold for ANY source row count, not just
    // round fixtures.
    if (new java.io.File(s"$src/events.parquet").exists) {
      val ev = spark.read.parquet(s"$src/events.parquet")
      val strideE = ((strideOf(ev, "event_id") + 9L) / 10L) * 10L
      rep(ev, Map("event_id" -> strideE))
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      println(s"[scale] wrote ${factor}x events (stride $strideE) to $out")
    }
    // embeddings twin (r15): the ANN-family probe input. vec_id offsets
    // per copy; vectors replicate verbatim — 8× exact-duplicate vectors
    // is the worst case for every bucketing scheme (maximal collision
    // mass per centroid/band), so a flat wall here is a strong signal.
    // salt mode (r16) rotates each copy's components by the copy index:
    // a cyclic rotation is an isometry (dot(rot_i(u), rot_i(v)) =
    // dot(u, v)), so every copy keeps the ORIGINAL near-dup pair
    // structure internally while cross-copy cosines decorrelate — the
    // clone-free input-linearity arm, the embeddings analog of the
    // per-copy text marker above.
    if (new java.io.File(s"$src/embeddings.parquet").exists) {
      val em = spark.read.parquet(s"$src/embeddings.parquet")
      val strideV = strideOf(em, "vec_id")
      // the rotation lag comes from the DATA's dim — a hardcoded width
      // would silently truncate vectors on any other fixture — and only
      // dim−1 distinct nontrivial rotations exist, so a factor beyond
      // dim would wrap copy dim back to a verbatim clone of copy 0:
      // fail loudly instead of silently reintroducing the clone mass
      // the salt arm exists to remove
      val dim = em.select(size(col("embedding"))).head.getInt(0)
      require(!salt || factor <= dim,
        s"ScaleReplicate: salt mode supports at most dim=$dim copies " +
          s"(rotation lags repeat past that); got factor=$factor")
      val reps = (0 until factor).map { i =>
        val keyed = em.withColumn("vec_id", col("vec_id") + lit(i * strideV))
        val r = i % dim
        if (salt && i > 0)
          keyed.withColumn("embedding", expr(
            s"concat(slice(embedding, $r + 1, $dim - $r), " +
              s"slice(embedding, 1, $r))"))
        else keyed
      }.reduce(_ unionByName _)
      reps.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      println(s"[scale] wrote ${factor}x embeddings (stride $strideV" +
        (if (salt) ", rotated" else "") + s") to $out")
    }
    // relational twin (r15): the TPC-H-ish join graph replicated
    // COHERENTLY — each copy is a disjoint key universe (every FK and
    // its PK offset by the same per-entity stride), so joins stay
    // exactly as selective as at 1×: an 8× probe measures the engine,
    // not join fan-in artifacts. nation/region are true dimensions and
    // replicate verbatim (nationkeys repeat across universes — the
    // broadcast-dim posture under test).
    // the relational universe replicates only when the full coherent
    // join graph is present (a partial set would break FK selectivity);
    // same existence-guard posture as the events/embeddings twins
    val relTables = Seq("orders", "lineitem", "customer", "supplier",
      "part", "nation", "region")
    if (relTables.forall(existsTable)) {
      val orders   = spark.read.parquet(s"$src/orders.parquet")
      val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
      val customer = spark.read.parquet(s"$src/customer.parquet")
      val supplier = spark.read.parquet(s"$src/supplier.parquet")
      val part     = spark.read.parquet(s"$src/part.parquet")
      val sO = strideOf(orders, "o_orderkey")
      val sC = strideOf(customer, "c_custkey")
      val sS = strideOf(supplier, "s_suppkey")
      val sP = strideOf(part, "p_partkey")
      rep(orders, Map("o_orderkey" -> sO, "o_custkey" -> sC))
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      rep(lineitem, Map("l_orderkey" -> sO, "l_partkey" -> sP, "l_suppkey" -> sS))
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      rep(customer, Map("c_custkey" -> sC))
        .write.mode("overwrite").parquet(s"$out/customer.parquet")
      rep(supplier, Map("s_suppkey" -> sS))
        .write.mode("overwrite").parquet(s"$out/supplier.parquet")
      rep(part, Map("p_partkey" -> sP))
        .write.mode("overwrite").parquet(s"$out/part.parquet")
      Seq("nation", "region").foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
      println(s"[scale] wrote ${factor}x relational universe " +
        s"(strides o=$sO c=$sC s=$sS p=$sP) to $out")
    } else {
      val missing = relTables.filterNot(existsTable).mkString(", ")
      println(s"[scale] skipping relational universe — missing: $missing")
    }
    println(s"[scale] wrote ${factor}x documents (stride $stride) to $out")
    spark.stop()
  }
}
