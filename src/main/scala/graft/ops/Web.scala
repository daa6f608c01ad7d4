package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL and domain operators — the front of every web-corpus pipeline
  * (C4 §2.1 and RefinedWeb §3.1 filter and dedup by URL/registered
  * domain before any content pass). All pure column expressions over
  * RE2-compatible regexes (no lookarounds), so the DuckDB oracle can
  * replicate them exactly; no UDFs, everything stays in codegen.
  *
  * Scale stance: normalization/domain extraction are narrow per-row
  * projections (zero shuffle); [[urlDedup]] is one groupBy on the
  * normalized key; [[domainFilter]] is a broadcast anti-join against
  * the (tiny) blocklist.
  */
object Web {

  /** Query parameters dropped by [[urlNormalize]]: click/campaign
    * trackers that vary per-visit without changing content — the
    * standard strip set for URL-keyed dedup. */
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "ref")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://.*$"
  private val AuthRe   = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$"
  private val PathRe   = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*).*$"
  private val QueryRe  = "^[^?#]*\\?([^#]*).*$"

  /** Canonical URL form — the dedup key for URL-level dedup:
    * scheme and host lowercased, trailing host dot and the scheme's
    * default port stripped, empty path → `/`, tracking params
    * ([[TrackingParams]] + `utm_*`) dropped, surviving query params
    * sorted (byte order — param order is not content), fragment
    * dropped. Malformed input (no `scheme://`) passes through trimmed
    * — garbage keys only ever collide with themselves. */
  def urlNormalize(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, SchemeRe, 1))
    val authRaw = lower(regexp_extract(u, AuthRe, 1))
    // split host/port without lookarounds (RE2 parity with the oracle)
    val hostClean = regexp_replace(
      regexp_replace(authRaw, ":[0-9]+$", ""), "\\.$", "")
    val port = regexp_extract(authRaw, ":([0-9]+)$", 1)
    val defaultPort = port === "" ||
      (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val auth = when(defaultPort, hostClean)
      .otherwise(concat(hostClean, lit(":"), port))
    val path0 = regexp_extract(u, PathRe, 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val kept = array_sort(filter(split(regexp_extract(u, QueryRe, 1), "&"),
      p => {
        val name = element_at(split(p, "=", 2), 1)
        !(name.startsWith("utm_") || name.isin(TrackingParams: _*)) &&
          length(p) > 0
      }))
    val query = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), auth, path, query))
  }

  /** Registrable domain of a URL (the per-domain cap / blocklist key):
    * host minus port, last two labels — or three when the second-level
    * label is a generic second-level registry (`co.uk`, `ac.jp`, …:
    * second-to-last in {co,com,net,org,gov,ac,edu} under a 2-letter
    * ccTLD). A documented approximation of the Mozilla Public Suffix
    * List, which is a data file, not an algorithm; pipelines that need
    * the full PSL broadcast-join it against this column's input. */
  def registrableDomain(url: Column): Column = {
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(trim(url), AuthRe, 1)),
        ":[0-9]+$", ""),
      "\\.$", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    val secondLevel = element_at(labels, n - 1)
    val cc = element_at(labels, n)
    val take3 = n >= lit(3) && length(cc) === 2 &&
      secondLevel.isin("co", "com", "net", "org", "gov", "ac", "edu")
    when(n <= 2, host)
      .when(take3, concat_ws(".",
        element_at(labels, n - 2), secondLevel, cc))
      .otherwise(concat_ws(".", secondLevel, cc))
  }

  /** URL-keyed exact dedup: one row per canonical URL with the doc
    * count and the keeper (lowest id) — re-crawls and tracking-param
    * variants of the same page collapse. One groupBy shuffle on the
    * normalized key. */
  def urlDedup(df: DataFrame, urlCol: Column,
               idCol: String = "doc_id"): DataFrame =
    df.select(urlNormalize(urlCol).as("url_norm"), col(idCol))
      .groupBy(col("url_norm"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper"))

  /** Per-registrable-domain corpus mass — the input to per-domain caps
    * ([[Sampling.capPerGroup]]) and blocklist review. */
  def domainStats(df: DataFrame, urlCol: Column,
                  textCol: String = "text"): DataFrame =
    df.select(registrableDomain(urlCol).as("domain"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__nt"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))

  /** Drop every doc whose registrable domain is blocklisted — the C4
    * badwords-domain / RefinedWeb blocklist gate. Broadcast anti-join:
    * blocklists are thousands of rows, never corpus-sized. */
  def domainFilter(df: DataFrame, urlCol: Column,
                   blocklist: DataFrame): DataFrame =
    df.withColumn("__dom", registrableDomain(urlCol))
      .join(broadcast(blocklist.toDF("__bad")),
        col("__dom") === col("__bad"), "left_anti")
      .drop("__dom")

  /** Redirect-chain resolution by POINTER DOUBLING — the URL
    * canonicalization step a web corpus runs before dedup (wiki
    * redirects, shorteners, http→https hops): each round every chain
    * pointer jumps to its target's target, so a length-L chain resolves
    * in ⌈log₂ L⌉ keyed equi-join rounds, not L — the classic
    * list-ranking trick, and the difference between 8 shuffles and
    * 10⁶ at web scale. Input: one `(src, dst)` edge per redirecting
    * page (acyclic by contract — a cycle would pin srcs to a
    * 2^rounds-step orbit; detect with [[Graph.triangles]]-style audits
    * upstream). Carries the hop count through the doubling (hops add
    * when the jump lands on a still-redirecting node). Lineage cut per
    * round, the pageRankInt posture.
    */
  def resolveRedirects(redirects: DataFrame, rounds: Int = 8): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"resolveRedirects: bad rounds=$rounds")
    var cur = redirects.select(col("src"), col("dst"), lit(1L).as("hops"))
    for (_ <- 1 to rounds) {
      cur = cur.as("a")
        .join(cur.as("b"), col("a.dst") === col("b.src"), "left")
        .select(col("a.src").as("src"),
          coalesce(col("b.dst"), col("a.dst")).as("dst"),
          (col("a.hops") + coalesce(col("b.hops"), lit(0L))).as("hops"))
        .localCheckpoint(eager = false)
    }
    cur.select(col("src"), col("dst").as("final_dst"), col("hops"))
  }
}
