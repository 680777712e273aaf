package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions.{url_normalize, url_resolve}

/** Link-graph operators — the bridge from a crawled PAGE to the URL
  * family: extract `<a href>` targets from raw HTML, resolve them
  * against the page URL per RFC 3986 §5 ([[graft.functions
  * .UrlResolveExpression]], codegen), canonicalize ([[graft.functions
  * .UrlNormalizeExpression]]), then discover the crawl frontier (new
  * URLs not yet fetched, politeness-capped per host) and aggregate the
  * host-level link graph that seeds PageRank-style authority scoring
  * ([[Graph]] takes the edges as-is).
  *
  * Scale shape: extraction is map-only regexp + one generate (explode)
  * — zero shuffles, stays inside whole-stage codegen; the frontier is
  * one canonical-URL aggregate + one anti join (size-adaptive: the
  * crawled set broadcasts only when probed small, else SHUFFLE_HASH —
  * at crawl scale the fetched set is billions of rows and must never
  * broadcast) + one bounded per-host window; the host graph is one
  * aggregate whose key space is |hosts|², bounded far below |links|.
  *
  * Reference anchor: the reference's scraper collects `<a href>` from
  * fetched pages (dataset discovery walk) — here generalized to the
  * crawl-frontier form a 100 TB pipeline runs.
  */
object LinkOps {

  /** HTML-attribute entity decode for href values (the set pages use
    * in practice inside attributes; `&amp;` is the critical one —
    * query separators are routinely escaped in conforming HTML). */
  private def attrDecode(c: Column): Column =
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&#x2F;" -> "/", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }

  /** Schemes a crawl frontier never fetches. */
  val DefaultDropSchemes: Seq[String] =
    Seq("javascript", "mailto", "tel", "data", "about", "ftp")

  /** Extract every `<a href>` from raw HTML and resolve it to a
    * canonical absolute URL. Honors a `<base href>` tag (itself
    * resolved against the page URL) as the effective resolution base —
    * real pages use it and ignoring it mis-resolves every relative
    * link on them. Quote styles `href="x"`, `href='x'` and unquoted
    * `href=x` are all matched (normalized to one form by two bounded
    * regexp passes, then ONE `regexp_extract_all`). Attribute entities
    * are decoded (`&amp;` → `&`) before resolution.
    *
    * Dropped rows (never fetchable, so never frontier candidates):
    * fragment-only hrefs (`#sec` — a self reference), empty hrefs,
    * non-fetch schemes ([[DefaultDropSchemes]]), and hrefs whose
    * resolution fails (non-hierarchical base).
    *
    * Returns (idCol, urlCol, link_pos, href, dst_url) — `link_pos` is
    * the anchor's position among the page's extracted hrefs (dropped
    * anchors still occupy their position, so positions are stable
    * under filter changes), `dst_url` the canonical resolved target.
    *
    * Shape: map-only regexp + one posexplode — NO shuffle at any
    * scale; the per-row cost is linear in the HTML size. */
  def extractLinks(
      pages: DataFrame,
      idCol: String = "doc_id",
      urlCol: String = "url",
      htmlCol: String = "html",
      dropSchemes: Seq[String] = DefaultDropSchemes): DataFrame = {
    require(dropSchemes.forall(_.nonEmpty), "extractLinks: empty scheme")
    val html = col(htmlCol)
    // Normalize href quoting to double quotes so ONE extract pass
    // sees every anchor: 'x' -> "x", then bare -> "x" (the leading
    // char class excludes quotes, so already-quoted values are
    // untouched; values containing '>' or whitespace need quotes per
    // the HTML grammar, so the bare form stops at either).
    val q1 = regexp_replace(html,
      "(?is)(<(?:a|base)\\b[^>]*?\\shref\\s*=\\s*)'([^']*)'", "$1\"$2\"")
    val q2 = regexp_replace(q1,
      "(?is)(<(?:a|base)\\b[^>]*?\\shref\\s*=\\s*)([^\"'\\s>][^\\s>]*)",
      "$1\"$2\"")
    val hrefs = regexp_extract_all(q2,
      lit("(?is)<a\\b[^>]*?\\shref\\s*=\\s*\"([^\"]*)\""), lit(1))
    val baseHref = regexp_extract(q2,
      "(?is)<base\\b[^>]*?\\shref\\s*=\\s*\"([^\"]*)\"", 1)
    val effBase = when(length(baseHref) > 0,
      url_resolve(col(urlCol), attrDecode(baseHref)))
      .otherwise(col(urlCol))
    val withLinks = pages
      .select(col(idCol), col(urlCol), effBase.as("_base"),
        posexplode_outer(hrefs).as(Seq("link_pos", "_href_raw")))
      .select(col(idCol), col(urlCol), col("link_pos"),
        attrDecode(col("_href_raw")).as("href"), col("_base"))
    val schemeOf = lower(regexp_extract(col("href"), "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    withLinks
      .where(col("href").isNotNull && length(col("href")) > 0 &&
        !col("href").startsWith("#") &&
        !schemeOf.isin(dropSchemes: _*))
      .select(col(idCol), col(urlCol), col("link_pos"), col("href"),
        url_normalize(url_resolve(col("_base"), col("href"))).as("dst_url"))
      .where(col("dst_url").isNotNull)
  }

  /** Crawl-frontier discovery: canonical link targets not yet in the
    * fetched set, ranked per host by in-link count (OPIC-flavored
    * priority — pages many fetched pages point at get fetched first)
    * and capped at `maxPerHost` (politeness: no host floods the
    * frontier). Deterministic: ties break on the URL itself.
    *
    * `links` needs a `dstCol` of canonical URLs (the
    * [[extractLinks]] output's `dst_url`); `crawled` needs
    * `crawledUrlCol` canonical URLs. `smallCrawled` follows the
    * [[UrlOps]] size-adaptive discipline: pass the probe verdict when
    * the caller holds a cheap proxy, else the frontier probes the
    * fetched set itself ([[UrlOps.hostDimIsSmall]]-style bounded
    * `limit(k+1).count`). Small → broadcast anti join; large →
    * SHUFFLE_HASH anti join (the fetched set at crawl scale is
    * billions of rows — broadcasting it is a driver OOM, and
    * sort-merge pays a sort on both corpus-sized sides).
    *
    * Returns (dst_url, host, n_inlinks, host_rank).
    *
    * Shape: ONE map-side-combined aggregate on dst_url, one anti
    * join, one per-host window bounded by `maxPerHost` output rows per
    * host. */
  def frontierDiscover(
      links: DataFrame,
      crawled: DataFrame,
      dstCol: String = "dst_url",
      crawledUrlCol: String = "url",
      maxPerHost: Int = 1000,
      smallCrawled: Option[Boolean] = None,
      broadcastMaxRows: Long = 1000000L): DataFrame = {
    require(maxPerHost > 0, s"frontierDiscover: maxPerHost=$maxPerHost")
    val candidates = links
      .where(col(dstCol).isNotNull)
      .groupBy(col(dstCol).as("dst_url"))
      .agg(count(lit(1)).as("n_inlinks"))
    val fetched = crawled.select(col(crawledUrlCol).as("dst_url")).distinct()
    val small = smallCrawled.getOrElse(
      crawled.limit(math.min(broadcastMaxRows, Int.MaxValue - 1L).toInt + 1)
        .count() <= broadcastMaxRows)
    val fresh =
      if (small) candidates.join(broadcast(fetched), Seq("dst_url"), "left_anti")
      else candidates.join(fetched.hint("SHUFFLE_HASH"), Seq("dst_url"), "left_anti")
    val w = Window.partitionBy(col("host"))
      .orderBy(col("n_inlinks").desc, col("dst_url"))
    fresh
      .select(col("dst_url"), lower(parse_url(col("dst_url"), lit("HOST"))).as("host"),
        col("n_inlinks"))
      .withColumn("host_rank", row_number().over(w))
      .where(col("host_rank") <= maxPerHost)
  }

  /** Host-level link graph: one edge per (src_host, dst_host) with the
    * link count and the number of distinct linking pages — the input
    * [[Graph]]'s PageRank/authority ops take directly. `intra` marks
    * self-edges (site-internal links), kept because internal/external
    * ratio is itself a quality signal.
    *
    * Shape: host parse is map-only; ONE aggregate whose key space is
    * pairs of hosts — orders of magnitude below |links| at any scale
    * (the distinct-count rides the same shuffle as a two-level
    * aggregate, no extra pass over the corpus). */
  def hostLinkGraph(
      links: DataFrame,
      srcUrlCol: String = "url",
      dstCol: String = "dst_url"): DataFrame =
    links
      .select(lower(parse_url(col(srcUrlCol), lit("HOST"))).as("src_host"),
        lower(parse_url(col(dstCol), lit("HOST"))).as("dst_host"),
        col(srcUrlCol).as("_src"))
      .where(col("src_host").isNotNull && col("dst_host").isNotNull)
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("_src")).as("n_src_pages"))
      .withColumn("intra", (col("src_host") === col("dst_host")).cast("int"))
}
