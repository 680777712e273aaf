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

  /** Strip `<script>`/`<style>` payloads and `<!-- comments -->`
    * before any attribute work — the same pre-strip
    * [[graft.ops.TextAnalysis.mainContent]] runs. Without it,
    * commented-out anchors and anchor markup inside script strings
    * (`document.write('<a href=…')`) are extracted, pollute
    * `link_pos` numbering and feed phantom URLs into
    * [[frontierDiscover]]. The closer is anchored to its opener with a
    * backreference (`</\1>`): a `</style>` must not close a `<script>`
    * block, which would truncate the strip early on hostile pages.
    * (DuckDB oracles replaying this strip use the unanchored
    * alternation — RE2 has no backreferences — identical on the
    * well-formed fixture HTML both engines see.) */
  private def stripInert(html: Column): Column =
    regexp_replace(
      regexp_replace(html,
        "(?is)<(script|style)[^>]*>.*?</\\1\\s*>", " "),
      "(?s)<!--.*?-->", " ")

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
    val html = stripInert(col(htmlCol))
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
    // materialize the normalized html ONCE: q2 feeds both the anchor
    // extraction and the <base> lookup, and CollapseProject would
    // otherwise inline the whole replace chain into each consumer
    // (measured ~3x the per-row cost)
    val staged = pages.select(col(idCol), col(urlCol), q2.as("_q"))
    val hrefs = regexp_extract_all(col("_q"),
      lit("(?is)<a\\b[^>]*?\\shref\\s*=\\s*\"([^\"]*)\""), lit(1))
    val baseHref = regexp_extract(col("_q"),
      "(?is)<base\\b[^>]*?\\shref\\s*=\\s*\"([^\"]*)\"", 1)
    val effBase = when(length(baseHref) > 0,
      url_resolve(col(urlCol), attrDecode(baseHref)))
      .otherwise(col(urlCol))
    val withLinks = staged
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

  /** [[extractLinks]] plus the two per-anchor signals a training-data
    * pipeline wants from links: the ANCHOR TEXT (the strongest public
    * relevance label the web carries for a target page — anchor-text
    * corpora are a standard retrieval/quality training input) and the
    * `rel="nofollow"` flag (kept as a COLUMN, not a drop — follow
    * policy is the caller's, and nofollow density is itself a spam
    * signal). Anchor text is the block's inner HTML through
    * [[graft.ops.TextAnalysis.htmlText]] (nested tags stripped,
    * entities decoded, whitespace collapsed).
    *
    * Returns (idCol, urlCol, anchor_pos, href, anchor_text, nofollow,
    * dst_url). Same drop rules as [[extractLinks]]; same shape —
    * map-only regexp + one posexplode, NO shuffle at any scale. */
  def extractAnchors(
      pages: DataFrame,
      idCol: String = "doc_id",
      urlCol: String = "url",
      htmlCol: String = "html",
      dropSchemes: Seq[String] = DefaultDropSchemes): DataFrame = {
    require(dropSchemes.forall(_.nonEmpty), "extractAnchors: empty scheme")
    val html = stripInert(col(htmlCol))
    // normalize href AND rel quoting so one pattern sees every form.
    // TWO passes per form: the pattern re-anchors at the tag start, so
    // one regexp_replace scan rewrites only the FIRST matching
    // attribute per tag (the scan resumes after the match) — a tag
    // with href AND rel both single-quoted/bare needs the second pass.
    val p1 = "(?is)(<(?:a|base)\\b[^>]*?\\s(?:href|rel)\\s*=\\s*)'([^']*)'"
    val p2 = "(?is)(<(?:a|base)\\b[^>]*?\\s(?:href|rel)\\s*=\\s*)([^\"'\\s>][^\\s>]*)"
    val q1 = regexp_replace(regexp_replace(html, p1, "$1\"$2\""), p1, "$1\"$2\"")
    val q2 = regexp_replace(regexp_replace(q1, p2, "$1\"$2\""), p2, "$1\"$2\"")
    // materialize the normalized html once (see extractLinks: the
    // replace chain must not inline into every consumer)
    val staged = pages.select(col(idCol), col(urlCol), q2.as("_q"))
    val blocks = regexp_extract_all(col("_q"),
      lit("(?is)<a\\b[^>]*>.*?</a>"), lit(0))
    val baseHref = regexp_extract(col("_q"),
      "(?is)<base\\b[^>]*?\\shref\\s*=\\s*\"([^\"]*)\"", 1)
    val effBase = when(length(baseHref) > 0,
      url_resolve(col(urlCol), attrDecode(baseHref)))
      .otherwise(col(urlCol))
    val exploded = staged
      .select(col(idCol), col(urlCol), effBase.as("_base"),
        posexplode_outer(blocks).as(Seq("anchor_pos", "_blk")))
    val hrefOf = regexp_extract(col("_blk"),
      "(?is)\\A<a\\b[^>]*?\\shref\\s*=\\s*\"([^\"]*)\"", 1)
    val inner = regexp_replace(col("_blk"), "(?is)\\A<a\\b[^>]*>|</a>\\z", "")
    val anchors = exploded
      .select(col(idCol), col(urlCol), col("anchor_pos"),
        attrDecode(hrefOf).as("href"),
        graft.ops.TextAnalysis.htmlText(inner).as("anchor_text"),
        col("_blk").rlike("(?is)\\A<a\\b[^>]*?\\srel\\s*=\\s*\"[^\"]*\\bnofollow\\b")
          .cast("int").as("nofollow"),
        col("_base"))
    val schemeOf = lower(regexp_extract(col("href"), "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    anchors
      .where(col("href").isNotNull && length(col("href")) > 0 &&
        !col("href").startsWith("#") &&
        !schemeOf.isin(dropSchemes: _*))
      .select(col(idCol), col(urlCol), col("anchor_pos"), col("href"),
        col("anchor_text"), col("nofollow"),
        url_normalize(url_resolve(col("_base"), col("href"))).as("dst_url"))
      .where(col("dst_url").isNotNull)
  }

  /** Page-level index/dedup signals from the HTML head — the THREE
    * flags a crawl curation pass reads before any content work:
    * `canonical_url` (`<link rel="canonical" href>` resolved against
    * the page URL and canonicalized — the author's own dedup vote;
    * NULL when absent), and `meta_noindex` / `meta_nofollow` (from
    * `<meta name="robots" content="…">` — noindex pages leave the
    * corpus, nofollow pages contribute no frontier links; `none`
    * implies both, per the public robots-meta convention). Quote
    * styles normalized as in [[extractAnchors]]; attribute order
    * inside both tags is free.
    *
    * Returns (idCol, urlCol, canonical_url, meta_noindex,
    * meta_nofollow). Map-only regexp — NO shuffle at any scale. */
  def pageMeta(
      pages: DataFrame,
      idCol: String = "doc_id",
      urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val html = stripInert(col(htmlCol))
    val p1 = "(?is)(<(?:link|meta)\\b[^>]*?\\s(?:href|rel|name|content)\\s*=\\s*)'([^']*)'"
    val p2 = "(?is)(<(?:link|meta)\\b[^>]*?\\s(?:href|rel|name|content)\\s*=\\s*)([^\"'\\s>][^\\s>]*)"
    // up to two quote-normalization passes per attribute pair (see
    // extractAnchors: the pattern re-anchors at the tag start)
    val q1 = regexp_replace(regexp_replace(html, p1, "$1\"$2\""), p1, "$1\"$2\"")
    val q2 = regexp_replace(regexp_replace(q1, p2, "$1\"$2\""), p2, "$1\"$2\"")
    // materialize the normalized html once — FOUR extracts read it
    // below, and inlining the replace chain into each would 4x the
    // per-row cost (see extractLinks)
    val staged = pages.select(col(idCol), col(urlCol), q2.as("_q"))
    // <link rel="canonical" href="..."> — either attribute order
    val canonA = regexp_extract(col("_q"),
      "(?is)<link\\b[^>]*?\\srel\\s*=\\s*\"canonical\"[^>]*?\\shref\\s*=\\s*\"([^\"]*)\"", 1)
    val canonB = regexp_extract(col("_q"),
      "(?is)<link\\b[^>]*?\\shref\\s*=\\s*\"([^\"]*)\"[^>]*?\\srel\\s*=\\s*\"canonical\"", 1)
    val canonHref = when(length(canonA) > 0, canonA)
      .when(length(canonB) > 0, canonB)
    // <meta name="robots" content="..."> — either attribute order
    val contentA = regexp_extract(col("_q"),
      "(?is)<meta\\b[^>]*?\\sname\\s*=\\s*\"robots\"[^>]*?\\scontent\\s*=\\s*\"([^\"]*)\"", 1)
    val contentB = regexp_extract(col("_q"),
      "(?is)<meta\\b[^>]*?\\scontent\\s*=\\s*\"([^\"]*)\"[^>]*?\\sname\\s*=\\s*\"robots\"", 1)
    val directives = lower(when(length(contentA) > 0, contentA)
      .when(length(contentB) > 0, contentB).otherwise(lit("")))
    val noindex = directives.rlike("(?:^|[\\s,])(?:noindex|none)(?:$|[\\s,])")
    val nofollow = directives.rlike("(?:^|[\\s,])(?:nofollow|none)(?:$|[\\s,])")
    staged.select(col(idCol), col(urlCol),
      url_normalize(url_resolve(col(urlCol), attrDecode(canonHref)))
        .as("canonical_url"),
      noindex.cast("int").as("meta_noindex"),
      nofollow.cast("int").as("meta_nofollow"))
  }

  /** Anchor-text aggregation per target URL — "what the web calls this
    * page": follow-able anchor count, distinct-text count, and the
    * MOST COMMON anchor text (ties broken toward the lexicographically
    * LARGEST text — a struct-max rides one partial aggregate, and the
    * tie direction is documented so engines agree). Empty anchor texts
    * (image links) and nofollow anchors are excluded.
    *
    * Shape: two aggregates — (dst, text) counts, then ONE struct-max
    * per dst. Both map-side combine; no window over the corpus. */
  def anchorTextAgg(
      anchors: DataFrame,
      dstCol: String = "dst_url",
      textCol: String = "anchor_text",
      nofollowCol: String = "nofollow"): DataFrame =
    anchors
      .where(col(nofollowCol) === 0 && length(col(textCol)) > 0)
      .groupBy(col(dstCol).as("dst_url"), col(textCol).as("_t"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col("dst_url"))
      .agg(sum(col("_n")).as("n_anchors"),
        count(lit(1)).as("n_texts"),
        max(struct(col("_n"), col("_t"))).as("_top"))
      .select(col("dst_url"), col("n_anchors"), col("n_texts"),
        col("_top._t").as("top_text"), col("_top._n").as("top_text_n"))

  /** Redirect-chain resolution: follow HTTP 3xx `Location` edges to
    * the terminal URL, `maxHops` statically-unrolled pointer-chase
    * rounds (crawlers cap redirect depth at 5–10, so a linear unroll —
    * one hash join per hop on a redirect-only edge table, orders of
    * magnitude smaller than the corpus — beats pointer-doubling's
    * extra shuffles at real depths). A chain still unresolved after
    * `maxHops` hops (deeper than the cap, or a redirect LOOP — the
    * 6↔7 two-cycle case) reports `resolved = false` with the cursor
    * where it stopped; loops never hang the job.
    *
    * `redirects` is one edge per source URL (src → Location target);
    * duplicate sources collapse to the SMALLEST target
    * (deterministic). Returns (url, final_url, hops, resolved).
    *
    * Shape: edge dedup is one partial agg; each round is one equi-join
    * against the persisted edge table + map-only fold. */
  def redirectChains(
      redirects: DataFrame,
      maxHops: Int = 5,
      srcCol: String = "url",
      dstCol: String = "location"): DataFrame = {
    require(maxHops >= 1 && maxHops <= 32,
      s"redirectChains: need 1 <= maxHops <= 32, got $maxHops")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges0 = redirects
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .groupBy(col(srcCol).as("_es"))
      .agg(min(col(dstCol)).as("_ed"))
    val edges = if (maxHops > 1) edges0.persist(lvl) else edges0
    var state = edges.select(col("_es").as("url"), col("_ed").as("_cur"),
      lit(1).as("hops"))
    for (_ <- 2 to maxHops + 1) {
      // one more hop for every cursor that still sits on a redirect;
      // the (maxHops+1)-th round only PROBES — any advance it would
      // make proves the chain exceeds the cap, flagged below via _nx
      state = state
        .join(edges, state("_cur") === edges("_es"), "left")
        .select(col("url"),
          coalesce(col("_ed"), col("_cur")).as("_cur"),
          (col("hops") + when(col("_ed").isNotNull, 1).otherwise(0)).as("hops"))
    }
    val probe = edges.select(col("_es").as("_ps"))
    state
      .join(probe, state("_cur") === probe("_ps"), "left")
      .select(col("url"), col("_cur").as("final_url"),
        least(col("hops"), lit(maxHops)).as("hops"),
        (col("_ps").isNull && col("hops") <= maxHops).as("resolved"))
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

  /** Authority-proportional CRAWL BUDGET allocation: split a total
    * fetch budget across hosts proportionally to an authority score
    * (e.g. [[graft.ops.Graph.pageRank]] over [[hostLinkGraph]]), with
    * a floor so no known host starves. Exact integer arithmetic:
    * `budget = minPerHost + floor((total − minPerHost·H) · score / Σ
    * score)` — conservative floors mean the allocation never EXCEEDS
    * `total` (the remainder stays unspent; deterministic, and two
    * engines agree without largest-remainder tie games). Requires
    * `total ≥ minPerHost · |hosts|`, enforced at runtime as a row
    * guard (NULL budgets rather than a driver-side count action).
    *
    * Shape: one scalar aggregate (Σ score, H) broadcast back as
    * literals via a cross join of one row — the host table is already
    * |hosts|-sized. */
  def crawlBudget(
      authority: DataFrame,
      totalBudget: Long,
      minPerHost: Long = 1L,
      hostCol: String = "host",
      scoreCol: String = "score_micro"): DataFrame = {
    require(totalBudget > 0, s"crawlBudget: totalBudget=$totalBudget")
    require(minPerHost >= 0, s"crawlBudget: minPerHost=$minPerHost")
    val totals = authority.agg(
      sum(col(scoreCol)).as("_ssum"), count(lit(1)).as("_h"))
    authority.crossJoin(broadcast(totals))
      .select(col(hostCol).as("host"), col(scoreCol).as("score_micro"),
        when(col("_ssum") > 0 && lit(totalBudget) >= col("_h") * minPerHost,
          lit(minPerHost) +
            expr(s"($totalBudget - _h * $minPerHost) * $scoreCol div _ssum"))
          .as("budget"))
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
