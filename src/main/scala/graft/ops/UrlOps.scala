package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-keyed corpus operators — the FIRST dedup pass a crawl-scale
  * training-data pipeline runs (CCNet/C4 dedup by normalized URL
  * before any content hash; the WARC ingest in `sources/Warc.scala`
  * feeds this). Canonicalization is [[graft.functions
  * .UrlNormalizeExpression]] (codegen, map-only); dedup is ONE
  * canonical-URL-keyed partial aggregate — map-side combine collapses
  * per-partition duplicates before the shuffle, so the reduce side
  * carries |distinct URLs| not |rows|, the property that holds at
  * 100 TB. */
object UrlOps {

  /** Canonical URL column — see [[graft.functions.UrlNormalizeExpression]]
    * for the exact normalization contract. */
  def urlNormalize(c: Column): Column =
    graft.functions.UrlFunctions.url_normalize(c)

  /** Default host-count ceiling for broadcasting the per-host robots
    * rule dim. Rule arrays are KB-sized per host, so 100k hosts is
    * ~100 MB — inside Spark's broadcast comfort zone. A CommonCrawl-
    * scale corpus carries tens of MILLIONS of hosts; broadcasting that
    * unconditionally is a driver-OOM scale-killer, so above the
    * ceiling the rule joins fall back to a shuffled hash join on
    * `host` (never sort-merge — the dim side always hash-builds). */
  val DefaultBroadcastMaxHosts: Long = 100000L

  /** Bounded small-side probe: true iff `df` has at most `max` rows.
    * `limit(max+1).count()` stops the scan early instead of counting a
    * crawl-scale table end to end — the probe's cost is bounded by the
    * threshold, not the input. Public as [[hostDimIsSmall]] so callers
    * holding the RAW robots frame can size the dim WINDOW-FREE and
    * hand the verdict to [[robotsAllowed]]/[[politenessSchedule]]
    * (whose own fallback probe must execute the rule-derivation
    * lineage — one window pass — just to count hosts). */
  private def atMostRows(df: DataFrame, max: Long): Boolean =
    df.limit(math.min(max, Int.MaxValue - 1L).toInt + 1).count() <= max

  /** Size-class probe over the RAW robots frame (or any window-free
    * host-count proxy): pass the result as `smallDim` to the rule
    * APPLICATION ops so they skip probing their derived-rules lineage. */
  def hostDimIsSmall(
      robots: DataFrame,
      hostCol: String = "host",
      broadcastMaxHosts: Long = DefaultBroadcastMaxHosts): Boolean =
    atMostRows(robots.select(col(hostCol)), broadcastMaxHosts)

  /** KEEP-BEST per canonical URL: collapse every spelling of the same
    * canonical URL to one winner — highest `qualityCol` (e.g. text
    * length, a quality score), ties broken by SMALLEST `idCol` so
    * reruns and engines agree. Returns one row per canonical URL:
    * (canonical_url, host, n_dups, kept_id), host parsed from the
    * canonical form (already lowercased) for per-domain accounting.
    *
    * Shape: map-only normalize fused into the scan, then ONE groupBy
    * whose argmax rides a single struct-max partial aggregate — no
    * window over the corpus, no self-join. NULL URLs are dropped (a
    * crawl row without a URL has nothing to dedup on). */
  def urlDedup(
      df: DataFrame,
      urlCol: String,
      idCol: String,
      qualityCol: String): DataFrame = {
    val base = df
      .where(col(urlCol).isNotNull)
      .select(
        urlNormalize(col(urlCol)).as("canonical_url"),
        col(idCol).cast("long").as("_id"),
        col(qualityCol).cast("long").as("_q"))
    base
      .groupBy(col("canonical_url"))
      .agg(
        count(lit(1)).as("n_dups"),
        // lexicographic struct max = (max quality, then min id)
        max(struct(coalesce(col("_q"), lit(Long.MinValue)).as("q"),
          (lit(0L) - col("_id")).as("negid"), col("_id").as("id")))
          .getField("id").as("kept_id"))
      .select(
        col("canonical_url"),
        lower(parse_url(col("canonical_url"), lit("HOST"))).as("host"),
        col("n_dups"), col("kept_id"))
  }

  /** The crawl chain's URL-keyed front door: WARC responses
    * ([[graft.sources.Warc.responses]]) → HTML→text
    * ([[graft.ops.TextAnalysis.htmlText]]) → canonical-URL keep-best.
    * One row per canonical URL: (canonical_url, record_id, text,
    * n_dups), winner = longest extracted text (byte length), ties to
    * the smallest record id — deterministic across engines and reruns.
    * Same ONE-partial-agg shape as [[urlDedup]]; the winning text rides
    * the struct-min payload, so no second join back. */
  def crawlDedup(
      responses: DataFrame,
      urlCol: String = "target_uri",
      idCol: String = "record_id",
      bodyCol: String = "body"): DataFrame = {
    val base = responses
      .where(col(urlCol).isNotNull)
      .select(
        urlNormalize(col(urlCol)).as("canonical_url"),
        col(idCol).cast("string").as("_id"),
        graft.ops.TextAnalysis.htmlText(col(bodyCol)).as("_text"))
      .withColumn("_q", octet_length(col("_text")).cast("long"))
    base
      .groupBy(col("canonical_url"))
      .agg(
        count(lit(1)).as("n_dups"),
        // lexicographic struct MIN = (max quality via -q, then min id);
        // text rides as payload — ids are unique so it never compares.
        // Negate FIRST, then coalesce NULL to the LOSING end (MaxValue):
        // coalescing _q to MinValue before the negation would wrap
        // (0 - Long.MinValue == Long.MinValue in non-ANSI mode) and a
        // null-body row would beat every real-text duplicate
        min(struct(coalesce(lit(0L) - col("_q"), lit(Long.MaxValue))
          .as("nq"), col("_id").as("id"), col("_text").as("text")))
          .as("_w"))
      .select(col("canonical_url"), col("_w.id").as("record_id"),
        col("_w.text").as("text"), col("n_dups"))
  }

  /** Parse robots.txt bodies into a (host, agent, kind, path) rule
    * table — the crawl-politeness side of the URL front door
    * (RFC 9309 Robots Exclusion Protocol: user-agent groups with
    * consecutive `User-agent` lines sharing one group,
    * `Allow`/`Disallow` path patterns kept RAW here — `*`/`$`
    * wildcard semantics are applied at match time by
    * [[graft.functions.RobotsMatchExpression]]). Comments (`#…`) and
    * blank lines drop; field names match case-insensitively; an empty
    * `Disallow:` value is the spec's "no restriction" no-op and emits
    * no rule. Per-host windows only — a robots body is KB-sized, so
    * the line ladder is bounded per host. */
  /** Shared group walk for robots bodies: split into directive lines,
    * assign each to its user-agent GROUP (a user-agent line after a
    * non-user-agent line starts one; consecutive user-agent lines
    * stack), keeping only `fields`. Per-host windows — bodies are
    * KB-sized. Returns (host, _grp, _f, _v, _ua). */
  private def robotsGroups(
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      fields: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots
      .select(col(hostCol).cast("string").as("host"),
        posexplode(split(col(bodyCol), "\r?\n")).as(Seq("_i", "_raw")))
      .select(col("host"), col("_i"),
        trim(regexp_replace(col("_raw"), "#.*$", "")).as("_l"))
      .where(col("_l") =!= "")
      .select(col("host"), col("_i"),
        lower(trim(regexp_extract(col("_l"), "^([^:]+):", 1))).as("_f"),
        trim(regexp_extract(col("_l"), "^[^:]+:(.*)$", 1)).as("_v"))
      .where(col("_f").isin("user-agent" +: fields: _*))
    val w = Window.partitionBy(col("host")).orderBy(col("_i"))
    lines
      .withColumn("_ua", (col("_f") === "user-agent").cast("int"))
      .withColumn("_start",
        (col("_ua") === 1 &&
          coalesce(lag(col("_ua"), 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("_grp", sum(col("_start")).over(w))
  }

  def robotsRules(
      robots: DataFrame,
      hostCol: String = "host",
      bodyCol: String = "body",
      broadcastMaxHosts: Long = DefaultBroadcastMaxHosts): DataFrame = {
    val grouped = robotsGroups(robots, hostCol, bodyCol,
      Seq("allow", "disallow"))
    val agents = grouped.where(col("_ua") === 1)
      .select(col("host"), col("_grp"), lower(col("_v")).as("agent"))
    val rules = grouped
      .where(col("_ua") === 0 && col("_grp") > 0 && col("_v") =!= "")
      .select(col("host"), col("_grp"), col("_f").as("kind"),
        col("_v").as("path"))
    // SIZE-ADAPTIVE: below the host ceiling both sides are KB×hosts —
    // broadcast so the rule derivation never shuffles at all; above it
    // (tens of millions of hosts) a broadcast would OOM the driver, so
    // hash-join on (host, _grp) — SHUFFLE_HASH, never sort-merge: the
    // per-group sides are small and uniform, a sort buys nothing
    val joined =
      if (atMostRows(robots.select(col(hostCol)), broadcastMaxHosts))
        agents.join(broadcast(rules), Seq("host", "_grp"))
      else
        agents.join(rules.hint("SHUFFLE_HASH"), Seq("host", "_grp"))
    joined.select(col("host"), col("agent"), col("kind"), col("path"))
  }

  /** Apply a [[robotsRules]] table to a URL column: RFC 9309 group
    * selection (a host with a group matching `agent` exactly uses ONLY
    * that group; otherwise the `*` group applies) + most-specific-match
    * rule evaluation — full `*`/`$` pattern semantics
    * ([[graft.functions.RobotsMatchExpression]]), specificity = pattern
    * octet length, with the allow-wins tie (the least-restrictive
    * reading the RFC mandates). URLs whose host carries no
    * applicable rule are allowed — absence of robots restricts
    * nothing. Matching is against the CANONICAL path
    * ([[urlNormalize]]), query and fragment excluded.
    *
    * Shape: the governing rules collapse to ONE array row per host;
    * SIZE-ADAPTIVE delivery to the fact table — below
    * `broadcastMaxHosts` the dim broadcasts (KB/host ⇒ ~100 MB at the
    * default ceiling), above it (a real crawl's tens of millions of
    * hosts = multi-GB, past broadcast comfort) it hash-joins on
    * `host` with the dim as the SHUFFLE_HASH build side — never a
    * sort-merge, and the fact side is shuffled once, never fanned out
    * or re-aggregated. The longest-match evaluation is a map-only
    * higher-order fold over the per-host array; the per-element
    * lambdas are interpreted, but bounded by rules-per-host, not
    * corpus size. Duplicate input rows survive untouched. Appends
    * (canonical_url, host, allowed). */
  def robotsAllowed(
      urls: DataFrame,
      rules: DataFrame,
      agent: String,
      urlCol: String = "url",
      broadcastMaxHosts: Long = DefaultBroadcastMaxHosts,
      smallDim: Option[Boolean] = None): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val appl = rules.where(col("agent").isin(agentLc, "*"))
    val hostHasExact = appl.groupBy(col("host"))
      .agg(max((col("agent") === agentLc).cast("int")).as("_he"))
    // rules-per-host is a small constant (robots bodies are KB-sized),
    // so |rules| tracks |hosts| — one bounded probe sizes both joins.
    // Callers holding the raw robots frame should pre-probe it with
    // [[hostDimIsSmall]] (window-free) and pass `smallDim`; the
    // fallback probe here must execute the rules lineage once
    val small = smallDim.getOrElse(
      atMostRows(rules.select(col("host")), broadcastMaxHosts))
    val perHost = (if (small) appl.join(broadcast(hostHasExact), "host")
                   else appl.join(hostHasExact.hint("SHUFFLE_HASH"), "host"))
      .where((col("agent") === agentLc).cast("int") === col("_he"))
      .groupBy(col("host"))
      .agg(collect_list(struct(col("path"), col("kind"))).as("_rules"))
    val u = urls
      .withColumn("canonical_url", urlNormalize(col(urlCol)))
      .withColumn("host",
        lower(parse_url(col("canonical_url"), lit("HOST"))))
      .withColumn("_upath",
        coalesce(parse_url(col("canonical_url"), lit("PATH")), lit("/")))
    u.join(if (small) broadcast(perHost) else perHost.hint("SHUFFLE_HASH"),
        Seq("host"), "left")
      .withColumn("_w", array_max(transform(
        filter(col("_rules"),
          r => graft.functions.UrlFunctions.robots_match(
            col("_upath"), r.getField("path"))),
        // specificity key: OCTET length (RFC 9309 most-specific-match
        // counts octets; character length under-weights multibyte
        // UTF-8 patterns and can flip an allow/disallow tie)
        r => struct(octet_length(r.getField("path")).as("l"),
          (r.getField("kind") === "allow").cast("int").as("a")))))
      .withColumn("allowed", col("_w").isNull || col("_w.a") === 1)
      .drop("_rules", "_w", "_upath")
  }

  /** `Crawl-delay:` directives (the de-facto politeness record; RFC
    * 9309 §2.2.4 other-records) per user-agent group, value converted
    * seconds → integral milliseconds (fractional values like `0.5`
    * supported; unparseable values drop). Returns
    * (host, agent, delay_ms). */
  def robotsCrawlDelay(
      robots: DataFrame,
      hostCol: String = "host",
      bodyCol: String = "body",
      broadcastMaxHosts: Long = DefaultBroadcastMaxHosts): DataFrame = {
    val grouped = robotsGroups(robots, hostCol, bodyCol, Seq("crawl-delay"))
    val agents = grouped.where(col("_ua") === 1)
      .select(col("host"), col("_grp"), lower(col("_v")).as("agent"))
    val delays = grouped
      .where(col("_ua") === 0 && col("_grp") > 0)
      .select(col("host"), col("_grp"),
        (col("_v").cast("decimal(12,3)") * 1000L).cast("long").as("delay_ms"))
      .where(col("delay_ms").isNotNull && col("delay_ms") >= 0L)
    // same size-adaptive contract as robotsRules: both sides track
    // |hosts|, so an unconditional broadcast is a crawl-scale OOM
    (if (atMostRows(robots.select(col(hostCol)), broadcastMaxHosts))
       agents.join(broadcast(delays), Seq("host", "_grp"))
     else agents.join(delays.hint("SHUFFLE_HASH"), Seq("host", "_grp")))
      .select(col("host"), col("agent"), col("delay_ms"))
  }

  /** PER-HOST fetch schedule honoring crawl-delay — the politeness
    * plan a crawl frontier executes: the i-th URL of a host (0-based,
    * ordered by `idCol` for determinism) gets
    * `fetch_offset_ms = i × delay_ms`, so each host's fetches
    * serialize at its own delay while hosts proceed in parallel.
    * Group selection per RFC 9309: a host with a delay for `agent`
    * exactly uses it; otherwise the `*` group's; hosts with neither
    * get `defaultDelayMs`. Multiple applicable delays take the MAX
    * (the conservative, politest reading).
    *
    * Shape: delay dim delivered size-adaptively (broadcast under the
    * host ceiling, SHUFFLE_HASH above — [[robotsAllowed]]'s contract);
    * the rank is one row_number per host — per-host partitions are the
    * natural parallel unit of a crawl, never a global sort. Appends
    * (canonical_url, host, fetch_seq, fetch_offset_ms). */
  def politenessSchedule(
      urls: DataFrame,
      crawlDelays: DataFrame,
      agent: String,
      urlCol: String = "url",
      idCol: String = "doc_id",
      defaultDelayMs: Long = 1000L,
      broadcastMaxHosts: Long = DefaultBroadcastMaxHosts,
      smallDim: Option[Boolean] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val appl = crawlDelays.where(col("agent").isin(agentLc, "*"))
    val perHost = appl.groupBy(col("host"))
      .agg(
        max(when(col("agent") === agentLc, col("delay_ms"))).as("_de"),
        max(when(col("agent") === "*", col("delay_ms"))).as("_dw"))
      .select(col("host"), coalesce(col("_de"), col("_dw")).as("_delay"))
    val small = smallDim.getOrElse(
      atMostRows(crawlDelays.select(col("host")), broadcastMaxHosts))
    val u = urls
      .withColumn("canonical_url", urlNormalize(col(urlCol)))
      .withColumn("host",
        lower(parse_url(col("canonical_url"), lit("HOST"))))
    u.join(if (small) broadcast(perHost) else perHost.hint("SHUFFLE_HASH"),
        Seq("host"), "left")
      .withColumn("fetch_seq",
        row_number().over(Window.partitionBy(col("host"))
          .orderBy(col(idCol))) - 1)
      .withColumn("fetch_offset_ms",
        col("fetch_seq") * coalesce(col("_delay"), lit(defaultDelayMs)))
      .drop("_delay")
  }

  /** URL PATH-PATTERN mining — the crawler-trap detector: generalize
    * each path by folding long hex runs (≥ 8 chars — session ids,
    * content hashes) to `{h}` and digit runs to `{n}`, then count URLs
    * per (host, pattern). A host where one generated pattern carries
    * most of the URL mass (calendar pages, session-id echoes, infinite
    * facet grids) is a TRAP — its pattern share exceeds
    * `trapSharePpm` with at least `trapMinUrls` URLs, and a frontier
    * should demote it. Returns (host, pattern, n_urls, host_total,
    * share_ppm, trap) — exact integer ppm.
    *
    * Shape: map-only pattern fold + ONE (host, pattern) aggregate +
    * one per-host window over the |patterns|-sized result (orders of
    * magnitude below |URLs|). */
  def urlPatternStats(
      urls: DataFrame,
      urlCol: String = "url",
      trapSharePpm: Long = 500000L,
      trapMinUrls: Long = 100L): DataFrame = {
    require(trapSharePpm > 0 && trapSharePpm <= 1000000L,
      s"urlPatternStats: trapSharePpm=$trapSharePpm")
    import org.apache.spark.sql.expressions.Window
    val host = lower(parse_url(col(urlCol), lit("HOST")))
    val path = coalesce(parse_url(col(urlCol), lit("PATH")), lit("/"))
    // the hex fold must contain at least one LETTER (lookahead pins
    // the >= 8 length) — a bare [0-9a-f]{8,} swallows 8-digit NUMERIC
    // ids into {h}, which the x20 scaled oracle caught on first run
    // (replica ids are >= 8 digits while base-corpus ids are not).
    // Case-insensitive: uppercase/mixed-case session ids
    // (/S/DEADBEEF01234567) must fold too, or case defeats the trap
    // share threshold one distinct id at a time.
    val pattern = regexp_replace(
      regexp_replace(path,
        "(?=[0-9a-fA-F]{8})[0-9a-fA-F]*[a-fA-F][0-9a-fA-F]*", "{h}"),
      "[0-9]+", "{n}")
    val counts = urls
      .select(host.as("host"), pattern.as("pattern"))
      .where(col("host").isNotNull)
      .groupBy("host", "pattern")
      .agg(count(lit(1)).as("n_urls"))
    val w = Window.partitionBy(col("host"))
    counts
      .withColumn("host_total", sum(col("n_urls")).over(w))
      .withColumn("share_ppm",
        expr("n_urls * 1000000 div host_total"))
      .withColumn("trap",
        (col("share_ppm") >= trapSharePpm &&
          col("n_urls") >= trapMinUrls).cast("int"))
  }

  /** `Sitemap:` directives from robots.txt bodies (RFC 9309 §2.2.4
    * allows other records; sitemaps.org specifies this one) — the
    * crawl seed list robots carries. One row per directive:
    * (host, sitemap_url). Map-only line extraction; directives live
    * OUTSIDE user-agent groups, so no group logic applies. */
  def robotsSitemaps(
      robots: DataFrame,
      hostCol: String = "host",
      bodyCol: String = "body"): DataFrame =
    robots
      .select(col(hostCol).cast("string").as("host"),
        explode(split(col(bodyCol), "\r?\n")).as("_raw"))
      .select(col("host"),
        trim(regexp_extract(trim(regexp_replace(col("_raw"), "#.*$", "")),
          "(?i)^sitemap:(.*)$", 1)).as("sitemap_url"))
      .where(col("sitemap_url") =!= "")

  /** Sitemap / sitemap-index XML (sitemaps.org) → one row per entry:
    * (loc, lastmod, changefreq, priority_ppm, is_index). A sitemap is
    * spec-bounded (≤ 50k URLs / 50 MB uncompressed), so per-row
    * regexp block extraction is bounded work — map-only, no shuffle;
    * a 100 TB crawl's sitemap corpus fans out by ROW. `<url>` blocks
    * parse with is_index = false, `<sitemap>` blocks (an index file
    * pointing at child sitemaps) with is_index = true. `loc` is
    * XML-unescaped (the five predefined entities — sitemaps must
    * escape `&` in query strings); `priority` surfaces as integer ppm
    * (cross-engine exact), absent tags as NULL. Input columns pass
    * through. */
  def sitemapUrls(df: DataFrame, bodyCol: String = "body"): DataFrame = {
    def tag(block: Column, t: String): Column =
      nullif(trim(regexp_extract(block,
        s"(?s)<$t[^>]*>(.*?)</$t>", 1)), lit(""))
    def unescapeXml(c: Column): Column = {
      // &amp; LAST so "&amp;lt;" decodes to the literal "&lt;"
      val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&amp;" -> "&")
      steps.foldLeft(c) { case (acc, (from, to)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
      }
    }
    val blocks = concat(
      transform(regexp_extract_all(col(bodyCol),
        lit("(?s)<url>(.*?)</url>"), lit(1)),
        b => struct(b.as("b"), lit(false).as("idx"))),
      transform(regexp_extract_all(col(bodyCol),
        lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1)),
        b => struct(b.as("b"), lit(true).as("idx"))))
    df.withColumn("_e", explode(blocks))
      .select(col("*"),
        unescapeXml(tag(col("_e.b"), "loc")).as("loc"),
        tag(col("_e.b"), "lastmod").as("lastmod"),
        tag(col("_e.b"), "changefreq").as("changefreq"),
        (tag(col("_e.b"), "priority").cast("decimal(8,6)") * 1000000L)
          .cast("long").as("priority_ppm"),
        col("_e.idx").as("is_index"))
      .where(col("loc").isNotNull)
      .drop("_e", bodyCol)
  }

  /** Per-domain crawl accounting over canonical URLs: one row per
    * host — page count, distinct canonical URLs, and the duplicate
    * fraction in ppm (integer; cross-engine exact). The budget view a
    * crawl pipeline reads before sampling domains. */
  def domainStats(df: DataFrame, urlCol: String): DataFrame = {
    val base = df
      .where(col(urlCol).isNotNull)
      .select(urlNormalize(col(urlCol)).as("_cu"))
      .select(lower(parse_url(col("_cu"), lit("HOST"))).as("host"), col("_cu"))
      .where(col("host").isNotNull)
    base
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_pages"),
        countDistinct(col("_cu")).as("n_urls"))
      .withColumn("dup_ppm",
        expr("(n_pages - n_urls) * 1000000 div n_pages"))
  }
}
