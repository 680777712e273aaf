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
        // text rides as payload — ids are unique so it never compares
        min(struct((lit(0L) - coalesce(col("_q"), lit(Long.MinValue)))
          .as("nq"), col("_id").as("id"), col("_text").as("text")))
          .as("_w"))
      .select(col("canonical_url"), col("_w.id").as("record_id"),
        col("_w.text").as("text"), col("n_dups"))
  }

  /** Parse robots.txt bodies into a (host, agent, kind, path) rule
    * table — the crawl-politeness side of the URL front door
    * (RFC 9309 Robots Exclusion Protocol, the DOCUMENTED SUBSET:
    * user-agent groups with consecutive `User-agent` lines sharing one
    * group, `Allow`/`Disallow` PREFIX rules; `*`/`$` path wildcards
    * are not interpreted — a path containing them simply prefix-
    * matches literally, the conservative reading for a filter that
    * gates what we keep, not what we fetch). Comments (`#…`) and
    * blank lines drop; field names match case-insensitively; an empty
    * `Disallow:` value is the spec's "no restriction" no-op and emits
    * no rule. Per-host windows only — a robots body is KB-sized, so
    * the line ladder is bounded per host. */
  def robotsRules(
      robots: DataFrame,
      hostCol: String = "host",
      bodyCol: String = "body"): DataFrame = {
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
      .where(col("_f").isin("user-agent", "allow", "disallow"))
    // a user-agent line following a non-user-agent line STARTS a group;
    // consecutive user-agent lines stack onto the same group
    val w = Window.partitionBy(col("host")).orderBy(col("_i"))
    val grouped = lines
      .withColumn("_ua", (col("_f") === "user-agent").cast("int"))
      .withColumn("_start",
        (col("_ua") === 1 &&
          coalesce(lag(col("_ua"), 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("_grp", sum(col("_start")).over(w))
    val agents = grouped.where(col("_ua") === 1)
      .select(col("host"), col("_grp"), lower(col("_v")).as("agent"))
    val rules = grouped
      .where(col("_ua") === 0 && col("_grp") > 0 && col("_v") =!= "")
      .select(col("host"), col("_grp"), col("_f").as("kind"),
        col("_v").as("path"))
    // both sides are robots-body-sized (KB/host) — broadcast so the
    // rule derivation never sorts or range-shuffles
    agents.join(broadcast(rules), Seq("host", "_grp"))
      .select(col("host"), col("agent"), col("kind"), col("path"))
  }

  /** Apply a [[robotsRules]] table to a URL column: RFC 9309 group
    * selection (a host with a group matching `agent` exactly uses ONLY
    * that group; otherwise the `*` group applies) + longest-PREFIX-
    * match rule evaluation with the allow-wins tie (the least-
    * restrictive reading the RFC mandates). URLs whose host carries no
    * applicable rule are allowed — absence of robots restricts
    * nothing. Matching is against the CANONICAL path
    * ([[urlNormalize]]), query and fragment excluded.
    *
    * Shape: the governing rules collapse to ONE array row per host and
    * broadcast (robots bodies are KB-sized — millions of hosts is
    * still a broadcast-sized dim next to a crawl fact table); the
    * longest-match evaluation is a map-only higher-order fold over the
    * per-host array, so the fact table never fans out, never
    * re-aggregates, and duplicate input rows survive untouched. The
    * per-element lambdas are interpreted, but bounded by
    * rules-per-host, not corpus size. Appends
    * (canonical_url, host, allowed). */
  def robotsAllowed(
      urls: DataFrame,
      rules: DataFrame,
      agent: String,
      urlCol: String = "url"): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val appl = rules.where(col("agent").isin(agentLc, "*"))
    val hostHasExact = appl.groupBy(col("host"))
      .agg(max((col("agent") === agentLc).cast("int")).as("_he"))
    val perHost = appl.join(broadcast(hostHasExact), "host")
      .where((col("agent") === agentLc).cast("int") === col("_he"))
      .groupBy(col("host"))
      .agg(collect_list(struct(col("path"), col("kind"))).as("_rules"))
    val u = urls
      .withColumn("canonical_url", urlNormalize(col(urlCol)))
      .withColumn("host",
        lower(parse_url(col("canonical_url"), lit("HOST"))))
      .withColumn("_upath",
        coalesce(parse_url(col("canonical_url"), lit("PATH")), lit("/")))
    u.join(broadcast(perHost), Seq("host"), "left")
      .withColumn("_w", array_max(transform(
        filter(col("_rules"),
          r => col("_upath").startsWith(r.getField("path"))),
        r => struct(length(r.getField("path")).as("l"),
          (r.getField("kind") === "allow").cast("int").as("a")))))
      .withColumn("allowed", col("_w").isNull || col("_w.a") === 1)
      .drop("_rules", "_w", "_upath")
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
