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
