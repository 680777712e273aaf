package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All pure
  * Catalyst expressions (no UDFs) so they stay inside whole-stage codegen
  * and scale linearly with a parquet scan — at 100 TB these run as a
  * single map-only stage with full column pruning.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty input → empty array). */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword segmentation: split on word/number/punct boundaries
    * (a deterministic stand-in for a learned tokenizer's pre-tokenizer). */
  def subwordTokens(c: Column): Column = {
    val pretok = regexp_replace(c, "([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])", " $1 ")
    when(length(trim(pretok)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(pretok), "\\s+"))
  }

  /** Fraction of characters matching `charClass` (regex class body). */
  def charClassRatio(c: Column, charClass: String): Column =
    when(length(c) === 0, 0.0).otherwise(
      length(regexp_replace(c, s"[^$charClass]", "")).cast("double") / length(c))

  def punctRatio(c: Column): Column = charClassRatio(c, "\\p{Punct}")
  def digitRatio(c: Column): Column = charClassRatio(c, "0-9")
  def upperRatio(c: Column): Column = charClassRatio(c, "A-Z")

  private val enStop = Seq("the", "and", "of", "to", "in", "is", "a", "for")
  private val esStop = Seq("el", "la", "de", "que", "y", "en", "los", "del")
  private val deStop = Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein")
  private val frStop = Seq("le", "les", "des", "est", "une", "dans", "pour", "que")

  private def stopHits(c: Column, words: Seq[String]): Column =
    size(regexp_extract_all(c, lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Ratio of stopword hits (any language) to token count — a classic
    * natural-language-vs-noise signal. */
  def stopwordRatio(c: Column): Column = {
    val lc = lower(c)
    val hits = stopHits(lc, enStop) + stopHits(lc, esStop) +
      stopHits(lc, deStop) + stopHits(lc, frStop)
    when(tokenCount(c) === 0, 0.0)
      .otherwise(hits.cast("double") / tokenCount(c))
  }

  /** Composite document quality score in [0,1]: length band + punct +
    * digit + stopword signals, the usual pre-training heuristic filter
    * shape. Deterministic and codegen-friendly. */
  def qualityScore(c: Column): Column = {
    val n = tokenCount(c)
    val lengthOk = when(n.between(5, 100000), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(c) < 0.3, 1.0).otherwise(0.0)
    val digitOk = when(digitRatio(c) < 0.3, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(c) > 0.01, 1.0).otherwise(0.0)
    round((lengthOk + punctOk + digitOk + stopOk) / 4.0, 2)
  }

  /** N-gram-heuristic language ID over stopword evidence; deterministic
    * tie-break by declaration order (en, es, de, fr, unknown). */
  def langIdHeuristic(c: Column): Column = {
    val lc = lower(c)
    val en = stopHits(lc, enStop); val es = stopHits(lc, esStop)
    val de = stopHits(lc, deStop); val fr = stopHits(lc, frStop)
    val mx = greatest(en, es, de, fr)
    when(mx === 0, "unknown")
      .when(en === mx, "en")
      .when(es === mx, "es")
      .when(de === mx, "de")
      .otherwise("fr")
  }

  /** Document fingerprint: truncated SHA-256 over whitespace-normalized
    * lowercase text — stable under reflow, oracle-checkable. */
  def fingerprint(c: Column, len: Int = 16): Column =
    substring(sha2(regexp_replace(lower(c), "\\s+", " "), 256), 1, len)

  /** Rolling polynomial hash (Rabin–Karp shape) of the normalized text —
    * the incremental-dedup fingerprint; pure expression via aggregate()
    * over the character codes. */
  def rollingHash(c: Column, base: Long = 1000003L): Column = {
    val norm = regexp_replace(lower(c), "\\s+", " ")
    val codes = transform(sequence(lit(1), length(norm)),
      i => ascii(norm.substr(i, lit(1))).cast("long"))
    aggregate(codes, lit(0L), (acc, x) => acc * lit(base) + x)
  }

  // PII patterns in the Java/RE2-common syntax subset (bounded repeats,
  // ASCII \b, no lookaround) so the DuckDB oracle replays them verbatim.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  private val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def emailCount(c: Column): Column = size(regexp_extract_all(c, lit(emailRe), lit(0)))
  def phoneCount(c: Column): Column = size(regexp_extract_all(c, lit(phoneRe), lit(0)))
  def ipCount(c: Column): Column = size(regexp_extract_all(c, lit(ipRe), lit(0)))

  /** PII scrubbing for training corpora: emails, intl-format phone
    * numbers, and IPv4 literals replaced with typed placeholder tokens.
    * Pure regexp_replace chain — map-only, codegen'd, linear scan at any
    * scale. Email runs first so its digits/dots can't be re-matched as an
    * IP fragment; the placeholders contain no PII-matchable characters. */
  def piiRedact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipRe, "[IP]")

  /** HTML → text extraction — the first transform every web-scraped
    * corpus runs (the trafilatura/jusText step reduced to its portable
    * core): drop script/style payloads and comments, strip tags, decode
    * the six universal entities, collapse whitespace. Pure
    * regexp_replace/replace chain — map-only, codegen'd, linear at any
    * scale — in the Java/RE2-COMMON regex subset (inline (?is) flags,
    * lazy repeats, alternation; no lookaround, no backreferences) so the
    * DuckDB oracle replays the chain verbatim.
    *
    * Decode order is part of the contract: `&amp;` decodes LAST, so
    * `&amp;lt;` yields the literal text `&lt;` (single decode, the
    * HTML-correct reading) instead of `<`. A mismatched
    * `<script>…</style>` pair strips as one block — same on both
    * engines, and a page broken that badly is boilerplate anyway. */
  def htmlText(c: Column): Column = {
    val noBlock = regexp_replace(c,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComment = regexp_replace(noBlock, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTag) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-doc HTML extraction report: cleaned text + size delta. */
  def htmlExtract(
      df: DataFrame,
      idCol: String = "doc_id",
      htmlCol: String = "html"): DataFrame =
    df.select(col(idCol),
      length(col(htmlCol)).cast("long").as("n_raw"),
      htmlText(col(htmlCol)).as("text"))
      .withColumn("n_text", length(col("text")).cast("long"))

  /** MAIN-CONTENT extraction — the jusText/boilerpipe-family upgrade
    * over whole-page tag stripping ([[htmlText]] keeps nav/footer
    * boilerplate; this drops it): the page splits into fragments at
    * block-level tag boundaries, each fragment scores (text length,
    * link-text length), and a fragment survives iff it carries at
    * least `minChars` of text AND its LINK DENSITY (anchor text /
    * total text) stays at or under `maxLinkDensityPct` — navigation,
    * footers and link farms are link-dense by construction, article
    * bodies are not. Script/style/comment blocks strip BEFORE the
    * split (a pair spanning fragments would otherwise leak); the
    * closer is anchored to its opener with a backreference so a
    * `</style>` cannot close a `<script>` block early on hostile
    * pages. This is the public text-density heuristic (Kohlschütter
    * et al. boilerpipe / Pomikálek jusText), not a port of either.
    *
    * Returns (idCol, n_blocks, n_kept, main_text, n_main_chars).
    * Map-only: split + per-fragment regexp — NO shuffle at any
    * scale; cost is linear in HTML bytes. */
  def mainContent(
      df: DataFrame,
      idCol: String = "doc_id",
      htmlCol: String = "html",
      minChars: Int = 20,
      maxLinkDensityPct: Int = 33): DataFrame = {
    require(minChars >= 0, s"mainContent: minChars=$minChars")
    require(maxLinkDensityPct >= 0 && maxLinkDensityPct <= 100,
      s"mainContent: maxLinkDensityPct=$maxLinkDensityPct")
    val noBlockPair = regexp_replace(col(htmlCol),
      "(?is)<(script|style)[^>]*>.*?</\\1\\s*>", " ")
    val clean = regexp_replace(noBlockPair, "(?s)<!--.*?-->", " ")
    val blockTag = "(?i)</?(?:p|div|section|article|main|header|footer|nav|" +
      "aside|table|tr|td|th|ul|ol|li|h[1-6]|blockquote|pre|form|br|hr)\\b[^>]*>"
    val blocks = split(clean, blockTag)
    val scored = transform(blocks, b => {
      val txt = htmlText(b)
      val linkTxt = htmlText(concat_ws(" ",
        regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1))))
      struct(txt.as("txt"), length(txt).as("n"), length(linkTxt).as("nl"))
    })
    // stage the scored array, then the kept array: both feed multiple
    // consumers, and letting CollapseProject inline the per-block
    // regexp work into each reference would multiply the per-row cost
    val staged = df.select(col(idCol), scored.as("_sc"))
    // link-density test in Long: IntegerType lengths × 100 overflow
    // Int past ~21.4M chars, flipping the sign and letting a huge
    // link farm through the density gate
    val kept = filter(col("_sc"), s =>
      s.getField("n") >= minChars &&
        s.getField("nl").cast("long") * 100 <=
          s.getField("n").cast("long") * maxLinkDensityPct)
    staged
      .select(col(idCol), size(col("_sc")).cast("long").as("n_blocks"),
        kept.as("_k"))
      .select(col(idCol), col("n_blocks"),
        size(col("_k")).cast("long").as("n_kept"),
        array_join(transform(col("_k"), s => s.getField("txt")), " ")
          .as("main_text"))
      .withColumn("n_main_chars", length(col("main_text")).cast("long"))
  }

  /** Template fingerprint: truncated SHA-256 over the page's OPENING-
    * tag sequence — pages generated from the same template share it
    * regardless of content, which makes it the blocking key for
    * template-family dedup and boilerplate accounting (same DuckDB-
    * replayable construction as the corpus fingerprints: sha2 hex is
    * engine-portable). */
  def templateFingerprint(c: Column, len: Int = 16): Column =
    substring(sha2(array_join(regexp_extract_all(lower(c),
      lit("(?s)<([a-z][a-z0-9]*)[\\s/>]"), lit(1)), ">"), 256), 1, len)

  /** Template clusters: one row per distinct template fingerprint with
    * the page count and the smallest id as the deterministic exemplar.
    * ONE map-side-combined aggregate keyed by |templates| — orders of
    * magnitude below |pages| on real crawls. */
  def templateClusters(
      df: DataFrame,
      idCol: String = "doc_id",
      htmlCol: String = "html"): DataFrame =
    df.select(col(idCol), templateFingerprint(col(htmlCol)).as("template_fp"))
      .groupBy("template_fp")
      .agg(count(lit(1)).as("n_pages"), min(col(idCol)).as("exemplar_id"))

  /** Per-doc PII profile: match counts (pre-redaction) + redacted text. */
  def piiStats(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    df.select(col(idCol),
      emailCount(c).as("n_emails"),
      phoneCount(c).as("n_phones"),
      ipCount(c).as("n_ips"),
      piiRedact(c).as("redacted"))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020, §2.2): the
    * in-document half of web-corpus curation — drop lines that are too
    * short to be prose, and drop whole pages containing boilerplate /
    * code markers. (The cross-document half — repeated-span removal —
    * is [[Dedup.repeatedSpans]] / [[Dedup.applySpanCuts]].)
    *
    * Rules, all local to one row (map-only, codegen higher-order
    * filters, no shuffle at any scale):
    *  - a line survives iff it has ≥ `minLineWords` whitespace tokens
    *    and (when `requireTerminalPunct`) ends in `.!?"'`;
    *  - the whole doc is dropped iff its lowercase text contains any
    *    `banned` phrase (C4 uses policy/code markers).
    *
    * Returns (idCol, n_lines, n_kept, dropped∈{0,1}, clean_md5) where
    * clean_md5 pins the kept lines rejoined with `\n` (NULL for dropped
    * docs — nothing survives). */
  def c4LineClean(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minLineWords: Int = 3,
      requireTerminalPunct: Boolean = false,
      banned: Seq[String] = Seq("lorem ipsum", "javascript required", "{")): DataFrame = {
    require(banned.nonEmpty, "c4LineClean: banned phrase list must be non-empty")
    val lines = transform(split(col(textCol), "\n"), l => trim(l))
    val keepLine: Column => Column = l => {
      val enough = size(tokens(l)) >= minLineWords
      if (requireTerminalPunct) enough && l.rlike("[.!?\"']$") else enough
    }
    val kept = filter(lines, keepLine)
    val dropped = banned.map(b => lower(col(textCol)).contains(lit(b))).reduce(_ || _)
    docs.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      when(dropped, lit(0L)).otherwise(size(kept).cast("long")).as("n_kept"),
      dropped.cast("int").as("dropped"),
      when(dropped, lit(null).cast("string"))
        .otherwise(md5(array_join(kept, "\n"))).as("clean_md5"))
  }

  /** Whitespace-collapsed lowercase normalization (shingle input). */
  def normText(c: Column): Column = regexp_replace(lower(c), "\\s+", " ")

  /** Character shingles over an ALREADY-MATERIALIZED normalized column.
    * The lambda body must reference a plain attribute: any expression
    * embedded here re-evaluates once PER ELEMENT (an O(L²) regex trap —
    * measured 6× on the sf0.1 bench before hoisting). */
  def charShinglesRaw(norm: Column, n: Int = 3): Column =
    array_distinct(
      when(length(norm) < n, array(norm))
        .otherwise(transform(
          sequence(lit(0), length(norm) - n),
          i => norm.substr(i + lit(1), lit(n)))))

  /** Convenience form for small inputs; prefer materializing
    * [[normText]] with withColumn and calling [[charShinglesRaw]] in
    * anything data-sized. */
  def charShingles(c: Column, n: Int = 3): Column =
    charShinglesRaw(normText(c), n)

  /** Word shingles over an already-materialized token-array column. */
  def wordShinglesRaw(toks: Column, n: Int = 3): Column =
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))

  /** Convenience form; prefer materializing [[tokens]] first at scale. */
  def wordShingles(c: Column, n: Int = 3): Column =
    wordShinglesRaw(tokens(c), n)

  /** documents-table profile: one row per doc with the full signal set.
    * The four per-language stopword scans are materialized ONCE and the
    * derived signals (ratio, quality, lang) read the attributes — the
    * naive composition re-ran 12 regexp_extract_all passes per row. */
  def profile(df: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    val hoisted = df
      .withColumn("_lc", lower(c))
      .withColumn("_en", stopHits(col("_lc"), enStop))
      .withColumn("_es", stopHits(col("_lc"), esStop))
      .withColumn("_de", stopHits(col("_lc"), deStop))
      .withColumn("_fr", stopHits(col("_lc"), frStop))
      .withColumn("_ntok", tokenCount(c))
    val hitsTotal = col("_en") + col("_es") + col("_de") + col("_fr")
    val stopRatio = when(col("_ntok") === 0, 0.0)
      .otherwise(hitsTotal.cast("double") / col("_ntok"))
    val mx = greatest(col("_en"), col("_es"), col("_de"), col("_fr"))
    val lang = when(mx === 0, "unknown")
      .when(col("_en") === mx, "en")
      .when(col("_es") === mx, "es")
      .when(col("_de") === mx, "de")
      .otherwise("fr")
    val st = hoisted.withColumn("_st",
      graft.functions.TextStatsFunctions.text_stats(c))
    def ratio(n: Column): Column =
      when(col("_st.n_chars") === 0, 0.0)
        .otherwise(n.cast("double") / col("_st.n_chars"))
    val qualityFused = round((
      when(col("_ntok").between(5, 100000), 1.0).otherwise(0.0) +
      when(ratio(col("_st.n_punct")) < 0.3, 1.0).otherwise(0.0) +
      when(ratio(col("_st.n_digit")) < 0.3, 1.0).otherwise(0.0) +
      when(stopRatio > 0.01, 1.0).otherwise(0.0)) / 4.0, 2)
    st.select(
      col("doc_id"),
      col("_st.n_chars").as("n_chars"),
      col("_ntok").as("n_tokens"),
      col("_st.n_subwords").as("n_subwords"),
      round(ratio(col("_st.n_punct")), 6).as("punct_ratio"),
      round(ratio(col("_st.n_digit")), 6).as("digit_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      qualityFused.as("quality"),
      lang.as("lang_pred"),
      fingerprint(c).as("fp"))
  }

  /** Intra-document line dedup: keep only the FIRST occurrence of each
    * distinct trimmed line within a document (scraped pages repeat
    * their own headers / menus / pagination blocks; a second copy adds
    * tokens, not information). The cross-document sibling is
    * [[CorpusOps.boilerplateLines]] — that one needs the corpus; this
    * is a pure per-row rewrite: map-only, zero shuffle at any scale.
    *
    * A line at 0-based position `i` survives iff `array_position`
    * (1-based first-occurrence index) says `i` IS the first occurrence.
    * That scan is O(L²) in the LINE count of one document — fine for
    * real pages (hundreds of lines); for pathological million-line rows
    * use the exploded form (posexplode → min(pos) per (doc, line) →
    * reassemble), which trades the quadratic row-local scan for the
    * shuffle this version avoids.
    *
    * Returns (idCol, n_lines, n_kept, clean_md5); clean_md5 pins the
    * kept lines rejoined with `\n`. */
  def dedupLinesWithin(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lines = transform(split(col(textCol), "\n"), l => trim(l))
    docs
      .select(col(idCol), lines.as("_lines"))
      .select(col(idCol), col("_lines"),
        filter(col("_lines"),
          (l, i) => array_position(col("_lines"), l) === (i + lit(1)).cast("long")).as("_kept"))
      .select(
        col(idCol),
        size(col("_lines")).cast("long").as("n_lines"),
        size(col("_kept")).cast("long").as("n_kept"),
        md5(array_join(col("_kept"), "\n")).as("clean_md5"))
  }

  /** FLESCH-STYLE READABILITY, fixed-point and engine-exact: the
    * document-difficulty signal curation pipelines bucket by (simple
    * text for early curriculum, dense text flagged for review) —
    * deterministic counting stand-ins for the classic formula's two
    * linguistic inputs, both replayable as the same regex on any
    * RE2/Java-common engine.
    *
    * Counts per doc: words = whitespace tokens; sentences = runs of
    * `[.!?]+` (floored at 1 — headline-style docs have no terminator);
    * syllable groups = vowel runs `[aeiouy]+` of the lowercased text
    * (the standard heuristic syllable proxy). Score in MILLI-points,
    * integral division only:
    * `flesch_milli = 206835 − (1015·W) div S − (84600·Y) div W`
    * (Flesch's 206.835 − 1.015·W/S − 84.6·Y/W, ×1000). Each division
    * has positive operands; the result may be negative (dense legalese
    * goes below zero in real Flesch too). Docs with zero words emit
    * nothing (no degenerate division, mirrors the tokens() contract).
    *
    * Map-only: two regexp scans + the token split per row, no shuffle
    * at all — at 100 TB this is the parquet scan's cost.
    *
    * Returns (idCol, n_words, n_sentences, n_syllable_groups,
    * flesch_milli). */
  def readability(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    docs
      .select(col(idCol),
        tokenCount(col(textCol)).cast("long").as("n_words"),
        greatest(size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)")), lit(1))
          .cast("long").as("n_sentences"),
        size(expr(s"regexp_extract_all(lower($textCol), '[aeiouy]+', 0)"))
          .cast("long").as("n_syllable_groups"))
      .where(col("n_words") > 0L)
      .withColumn("flesch_milli",
        lit(206835L) - expr("1015 * n_words div n_sentences") -
          expr("84600 * n_syllable_groups div n_words"))
  }

  /** GOPHER QUALITY RULES (Rae et al. 2021, arXiv:2112.11446 §A1.1) —
    * the composite document filter the individual screens here feed
    * into, reported as per-rule booleans plus the overall verdict so a
    * curation run can see WHICH rule kills a document (the paper's
    * thresholds, integer-exact — every ratio test is cross-multiplied,
    * no division anywhere):
    *   1. 50 ≤ words ≤ 100,000
    *   2. mean word length in [3, 10]    (3n ≤ Σlen ≤ 10n)
    *   3. symbol-to-word ratio < 0.1     ('#' chars + '…'/'...' runs)
    *   4. ≤ 10% of lines start with a bullet (-, *, •)
    *   5. ≥ 80% of words contain an alphabetic character
    *   6. ≥ 2 DISTINCT stop words of {the, be, to, of, and, that,
    *      have, with} (the paper's list; distinct-count reading)
    * Empty docs fail 1 (and the strict ratio tests), vacuously pass 2.
    *
    * Map-only — at 100 TB this is the scan; compose with
    * [[CorpusOps.budgetSelect]] or a plain filter on `gopher_pass`.
    * Returns (idCol, n_words, rule booleans ×6, gopher_pass). */
  def gopherRules(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    docs
      .withColumn("_toks", tokens(col(textCol)))
      .withColumn("_lines", split(col(textCol), "\n"))
      .select(col(idCol),
        size(col("_toks")).cast("long").as("n_words"),
        length(regexp_replace(col(textCol), "\\s", "")).cast("long").as("_wchars"),
        (length(col(textCol)) -
          length(regexp_replace(col(textCol), "#", ""))).cast("long").as("_hashes"),
        size(regexp_extract_all(col(textCol), lit("\\.\\.\\.|…"), lit(0)))
          .cast("long").as("_ellipses"),
        size(col("_lines")).cast("long").as("_nlines"),
        size(filter(col("_lines"), l => trim(l).rlike("^[-*•]")))
          .cast("long").as("_bullets"),
        size(filter(col("_toks"), t => t.rlike("[A-Za-z]")))
          .cast("long").as("_alphaw"),
        size(array_intersect(
          array_distinct(transform(col("_toks"), t => lower(t))),
          array(stops.map(lit): _*))).cast("long").as("_stophits"))
      .select(col(idCol), col("n_words"),
        (col("n_words") >= 50L && col("n_words") <= 100000L).as("word_count_ok"),
        (lit(3L) * col("n_words") <= col("_wchars") &&
          col("_wchars") <= lit(10L) * col("n_words")).as("mean_word_len_ok"),
        (lit(10L) * (col("_hashes") + col("_ellipses")) < col("n_words"))
          .as("symbol_ratio_ok"),
        (lit(10L) * col("_bullets") <= col("_nlines")).as("bullet_lines_ok"),
        (lit(10L) * col("_alphaw") >= lit(8L) * col("n_words")).as("alpha_words_ok"),
        (col("_stophits") >= 2L).as("stop_words_ok"))
      .withColumn("gopher_pass",
        col("word_count_ok") && col("mean_word_len_ok") && col("symbol_ratio_ok") &&
          col("bullet_lines_ok") && col("alpha_words_ok") && col("stop_words_ok"))
  }

  /** GOPHER PASS-RATE MATRIX per source — [[gopherRules]] rolled up to
    * the curation dashboard: which SOURCE fails which rule, and at what
    * rate? The table that decides whether a source gets fixed upstream
    * or dropped. One doc-keyed join of the rule flags back onto the
    * source column, one source-bounded aggregate; every rate an
    * integral ppm. Returns (source, n_docs, word_count_ppm,
    * mean_word_len_ppm, symbol_ratio_ppm, bullet_lines_ppm,
    * alpha_words_ppm, stop_words_ppm, pass_ppm), source-ordered. */
  def gopherBySource(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val flags = gopherRules(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(sourceCol).as("source")), Seq(idCol))
    val ruleCols = Seq("word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
      "bullet_lines_ok", "alpha_words_ok", "stop_words_ok", "gopher_pass")
    val aggs = count(lit(1)).as("n_docs") +:
      ruleCols.map(c => sum(when(col(c), 1L).otherwise(0L)).as(s"_$c"))
    val named = Seq("word_count_ppm", "mean_word_len_ppm", "symbol_ratio_ppm",
      "bullet_lines_ppm", "alpha_words_ppm", "stop_words_ppm", "pass_ppm")
    flags.groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("source") +: col("n_docs") +:
        ruleCols.zip(named).map { case (c, n) =>
          expr(s"CAST(_$c * 1000000 div n_docs AS BIGINT)").as(n)
        }: _*)
      .orderBy("source")
  }

  /** MIXED-LANGUAGE SCREEN — per document, the share of lines whose
    * detected language disagrees with the document's majority language:
    * scraped pages glue navigation/boilerplate in one language onto
    * body text in another, and a line-level disagreement share is the
    * standard CCNet-style purity signal a doc-level langid misses
    * entirely. Lines where [[langIdHeuristic]] says `unknown` (no
    * stopword evidence — numbers, code, short fragments) vote for
    * nobody and are excluded from numerator AND denominator.
    *
    * Majority = most detected lines, ties to the alphabetically first
    * language (deterministic). Share is integral ppm. Shape: one line
    * explode, one (doc, lang) partial agg, a doc-keyed majority window
    * over the ≤ 5-langs-per-doc table. Only documents with ≥ 1
    * detected line appear. Returns (idCol, n_lines, n_detected,
    * majority_lang, n_disagree, mixed_ppm), id-ordered. */
  def mixedLanguage(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = docs.select(col(idCol),
      explode(split(col(textCol), "\n")).as("_line"))
    val total = lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
    val det = lines
      .withColumn("_lg", langIdHeuristic(col("_line")))
      .where(col("_lg") =!= "unknown")
      .groupBy(col(idCol), col("_lg")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_c").desc, col("_lg").asc)
    val agg = det
      .withColumn("_rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_detected"),
        max(when(col("_rn") === 1, col("_lg"))).as("majority_lang"),
        max(when(col("_rn") === 1, col("_c"))).as("_mc"))
    agg.join(total, Seq(idCol))
      .select(col(idCol), col("n_lines"), col("n_detected"),
        col("majority_lang"),
        (col("n_detected") - col("_mc")).as("n_disagree"),
        expr("CAST((n_detected - _mc) * 1000000 div n_detected AS BIGINT)")
          .as("mixed_ppm"))
      .orderBy(idCol)
  }
}
