package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * content-addressed split assignment and length-distribution profiling
  * (the inputs to quality-cutoff decisions). Pure expressions / partial
  * aggregations — map-only or one-shuffle at any scale.
  */
object CorpusOps {

  /** Deterministic train/val/test assignment from the CONTENT fingerprint
    * (first hex nibble of the whitespace-normalized SHA-256): 14/16
    * train, 1/16 val, 1/16 test. Content addressing means byte-identical
    * duplicates always land in the same split — composed after near-dup
    * removal it prevents eval leakage; and the split is stable across
    * reshuffles, repartitions, and reruns (no RNG, no row order). */
  def contentSplit(textCol: Column, valNibble: String = "e", testNibble: String = "f"): Column = {
    val nib = TextAnalysis.fingerprint(textCol, 1) // already the first hex char

    when(nib === valNibble, "val")
      .when(nib === testNibble, "test")
      .otherwise("train")
  }

  def withSplit(df: DataFrame, textCol: String = "text", outCol: String = "split"): DataFrame =
    df.withColumn(outCol, contentSplit(col(textCol)))

  /** Fixed-size token-window chunking with stride — the pretraining
    * context-window splitter: chunk `i` of a document covers tokens
    * `[i·stride, i·stride + chunkSize)`, so consecutive chunks overlap by
    * `chunkSize − stride` tokens. Map-only at any scale: tokenize, a
    * generated per-doc chunk-index sequence, and an array slice — the
    * only row growth is the ~len/stride output chunks (never
    * corpus-token rows), and no shuffle at all. Chunk content is pinned
    * by an md5 of the space-joined tokens (hex, engine-portable).
    * Token-less docs (empty/whitespace/NULL text) emit no chunks.
    * Returns (idCol, chunk_id, chunk_len, chunk_md5). */
  def chunkTokens(
      docs: DataFrame,
      chunkSize: Int,
      stride: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val chunk = slice(col("_toks"),
      (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize))
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .where(size(col("_toks")) > 0)
      // last chunk start = the largest multiple of stride < len
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0L),
          expr(s"(size(_toks) - 1) div $stride"))).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        size(chunk).cast("long").as("chunk_len"),
        md5(concat_ws(" ", chunk)).as("chunk_md5"))
  }

  /** Global vocabulary top-k: most frequent lowercase whitespace tokens.
    * Explode → partial-agg count (map-side combine keeps the shuffle at
    * |vocab|, not |corpus tokens|) → TakeOrderedAndProject. Deterministic
    * tie-break on the token itself. */
  def vocabTopK(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** VOCABULARY TAIL MASS — what share of the corpus's TOKENS sit in
    * types rarer than k? The tokenizer-coverage forecast: tail mass at
    * the planned vocab floor is exactly the text a subword model will
    * shatter into bytes. One vocab count pass; per-k ladders are CASE
    * sums over the vocab-sized table (the corpus is never re-read).
    * Returns (min_count, n_rare_types, tail_tokens, tail_ppm),
    * ladder-ordered. */
  def vocabTailMass(
      docs: DataFrame,
      ks: Seq[Long] = Seq(2L, 5L, 10L),
      textCol: String = "text"): DataFrame = {
    require(ks.nonEmpty, "vocabTailMass: need at least one k")
    val vocab = docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ks.sorted.map { k =>
      vocab.agg(
        sum(when(col("_c") < k, 1L).otherwise(0L)).as("n_rare_types"),
        sum(when(col("_c") < k, col("_c")).otherwise(0L)).as("tail_tokens"),
        sum(col("_c")).as("_tot"))
        .select(lit(k).as("min_count"), col("n_rare_types"), col("tail_tokens"),
          expr("CAST(tail_tokens * 1000000 div _tot AS BIGINT)").as("tail_ppm"))
    }.reduce(_ unionByName _)
  }

  /** WATER-FILLING BUDGET ALLOCATION — the uniform-mix optimizer: given
    * a total token budget, give every source an equal share, letting
    * small sources keep only what they have and redistributing their
    * slack to the rest (the classic water level). The closed form over
    * the availability-sorted source table: a source is SATURATED iff
    * its availability fits under the level computed as if every smaller
    * source were saturated — `avail_i·(m_i) ≤ B − prefix_{i−1}` with
    * m_i the sources from i on (saturation is prefix-monotone on the
    * sorted order, the standard water-filling fact); unsaturated
    * sources split the residue by integral division with the
    * largest-remainder top-up going to the FIRST `rem` of them in
    * source order (the p210 deterministic tie rule).
    *
    * Everything after the one token-count pass is source-cardinality
    * bounded; all integers. If the budget exceeds total availability
    * every source keeps its full supply (allocation never invents
    * tokens). Returns (source, available_tokens, allocated_tokens),
    * source-ordered; Σ allocated = min(budget, Σ available). */
  def waterfillBudget(
      docs: DataFrame,
      budgetTokens: Long,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 0, s"waterfillBudget: need budget >= 0, got $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val avail = docs
      .select(col(sourceCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("_t"))
      .groupBy("source").agg(sum(col("_t")).as("available_tokens"))
    // |sources|-bounded ladder (post-aggregate, not corpus rows)
    val wOrd = Window.orderBy(col("available_tokens"), col("source"))
    val wAll = Window.partitionBy()
    val ranked = avail
      .withColumn("_i", row_number().over(wOrd))
      .withColumn("_pre", coalesce(sum(col("available_tokens")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_k", count(lit(1)).over(wAll))
      // saturated ⇔ avail·(k−i+1) ≤ B − prefix(i−1), integer compare
      .withColumn("_sat",
        col("available_tokens") * (col("_k") - col("_i") + 1) <=
          lit(budgetTokens) - col("_pre"))
    val unsat = ranked
      .withColumn("_satSum",
        coalesce(sum(when(col("_sat"), col("available_tokens"))).over(wAll), lit(0L)))
      .withColumn("_m",
        sum(when(!col("_sat"), 1L).otherwise(0L)).over(wAll))
      .withColumn("_resid", lit(budgetTokens) - col("_satSum"))
      .withColumn("_lvl", expr("CAST(CASE WHEN _m = 0 THEN 0 ELSE _resid div _m END AS BIGINT)"))
      .withColumn("_rem", expr("CAST(CASE WHEN _m = 0 THEN 0 ELSE _resid - _lvl * _m END AS BIGINT)"))
      // largest-remainder top-up: the first _rem unsaturated sources in
      // SOURCE order get +1
      .withColumn("_urk", row_number().over(
        Window.partitionBy(col("_sat")).orderBy(col("source"))))
    unsat.select(col("source"), col("available_tokens"),
        when(col("_sat"), col("available_tokens"))
          .otherwise(col("_lvl") +
            when(col("_urk") <= col("_rem"), 1L).otherwise(0L))
          .as("allocated_tokens"))
      .orderBy("source")
  }

  /** DISTINCTIVE TERMS per source — the contrastive "what is IN this
    * source" table a corpus card prints next to volumes: for each
    * source, the terms whose in-source rate most exceeds their rate in
    * the REST of the corpus. Pure count ratios, no libm:
    * `lift_ppm = c_s·(N−n_s)·10⁶ div ((c_t−c_s+1)·n_s)` — occurrences
    * in-source over occurrences elsewhere, each normalized by its
    * token volume, +1 on the complement count (a term appearing ONLY
    * here would otherwise divide by zero; the +1 is the declared
    * smoothing, biasing exclusive terms down slightly rather than to
    * infinity). Terms need `minCount` in-source occurrences.
    *
    * Shape: ONE token-count pass (vocab×sources partial agg), totals
    * broadcast back, top-`k` per source via one window over the
    * filtered vocab table. Returns (source, term, n_in_source,
    * n_elsewhere, lift_ppm, rank), source/rank-ordered. */
  def distinctiveTerms(
      docs: DataFrame,
      k: Int = 10,
      minCount: Long = 5L,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"distinctiveTerms: need k >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .where(col("term") =!= "")
    val bySrc = toks.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("n_in_source"))
    val srcTot = bySrc.groupBy(col("source")).agg(sum(col("n_in_source")).as("_ns"))
    val byTerm = bySrc.groupBy(col("term")).agg(sum(col("n_in_source")).as("_ct"))
    val nTot = srcTot.agg(sum(col("_ns")).as("_N"))
    val scored = bySrc
      .where(col("n_in_source") >= minCount)
      .join(broadcast(srcTot), Seq("source"))
      .join(byTerm, Seq("term"))
      .crossJoin(broadcast(nTot))
      .withColumn("n_elsewhere", col("_ct") - col("n_in_source"))
      .withColumn("lift_ppm", expr(
        "CAST(CAST(n_in_source AS DECIMAL(38,0)) * (_N - _ns) * 1000000 " +
          "div (CAST(n_elsewhere + 1 AS DECIMAL(38,0)) * _ns) AS BIGINT)"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("lift_ppm").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("source", "term", "n_in_source", "n_elsewhere", "lift_ppm", "rank")
      .orderBy("source", "rank")
  }

  /** TOKEN COLLOCATION EDGES — undirected (min, max)-keyed word pairs
    * co-occurring within ±`window` positions ≥ `minCount` times
    * corpus-wide, with tokens above the `dfCeiling` occurrence cap
    * dropped BEFORE pairing: the stop-gram relief valve (standard
    * collocation practice — a stopword hub adds O(df²) pairs and no
    * signal; this is what keeps the downstream graph ops' complexity
    * bounds honest instead of hub-degenerate). The edge substrate for
    * [[graft.ops.Graph]] (PageRank, triangles, k-core, link
    * prediction) over text corpora.
    *
    * Shape: one posexplode scan, a token-keyed semi-join against the
    * (vocab-sized) ceiling survivors, a doc-keyed positional band
    * self-join (never all-pairs — the band is ±window), one partial-agg
    * count. Returns (src, dst) with src < dst. */
  def collocationEdges(
      docs: DataFrame,
      window: Int = 2,
      minCount: Long = 5L,
      dfCeiling: Long = 10000L,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(window >= 1, s"collocationEdges: need window >= 1, got $window")
    val raw = docs.select(col(idCol).as("_doc"),
      posexplode(TextAnalysis.tokens(lower(col(textCol)))).as(Seq("_p", "_t")))
    val keep = raw.groupBy("_t").agg(count(lit(1)).as("_c"))
      .where(col("_c") <= dfCeiling).select("_t")
    val toks = raw.join(keep, Seq("_t"), "left_semi")
    toks.as("x")
      .join(toks.as("y"),
        col("x._doc") === col("y._doc") &&
          col("y._p") > col("x._p") && col("y._p") <= col("x._p") + window)
      .select(least(col("x._t"), col("y._t")).as("src"),
        greatest(col("x._t"), col("y._t")).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("_n"))
      .where(col("_n") >= minCount)
      .select("src", "dst")
  }

  /** NEGATIVE-SAMPLING TABLE (word2vec/Mikolov): per-token sampling
    * weight ∝ count^(3/4), the unigram flattening every embedding
    * trainer bakes in — EXACT, no libm pow: c^(3/4) = ⌊⁴√c³⌋ computed
    * as isqrt(isqrt(c³)) with the [[graft.ops.Stats.neymanAllocation]]
    * guess+correct recipe at each of the two square roots (IEEE sqrt
    * is correctly rounded on every engine; ±1 integer correction makes
    * the floor exact even past 2⁵³).
    *
    * Shape: explode → map-combined vocab count (shuffle ∝ |vocab|);
    * the ⁴√ is map-only arithmetic on the vocab table; Σw rides a
    * 1-row broadcast; the top-`k` cut is TakeOrdered; the cumulative
    * CDF column is a window over the k-bounded result. Returns
    * (token, n, w34, cum_w34, cum_ppm) — cum_ppm is the sampling CDF
    * numerator ·10⁶ div the FULL-vocab Σw (so the table honestly shows
    * how much probability mass the top-k holds), ordered
    * (n desc, token). */
  def negativeSamplingTable(
      docs: DataFrame,
      k: Int = 50,
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"negativeSamplingTable: need k >= 1, got $k")
    val vocab = docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
    val weighted = vocab
      .selectExpr("token", "n",
        "CAST(n AS DECIMAL(38,0)) * n * n AS _c3")
      .selectExpr("token", "n", "_c3",
        "CAST(floor(sqrt(CAST(_c3 AS DOUBLE))) AS BIGINT) AS _g1")
      .selectExpr("token", "n",
        "CASE WHEN CAST(_g1 + 1 AS DECIMAL(38,0)) * (_g1 + 1) <= _c3 THEN _g1 + 1 " +
          "WHEN CAST(_g1 AS DECIMAL(38,0)) * _g1 > _c3 THEN _g1 - 1 " +
          "ELSE _g1 END AS _r1")
      .selectExpr("token", "n", "_r1",
        "CAST(floor(sqrt(CAST(_r1 AS DOUBLE))) AS BIGINT) AS _g2")
      .selectExpr("token", "n",
        "CASE WHEN (_g2 + 1) * (_g2 + 1) <= _r1 THEN _g2 + 1 " +
          "WHEN _g2 * _g2 > _r1 THEN _g2 - 1 " +
          "ELSE _g2 END AS w34")
    val total = weighted.agg(
      sum(col("w34").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("_tw"))
    val top = weighted
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    top.crossJoin(broadcast(total))
      .withColumn("cum_w34", sum(col("w34")).over(w))
      .selectExpr("token", "n", "CAST(w34 AS BIGINT) AS w34",
        "CAST(cum_w34 AS BIGINT) AS cum_w34",
        "CAST(CAST(cum_w34 AS DECIMAL(38,0)) * 1000000 div _tw AS BIGINT) AS cum_ppm")
  }

  /** BM25 retrieval: rank documents against a (small, constant) query
    * string — Lucene-style idf = ln(1 + (N−df+0.5)/(df+0.5)), k1/b term
    * saturation and length normalization. Shape at 100 TB: tokens are
    * FILTERED to the query's terms before the (doc, term) aggregation,
    * so the tf shuffle is ∝ matching postings, never the corpus token
    * count; per-term df and the two corpus scalars (N, total length)
    * ride the same filtered aggregates; top-k is TakeOrderedAndProject
    * (no global sort). The double-valued score is used only to ORDER —
    * emitted columns are integers, so results are engine-portable (exact
    * ties, e.g. duplicate docs, break on doc_id).
    *
    * Returns top-`k` rows: (rank, doc_id, n_terms = distinct query terms
    * present, total_tf = summed occurrences). */
  def bm25TopK(
      docs: DataFrame,
      query: String,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val queryTerms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(queryTerms.nonEmpty, "query must contain at least one term")
    // ONE map-only pass builds (doc, len, tf per query term) straight off
    // the token array — no explode (corpus-token-count row blowup), no
    // (doc, term) aggregation shuffle, and crucially no data-sized
    // lens ⋈ tf join (the old shape sort-merge-joined two corpus-sized
    // sides). Per-term count = size(toks) − size(array_remove(toks, t)):
    // both collection expressions are whole-stage-codegen'd, unlike a
    // higher-order filter(λ) whose per-element lambda stays interpreted.
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      (size(col("_toks")) - size(array_remove(col("_toks"), lit(t))))
        .cast("long").as(s"_tf$i")
    }
    val perDoc = docs
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("_toks"))
      .select(col(idCol) +: size(col("_toks")).cast("long").as("_len") +: tfCols: _*)
    // corpus scalars + per-term document frequency in ONE tiny aggregate
    // (driver-bounded: 2 + #terms longs). df as a driver literal keeps
    // the per-doc score ONE fixed-order expression (a float
    // sum(termScore) aggregate would sum in data order; permuted
    // duplicate docs then differ in the last ulp and cross-engine ranks
    // flip — with literals, equal ingredients give bit-equal scores).
    val statAggs = count(lit(1)).as("_n") +: sum(col("_len")).as("_slen") +:
      queryTerms.indices.map(i =>
        sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i"))
    val st = perDoc.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val nDocs = st.getLong(0)
    require(nDocs > 0, "bm25TopK: corpus is empty — nothing to rank")
    val sumLen = st.getLong(1) // non-null: nDocs > 0 and _len is never null
    val avgLen = sumLen.toDouble / nDocs
    val dfByIdx = queryTerms.indices.map(i => st.getLong(2 + i))
    def idf(df: Long): Double =
      math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    val termScores = queryTerms.zipWithIndex.map { case (_, i) =>
      val tfc = col(s"_tf$i").cast("double")
      when(col(s"_tf$i") > 0,
        lit(idf(dfByIdx(i))) * (tfc * lit(k1 + 1.0)) /
          (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * col("_len") / lit(avgLen))))
        .otherwise(lit(0.0))
    }
    val nTerms = queryTerms.indices
      .map(i => when(col(s"_tf$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    val totalTf = queryTerms.indices.map(i => col(s"_tf$i")).reduce(_ + _)
    perDoc
      .where(totalTf > 0) // only docs containing ≥1 query term are ranked
      .withColumn("_score", termScores.reduce(_ + _)) // fixed left-to-right order
      .withColumn("n_terms", nTerms)
      .withColumn("total_tf", totalTf)
      .orderBy(col("_score").desc, col(idCol).asc).limit(k)
      // rank over the ≤ k surviving rows only — the global window here is
      // bounded by construction, never data-sized
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("_score").desc, col(idCol).asc)))
      .select(col("rank"), col(idCol), col("n_terms"), col("total_tf"))
  }

  /** Per-document top term: highest term frequency, ties broken by rarer
    * corpus document frequency, then alphabetically — INTEGER-only
    * ranking (a float tf·idf score invites cross-engine argmax flips; df
    * as tiebreak keeps the idf intent without the hazard). Two shuffles:
    * (doc, term) counts and the term→df join. */
  def topTermPerDoc(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .where(col("token") =!= "")
    val tf = terms.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(dfreq, Seq("token"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col(idCol), col("token").as("top_term"), col("tf"), col("df"))
  }

  /** Per-group quota sampling, RNG-FREE: keep at most `quota` docs per
    * group, picked by content-fingerprint order (SHA-256 is uniform, so
    * ordering by it IS a uniform pseudo-random draw — but deterministic,
    * reproducible across reruns/reshuffles, and content-addressed like
    * [[contentSplit]]). The domain-balancing cap every web-scale corpus
    * applies before training. One shuffle on the group key; groups larger
    * than a partition rely on the window sort spill — for pathological
    * single-domain skew compose with the salted-join/top-k pattern. */
  /** `salts > 1` adds a two-phase pre-prune for pathological single-group
    * skew: rank within (group, salt) first and keep each bucket's local
    * top-`quota` — a provable superset of the global top-`quota` (any
    * globally-kept row is within its bucket's first `quota` in the same
    * order) — so the final per-group window sorts ≤ salts·quota rows per
    * group instead of the whole group. Result is identical (spec-pinned). */
  def quotaSample(
      docs: DataFrame,
      quota: Int,
      groupCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      salts: Int = 1): DataFrame = {
    val withFp = docs.withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
    val pruned =
      if (salts <= 1) withFp
      else {
        val wLocal = org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol), pmod(xxhash64(col("_fp"), col(idCol)), lit(salts)))
          .orderBy(col("_fp"), col(idCol))
        withFp.withColumn("_lr", row_number().over(wLocal))
          .where(col("_lr") <= quota)
          .drop("_lr")
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("_fp"), col(idCol)) // id tiebreak: total order even on dup content
    pruned
      .withColumn("pick_rank", row_number().over(w))
      .where(col("pick_rank") <= quota)
      .select(col(idCol), col(groupCol), col("pick_rank"))
  }

  /** Temperature-rebalanced source sampling — the multilingual/mixture
    * rule (mT5, XLM-R, LLaMA data recipes): sample source `s`
    * proportionally to `n_s^α` with α = 1/2, flattening the source
    * distribution so head domains stop drowning the tail. Everything is
    * INTEGER-EXACT and engine-portable:
    *
    *  - `n_s^(1/2)` = integer sqrt: `floor(sqrt(double))` then a ±1
    *    correction against the exact square — right even if libm sqrt
    *    rounds the wrong way at a boundary;
    *  - the total budget `T = ⌊N/budgetDenom⌋` is apportioned by
    *    LARGEST REMAINDER (floor shares, then +1 to the biggest
    *    `T·w_s mod W` remainders, source-ascending tie-break) — exact
    *    integer arithmetic, Σ quotas = T always;
    *  - each source's picks are its content-fingerprint-smallest docs
    *    ([[quotaSample]]'s RNG-free draw), capped at `n_s` (a tail
    *    source whose boosted share exceeds its size contributes all it
    *    has; epoch-style with-replacement repeat is [[mixSources]]'
    *    job).
    *
    * Scale shape: quotas live on a #sources-row table (the one global
    * window there is bounded by construction); the corpus pays one
    * fingerprint map pass and one partition-by-source rank. */
  def temperatureSample(
      docs: DataFrame,
      budgetDenom: Int = 2,
      groupCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budgetDenom > 0, "temperatureSample: budgetDenom must be positive")
    val s = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val w0 = floor(sqrt(col("_n").cast("double"))).cast("long")
    val sw = s.withColumn("_w",
      w0 + when((w0 + 1) * (w0 + 1) <= col("_n"), 1L).otherwise(0L)
        - when(w0 * w0 > col("_n"), 1L).otherwise(0L))
    val g = sw.agg(sum("_w").as("_wt"),
      expr(s"sum(_n) div $budgetDenom").as("_t"))
    val q0 = sw.crossJoin(broadcast(g))
      .withColumn("_base", expr("_t * _w div _wt"))
      .withColumn("_rem", expr("(_t * _w) % _wt"))
    // bounded global window: one row per source
    val byRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("_rem").desc, col(groupCol).asc)
    val quotas = q0
      .withColumn("_extras", col("_t") - sum("_base").over(
        org.apache.spark.sql.expressions.Window
          .rowsBetween(Long.MinValue, Long.MaxValue)))
      .withColumn("_quota", least(
        col("_base") + when(row_number().over(byRem) <= col("_extras"), 1L)
          .otherwise(0L),
        col("_n")))
      .select(col(groupCol), col("_quota"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("_fp"), col(idCol))
    docs
      .withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("rk", row_number().over(rankW).cast("long"))
      .join(broadcast(quotas), Seq(groupCol))
      .where(col("rk") <= col("_quota"))
      .select(col(idCol), col(groupCol), col("rk"))
  }

  /** NEYMAN-ALLOCATION stratified sampling (Neyman 1934) — the
    * variance-optimal survey design: stratum h gets n_h ∝ N_h·σ_h of
    * the `totalN` budget, so high-variance strata are oversampled and
    * homogeneous ones barely touched — the minimum-variance estimator
    * of the population mean under a fixed budget, and the principled
    * upgrade of proportional allocation for eval-set construction.
    *
    * Deterministic end to end: per-stratum σ is the round-6 sample sd
    * off exact DECIMAL micro moments (the [[graft.ops.Stats.cohensD]]
    * recipe); the weight is the floored micro integer ⌊N_h·σ_h·10⁶⌋;
    * the budget splits by floored shares + LARGEST-REMAINDER
    * apportionment (the [[temperatureSample]] recipe — ties broken by
    * stratum label), each quota capped at the stratum size; rows are
    * picked in (sha-256-of-id, id) order — RNG-free, reshuffle-stable,
    * replayable on any engine. Singleton strata (sd undefined) carry
    * weight 0 and can only be reached by remainder crumbs. If NO
    * stratum has measurable variance the allocation is undefined —
    * raises in-plan (use proportional/[[quotaSample]] instead).
    *
    * Shape: one stratum-keyed moment agg (bounded table), the
    * apportionment on |strata|-bounded windows, one per-stratum rank
    * window for the pick. Empty input → empty output.
    *
    * Returns (idCol, stratumCol, rk) — the sampled rows with their
    * within-stratum pick rank. */
  def neymanSample(
      df: DataFrame,
      stratumCol: String,
      valueCol: String,
      idCol: String,
      totalN: Long): DataFrame = {
    require(totalN > 0, s"neymanSample: totalN must be positive, got $totalN")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val rows = df.where(col(valueCol).isNotNull && col(stratumCol).isNotNull)
    val m = rows
      .select(col(stratumCol).cast("string").as("_h"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long")
          .as("_v"))
      .groupBy(col("_h"))
      .agg(count(lit(1)).as("_n"),
        sum(col("_v").cast(d38)).cast(d38).as("_s"),
        sum((col("_v").cast(d38) * col("_v")).cast(d38)).cast(d38).as("_q"))
      .withColumn("_var",
        when(col("_n") < 2L, lit(null).cast("double")).otherwise(
          round(expr("CAST(_q * _n - _s * _s AS DOUBLE)") /
            (col("_n").cast("double") * (col("_n") - 1L) * lit(1.0e12d)), 6)
            + lit(0.0d)))
      .withColumn("_sd",
        when(col("_var").isNull, lit(0.0d))
          .otherwise(round(sqrt(col("_var")), 6) + lit(0.0d)))
      .withColumn("_w",
        floor(col("_n").cast("double") * col("_sd") * lit(1000000.0d))
          .cast("long"))
    val g = m.agg(sum("_w").as("_wt"), sum("_n").as("_nn"))
    val q0 = m.crossJoin(broadcast(g))
      .withColumn("_wt",
        when(col("_wt") <= 0L, raise_error(lit(
          "neymanSample: no stratum has measurable variance — Neyman " +
            "allocation undefined; use proportional allocation")))
          .otherwise(col("_wt")))
      .withColumn("_t", least(lit(totalN), col("_nn")))
      .withColumn("_base", expr("_t * _w div _wt"))
      .withColumn("_rem", expr("(_t * _w) % _wt"))
    val byRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("_rem").desc, col("_h").asc)
    val quotas = q0
      .withColumn("_extras", col("_t") - sum("_base").over(
        org.apache.spark.sql.expressions.Window
          .rowsBetween(Long.MinValue, Long.MaxValue)))
      .withColumn("_quota", least(
        col("_base") + when(row_number().over(byRem) <= col("_extras"), 1L)
          .otherwise(0L),
        col("_n")))
      .select(col("_h").as(stratumCol), col("_quota"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("_fp"), col(idCol))
    rows
      .withColumn(stratumCol, col(stratumCol).cast("string"))
      .withColumn("_fp",
        substring(sha2(col(idCol).cast("string"), 256), 1, 16))
      .withColumn("rk", row_number().over(rankW).cast("long"))
      .join(broadcast(quotas), Seq(stratumCol))
      .where(col("rk") <= col("_quota"))
      .select(col(idCol), col(stratumCol), col("rk"))
  }

  /** Source-weighted mixing (domain up/down-sampling): emit ⌊w⌋ copies
    * of every doc from a source with weight w, plus one more decided by
    * a DETERMINISTIC content-hash draw with probability frac(w) — the
    * epoch-mix every pretraining run applies ("wiki ×2.5, web ×0.5").
    * The draw compares the first 8 hex chars of the content fingerprint
    * against a fixed-width hex threshold (lexicographic = numeric for
    * fixed-width lowercase hex), so the expansion is RNG-free,
    * reshuffle-stable, and exactly reproducible on any engine. Map-only:
    * a literal CASE tree per source plus one explode — no shuffle at all
    * until whatever consumes the mix. */
  def mixSources(
      docs: DataFrame,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      groupCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0.0),
      "weights must be non-negative")
    def hexThreshold(w: Double): String =
      f"${math.floor((w - math.floor(w)) * math.pow(16, 8)).toLong}%08x"
    val base = weights.foldLeft(lit(math.floor(defaultWeight).toInt)) {
      case (acc, (s, w)) =>
        when(col(groupCol) === s, lit(math.floor(w).toInt)).otherwise(acc)
    }
    val th = weights.foldLeft(lit(hexThreshold(defaultWeight))) {
      case (acc, (s, w)) => when(col(groupCol) === s, lit(hexThreshold(w))).otherwise(acc)
    }
    val fp8 = substring(TextAnalysis.fingerprint(col(textCol)), 1, 8)
    docs
      .withColumn("_n", base + when(fp8 < th, 1).otherwise(0))
      .where(col("_n") > 0)
      .select(col(idCol), col(groupCol),
        explode(sequence(lit(1), col("_n"))).as("copy"))
  }

  /** LEAKAGE-SAFE split: like [[contentSplit]], but near-duplicate docs
    * land in the same split — otherwise a train doc's near-copy sits in
    * test and inflates eval. Composition: connected components over the
    * near-dup pairs pick a canonical representative per cluster, every
    * member inherits the REPRESENTATIVE's content split, singletons keep
    * their own. The components join is on doc id (slim), the split needs
    * only the representative's fingerprint — one broadcast-size join per
    * cluster member at realistic dup rates. */
  def leakageSafeSplit(
      docs: DataFrame,
      nearDupPairs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      outCol: String = "split"): DataFrame = {
    val comps = Dedup.connectedComponents(nearDupPairs)
      .withColumnRenamed("id", idCol)
    val withComp = docs.join(comps, Seq(idCol), "left")
    // representative = min cluster member PRESENT IN docs (the component
    // min itself may have been quality-filtered away upstream — falling
    // back to per-member splits there would scatter the cluster, which
    // is exactly the leakage this op exists to prevent)
    val reps = withComp.where(col("component").isNotNull)
      .groupBy("component").agg(min(col(idCol)).as("_rep_id"))
    val repSplit = reps.join(
        docs.select(col(idCol).as("_rep_id"),
          contentSplit(col(textCol)).as("_rep_split")),
        Seq("_rep_id"))
      .select(col("component"), col("_rep_split"))
    withComp
      .join(repSplit, Seq("component"), "left")
      .withColumn(outCol,
        coalesce(col("_rep_split"), contentSplit(col(textCol))))
      .drop("component", "_rep_split")
  }

  /** Benchmark decontamination: flag corpus docs sharing ≥1 word n-gram
    * with any benchmark/eval doc (the standard pre-training hygiene pass —
    * eval text must not leak into training data). The benchmark gram set
    * is tiny next to the corpus, so it is BROADCAST and the corpus side
    * never shuffles its text: the only shuffle is the per-doc hit
    * aggregation on (doc, gram) matches. Emits contamination evidence —
    * distinct shared grams and distinct benchmark docs hit — so the caller
    * can threshold or anti-join the flagged ids away. */
  def contamination(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3): DataFrame = {
    def grams(df: DataFrame, as: String): DataFrame = df
      .withColumn("_toks", TextAnalysis.tokens(lower(col(textCol))))
      .select(col(idCol).as(as),
        explode(TextAnalysis.wordShinglesRaw(col("_toks"), n)).as("g"))
      .where(col("g") =!= "")
    grams(corpus, idCol)
      .join(broadcast(grams(bench, "bench_id")), Seq("g"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }

  /** Gopher-style repetition signals per document, INTEGER-valued (the
    * published filters threshold fractions like top-2-gram/total; emitting
    * the numerator/denominator counts keeps the gate float-free —
    * `top_token_n / n_tokens` is the fraction). Explode → two-level
    * aggregation: the (doc, term) shuffle gets map-side partial
    * aggregation, and the second agg collapses to one row per doc — at
    * 100 TB this is the same shape as word-count, the canonical scalable
    * job. Docs with no tokens are excluded (no denominator). */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("_t"))
      .where(size(col("_t")) > 0)
    // non-distinct word bigrams (repetition signal needs multiplicity);
    // native kernel — the higher-order transform form is interpreted per
    // element (measured ~3× slower at sf0.1)
    val grams = toks.select(col(idCol), col("_t"),
      graft.functions.ShingleFunctions.word_ngrams(col("_t"), 2).as("_g"))
    val tf = grams.select(col(idCol), explode(col("_t")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("n"))
    val tokStats = tf.groupBy(col(idCol)).agg(
      sum("n").as("n_tokens"),
      count(lit(1)).as("n_distinct_tokens"),
      max("n").as("top_token_n"))
    val gf = grams.select(col(idCol), explode(col("_g")).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("n"))
    val gramStats = gf.groupBy(col(idCol)).agg(
      sum("n").as("n_bigrams"),
      count(lit(1)).as("n_distinct_bigrams"),
      max("n").as("top_bigram_n"))
    tokStats.join(gramStats, Seq(idCol), "left")
      .na.fill(0L, Seq("n_bigrams", "n_distinct_bigrams", "top_bigram_n"))
  }

  /** Decile (or any-quantile) bucket assignment WITHOUT a global sort:
    * `ntile` needs a total order (single-partition window at scale);
    * instead the cut points are EXACT interpolated percentiles computed
    * by the [[graft.ops.RankLadder]] recipe — token counts collapse to
    * a length-span-bounded (value → count) table, ranks come from a
    * running sum over that bounded table only, and the bracketing order
    * statistics fall out of conditional-min folds, bit-identical to
    * Spark's `Percentile` without its corpus-sized value buffer (the
    * 100 TB OOM class). The 1-row cut table stays IN-PLAN via
    * `crossJoin(broadcast)` — fully lazy, no Spark job fires at
    * DataFrame construction — and binning is a map-only comparison
    * ladder. bucket = 1 + #cuts ≤ value, so ties go to the upper bucket
    * deterministically on any engine. */
  def lengthDeciles(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    import org.apache.spark.sql.expressions.Window
    val withN = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("double").as("n_tokens"))
    val qs = (1 until buckets).map(_.toDouble / buckets)
    val counts = withN
      .where(col("n_tokens").isNotNull)
      .groupBy(col("n_tokens").as("_v")).agg(count(lit(1)).as("_c"))
    val ranked = counts // distinct-token-count-bounded ladder (winsorize contract)
      .withColumn("_cum", sum(col("_c")).over(Window.orderBy(col("_v"))))
      .withColumn("_n", sum(col("_c")).over(
        Window.orderBy(col("_v"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val aggCols = qs.zipWithIndex.flatMap { case (p, i) =>
      graft.ops.RankLadder.cumFolds(p, s"q$i") }
    val cuts = ranked.agg(aggCols.head, aggCols.tail: _*)
      .select(qs.indices.map(i =>
        graft.ops.RankLadder.blend(s"q$i").as(s"_cut$i")): _*)
    val bucket = qs.indices.foldLeft(lit(1)) { (acc, i) =>
      acc + when(col("n_tokens") >= col(s"_cut$i"), 1).otherwise(0)
    }
    withN.crossJoin(broadcast(cuts))
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        bucket.as("decile"))
  }

  /** Heavy hitters via the [[graft.functions.MisraGriesAgg]] native
    * aggregate: at most `capacity` counters per partition, mergeable
    * partials, ONE pass — the bounded-memory companion to the exact
    * [[vocabTopK]] (which shuffles the full vocabulary). Counts are
    * exact whenever the live vocabulary fits `capacity`; otherwise they
    * are lower bounds within n/(capacity+1) (standard MG guarantee). */
  def heavyHitters(
      docs: DataFrame,
      capacity: Int,
      k: Int,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val toks = docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
      .where(col("t") =!= "")
    toks
      .agg(toCol(graft.functions.MisraGriesAgg(toExpr(col("t")), capacity)
        .toAggregateExpression()).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e")("token").as("token"), col("e")("cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
  }

  /** Cross-document n-gram novelty: per document, how many of its
    * DISTINCT word n-grams appear in at least one OTHER document —
    * near 0 novelty flags boilerplate/templated text that doc-level
    * near-dedup misses (the doc as a whole is unique, every phrase in
    * it is not). Complements [[Dedup.repeatedSpans]]: this is the
    * cheap corpus-wide score, that is the span-precise cut list.
    *
    * Sub-n-token docs fall back to their whole text as a single gram
    * (the p47 convention), so every document gets a score. Because the
    * per-doc gram sets are DISTINCT, a gram's document frequency is
    * exactly its row count in the exploded stream — one gram-keyed
    * aggregate, one gram-keyed join back, one per-doc aggregate; all
    * counts integer, the ratio one double division of exact small ints.
    * Returns (idCol, n_grams, n_shared, novelty = 1 − shared/total). */
  def ngramNovelty(
      docs: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n > 0, "ngramNovelty: n must be positive")
    val grams = docs
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("_t"))
      .select(col(idCol),
        when(size(col("_t")) < n, array(concat_ws(" ", col("_t"))))
          .otherwise(graft.functions.ShingleFunctions.word_shingles(col("_t"), n))
          .as("_gs"))
    val e = grams.select(col(idCol), explode(col("_gs")).as("g"))
    val df = e.groupBy("g").agg(count(lit(1)).as("_dfg"))
    e.join(df, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_dfg") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("novelty",
        (col("n_grams") - col("n_shared")).cast("double") /
          col("n_grams").cast("double"))
  }

  /** Count-Min sketch scorecard: build a [[graft.functions.CountMinAgg]]
    * frequency sketch over the token stream, then audit its point
    * estimates against exact counts for the `probeK` most frequent
    * tokens. Emits per probe token `(token, exact_cnt, ok_lower,
    * ok_upper)`: `ok_lower` = the estimate never undercounts (a CMS
    * structural guarantee — must ALWAYS be 1), `ok_upper` = the
    * overcount stays within 8·N/width (comfortably inside the e·N/width
    * Markov bound at depth 4; checked as the integer cross-product
    * `(est − exact)·width ≤ 8·N`, division-free). N is read back from
    * the sketch itself (row-0 sum) — no second corpus pass.
    *
    * Same self-certifying gate shape as the HLL/quantile scorecards
    * (p49/p50): the bound is asserted in-query; the oracle re-derives
    * the exact counts and pins the flags at 1. Scale: the sketch is
    * depth·width longs per partition regardless of corpus size; the
    * exact side is the vocab-sized aggregate the sketch exists to
    * replace — affordable here because the probe list is tiny, and the
    * audit's point is precisely to compare the two. */
  def cmsTokenScorecard(
      docs: DataFrame,
      depth: Int = 4,
      width: Int = 2048,
      probeK: Int = 20,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val toks = docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
      .where(col("t") =!= "")
    val sk = toks.agg(toCol(graft.functions.CountMinAgg(toExpr(col("t")), depth, width)
      .toAggregateExpression()).as("sk"))
    val exact = toks.groupBy("t").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("t").asc).limit(probeK)
    exact.crossJoin(broadcast(sk))
      .withColumn("_n",
        aggregate(slice(col("sk"), 1, width), lit(0L), (a, x) => a + x))
      .withColumn("_est", toCol(graft.functions.CmsEstimateExpression(
        toExpr(col("sk")), toExpr(col("t")), depth, width)))
      .select(col("t").as("token"), col("exact_cnt"),
        (col("_est") >= col("exact_cnt")).cast("int").as("ok_lower"),
        ((col("_est") - col("exact_cnt")) * lit(width.toLong) <= lit(8L) * col("_n"))
          .cast("int").as("ok_upper"))
  }

  /** CCNet-style LM quality score, INTEGER-EXACT: per-document mean
    * bigram surprisal in whole bits under an add-one-smoothed bigram
    * model trained on the corpus itself. Per bigram instance the
    * surprisal is `⌊log₂((c₁+V)/(c₁₂+1))⌋` — computed with pure integer
    * arithmetic (binary bit lengths + one shift-compare), so per-doc
    * sums are order-independent and bit-identical on any engine; no
    * libm log whose last-ulp rounding could differ across runtimes.
    * (c₁₂ = corpus count of the bigram, c₁ = count of its left context,
    * V = corpus vocabulary size.)
    *
    * Scale shape: tokenize + pair map-only; the model is ONE partial
    * aggregate at |bigram vocab| (map-side combined, never corpus-token
    * rows); scoring is two equi-joins on bounded model keys + one
    * per-doc aggregate. High avg_bits ⇒ improbable text (noise/garble),
    * low ⇒ repetitive boilerplate — the standard perplexity-filter
    * signal, coarse-grained to whole bits for exactness.
    * Docs with < 2 tokens emit no row. */
  def bigramSurprisal(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val base = docs.select(col(idCol), toks.as("_t")).where(size(col("_t")) >= 2)
    // consecutive pairs: zip the array with itself shifted by one
    val pairs = base.select(col(idCol),
      explode(zip_with(
        slice(col("_t"), lit(1), size(col("_t")) - 1),
        slice(col("_t"), lit(2), size(col("_t")) - 1),
        (a, b) => struct(a.as("l"), concat_ws("\u0001", a, b).as("bg"))))
        .as("_p"))
      .select(col(idCol), col("_p.l").as("l"), col("_p.bg").as("bg"))

    // The model is PERSISTED (vocab-sized — the one cache this op
    // keeps): three consumers need it (left-context sums, the vocabulary
    // size, and the per-bigram bit table), and Catalyst materializes
    // each subplan independently — uncached that is three full corpus
    // tokenize+aggregate passes. Cached, the corpus is read exactly
    // twice: once to build the model, once for the final instance join.
    val model = pairs.groupBy("bg").agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lefts = model
      .groupBy(substring_index(col("bg"), "\u0001", 1).as("l"))
      .agg(sum("c12").as("c1"))
    // V = distinct tokens across the model's bigram slots — vocab-sized
    // work off the cache. (Identical to the corpus unigram vocabulary
    // except for docs with exactly ONE token, which contribute no bigram
    // and no longer vote for V — the model's own training vocabulary is
    // the cleaner add-V smoothing set anyway.)
    // Rides the plan as a 1-row broadcast instead of a
    // construction-time .first() action: same arithmetic, one fewer
    // eager Spark job per call.
    val vTot = model.select(explode(array(
        substring_index(col("bg"), "\u0001", 1),
        substring_index(col("bg"), "\u0001", -1))).as("_tok"))
      .agg(countDistinct(col("_tok")).as("_v"))

    // ⌊log₂(a/b)⌋ for ints 1 ≤ b ≤ a: bit-length gap, minus one when the
    // shifted divisor overshoots — exact, overflow-free (a ≤ tokens+V).
    // The surprisal depends only on the BIGRAM, so fold it into the
    // vocab-sized model first (model ⋈ lefts is vocab ⋈ vocab) and join
    // the corpus-sized instance stream ONCE — instance rows take one
    // shuffle on bg plus the per-doc aggregate, instead of back-to-back
    // bg- and l-keyed shuffles with the bit math run per instance.
    val bgBits = model
      .withColumn("l", substring_index(col("bg"), "\u0001", 1))
      .join(lefts, Seq("l"))
      .crossJoin(broadcast(vTot))
      .withColumn("_a", col("c1") + col("_v"))
      .withColumn("_b", col("c12") + lit(1L))
      .withColumn("_k0", (length(bin(col("_a"))) - length(bin(col("_b")))).cast("int"))
      .withColumn("_bits",
        when(col("_a") < expr("shiftleft(_b, _k0)"), col("_k0") - 1)
          .otherwise(col("_k0")).cast("long"))
      .select("bg", "_bits")
    pairs.select(col(idCol), col("bg"))
      // explicit: the vocab-sized bits table is ALWAYS the build side.
      // Left to estimates, Spark has broadcast the corpus-sized instance
      // stream here (the file-based size guess undercounts the explode,
      // while the cached model's stats are unknown at planning time).
      .join(broadcast(bgBits), Seq("bg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("_bits").as("bits"))
      .withColumn("avg_bits",
        col("bits").cast("double") / col("n_bigrams").cast("double"))
  }

  /** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    * score each document by how much likelier its tokens are under a
    * TARGET domain's unigram distribution than under the RAW corpus
    * distribution — the importance weight used to resample a raw crawl
    * toward a target domain before pretraining. Positive bits = "looks
    * like the target"; the selection step is a plain ORDER BY / quota
    * on `avg_bits`.
    *
    * Integer-exact and engine-portable: the per-token log-likelihood
    * ratio log₂(p̂_t(w)/p̂_r(w)) under add-one smoothing is scored in
    * WHOLE BITS as
    *   (bitlen(c_t+1) + bitlen(N_r+V)) − (bitlen(c_r+1) + bitlen(N_t+V))
    * — each term an exact ⌊log₂⌋+1 via integer bit length, SUMMED
    * rather than multiplied, so nothing overflows at any corpus size
    * (the pairwise products would pass 2⁶³ on a 100 TB corpus). DSIR is
    * itself an estimator; whole-bit resolution keeps the ranking
    * deterministic across engines, which is what a reproducible
    * curation run needs.
    *
    * Features are the paper's n-grams — unigrams AND adjacent bigrams
    * (exact strings here; the paper hashes them only to bound feature-
    * table memory, and the hash would be the same one-line `xxhash64 %
    * 2²⁰` on both count tables if the vocab ever outgrew an executor).
    *
    * Scale shape: both count tables are feature-vocab-sized; the
    * per-feature bits fold into that table once, and the corpus-sized
    * instance stream shuffles ONCE on feature (broadcast the bits table
    * when the vocab is bounded) plus the per-doc aggregate. The three
    * scalars (N_t, N_r, V) are 1-row broadcast folds off the
    * vocab-sized aggregate — same envelope as [[bigramSurprisal]]'s V. */
  def dsirWeights(
      docs: DataFrame,
      targetSource: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val base = docs.select(col(idCol), col(srcCol), toks.as("_t"))
    // unigrams ++ adjacent bigrams, one explode over the concatenation
    val feats = concat(
      col("_t"),
      zip_with(
        slice(col("_t"), lit(1), greatest(size(col("_t")) - 1, lit(0))),
        slice(col("_t"), lit(2), greatest(size(col("_t")) - 1, lit(0))),
        (a, b) => concat_ws("\u0001", a, b)))
    // the tokenize+explode stream feeds FOUR consumers (raw counts,
    // target counts, their totals, and the final per-doc join) —
    // unpersisted, the plan materialized the explode four times per
    // run; persisted, one pass (MEMORY_AND_DISK: eviction degrades to
    // recompute). The harness reaps persists between queries; library
    // callers should clearCache()/unpersist after their action.
    val inst = base.select(col(idCol), col(srcCol), explode(feats).as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = inst.groupBy("f").agg(count(lit(1)).as("_cr"))
    val tgt = inst.where(col(srcCol) === targetSource)
      .groupBy("f").agg(count(lit(1)).as("_ct"))

    // corpus totals ride the plan as 1-row broadcasts instead of two
    // construction-time .first() actions — same arithmetic, two fewer
    // eager Spark jobs per call, and the smoothing terms stay exact
    // (nR + vSize and nT + vSize computed per row from the folded
    // aggregates).
    val rawTot = raw.agg(coalesce(sum("_cr"), lit(0L)).as("_nR"),
      count(lit(1)).as("_vs"))
    val tgtTot = tgt.agg(coalesce(sum("_ct"), lit(0L)).as("_nT"))

    def bitlen(c: Column): Column = length(bin(c)).cast("long")
    val bits = raw.join(tgt, Seq("f"), "left")
      .crossJoin(broadcast(rawTot))
      .crossJoin(broadcast(tgtTot))
      .withColumn("_bits",
        bitlen(coalesce(col("_ct"), lit(0L)) + 1L) + bitlen(col("_nR") + col("_vs")) -
          bitlen(col("_cr") + 1L) - bitlen(col("_nT") + col("_vs")))
      .select("f", "_bits")
    // Explicit broadcast: the bits table is vocab-bounded by construction
    // (one row per distinct feature), and the corpus-sized instance
    // stream's join key is a unigram — "the" is a massively hot key, so a
    // shuffled join would be skew-bound at 100 TB. Broadcasting removes
    // the shuffle AND the skew question in one move.
    inst.select(col(idCol), col("f"))
      .join(broadcast(bits), Seq("f"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum("_bits").as("bits"))
      .withColumn("avg_bits",
        col("bits").cast("double") / col("n_feats").cast("double"))
  }

  /** Per-source corpus DATASHEET — the "data card" summary a curation
    * run publishes (Datasheets for Datasets): document and token
    * volumes, language diversity, near-duplicate participation, and the
    * token-length envelope, one row per source. Composes the near-dup
    * pair list a dedup pass already produced. All-integer output
    * (counts, floor'd median) — engine-portable with no float in the
    * hash. One pass over docs + a broadcast-sized join of dup doc ids;
    * the per-source median is an EXACT interpolated percentile via the
    * [[graft.ops.RankLadder]] recipe (per-source (length → count)
    * partial agg, running-sum ranks over that bounded table,
    * conditional-min folds) — no `percentile` value buffer anywhere, so
    * a corpus-sized source can't OOM the aggregate at 100 TB. The
    * source-bounded median table broadcast-joins back (null-safe, so a
    * NULL source group keeps its median like the aggregate would). */
  def datasheet(
      docs: DataFrame,
      nearDupPairs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source",
      langCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dupIds = nearDupPairs
      .select(explode(array(col("a"), col("b"))).as(idCol)).distinct()
      .withColumn("_dup", lit(1L))
    val withNt = docs
      .withColumn("_nt", TextAnalysis.tokenCount(col(textCol)).cast("long"))
    val counts = withNt
      .where(col("_nt").isNotNull)
      .groupBy(col(sourceCol), col("_nt").cast("double").as("_v"))
      .agg(count(lit(1)).as("_c"))
    val ranked = counts
      .withColumn("_cum", sum(col("_c")).over(
        Window.partitionBy(col(sourceCol)).orderBy(col("_v"))))
      .withColumn("_n", sum(col("_c")).over(
        Window.partitionBy(col(sourceCol))))
    val medFolds = graft.ops.RankLadder.cumFolds(0.5, "M")
    val medians = ranked.groupBy(col(sourceCol))
      .agg(medFolds.head, medFolds.tail: _*)
      .select(col(sourceCol).as("_src50"),
        floor(graft.ops.RankLadder.blend("M")).cast("long").as("p50_tokens"))
    withNt
      .join(dupIds, Seq(idCol), "left")
      .groupBy(sourceCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("n_tokens"),
        countDistinct(col(langCol)).as("n_langs"),
        sum(when(col("_dup").isNotNull, 1L).otherwise(0L)).as("n_dup_docs"),
        max(col("_nt")).as("max_tokens"))
      .join(broadcast(medians), col(sourceCol) <=> col("_src50"), "left")
      .select(col(sourceCol), col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_dup_docs"), col("p50_tokens"), col("max_tokens"))
  }

  /** INTEGER-EXACT TF-IDF keyword extraction: the top-`k` terms per
    * document ranked by `tf · ⌊log₂(N/df)⌋` — document tagging /
    * topic-feature extraction for curation, deterministic and
    * engine-portable end to end. The idf is coarse-grained to whole
    * bits with the same binary-bit-length construction as
    * [[bigramSurprisal]] (no libm log whose last ulp could reorder
    * ranks across engines), the score is a plain integer product, and
    * ties break on the term string — so ranks are total and replayable
    * anywhere.
    *
    * Scale shape: tokenize+explode map-only; (doc, term, tf) is one
    * partial-agg shuffle (map-side combine collapses within-doc
    * repeats); df folds off that aggregate at vocab size; N is a scalar;
    * the idf join keys on the term at vocab size; top-k is one
    * per-document window over each doc's DISTINCT terms (bounded by doc
    * length, never corpus-wide). Stopword-heavy terms self-suppress:
    * df = N ⇒ idf_bits = 0 ⇒ score 0.
    * Returns (idCol, rank, term, tf, idf_bits). */
  def tfidfKeywords(
      docs: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"tfidfKeywords: k must be positive, got $k")
    // tf is MAP-ONLY: a doc's tokens live in one row, so its term
    // histogram never needs the corpus-wide groupBy(doc, term) shuffle —
    // the term_counts kernel folds it in place and explode emits the
    // (doc, term, tf) stream pre-grouped. The only corpus-sized shuffle
    // left is the per-doc top-k window; df is a vocab-sized partial
    // aggregate and idf rides back in a BROADCAST (vocab tables fit —
    // and if one ever didn't, this join is the line to flip to shuffle).
    val tf = docs
      .select(col(idCol), explode(graft.functions.ShingleFunctions.term_counts(
        TextAnalysis.tokens(lower(col(textCol))))).as("_e"))
      .select(col(idCol), col("_e")("term").as("term"), col("_e")("tf").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N = docs contributing terms — a map-only count, no distinct shuffle
    val nRow = docs
      .where(size(TextAnalysis.tokens(lower(col(textCol)))) > 0).count()
    val idf = df
      .withColumn("_k0", (length(bin(lit(nRow))) - length(bin(col("df")))).cast("int"))
      .withColumn("idf_bits",
        when(lit(nRow) < expr("shiftleft(df, _k0)"), col("_k0") - 1)
          .otherwise(col("_k0")).cast("long"))
      .select("term", "idf_bits")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy((col("tf") * col("idf_bits")).desc, col("term").asc)
    tf.join(broadcast(idf), Seq("term"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("idf_bits"))
  }

  /** Equal-width histogram over a numeric column: two tiny passes (one
    * scalar min/max aggregate collected to the driver — the imputation
    * precedent — then a map-only bin assignment + partial-agg count).
    * `bin = min(floor((v − lo)/width), bins−1)` so `hi` lands in the last
    * bucket; all bucket arithmetic is IEEE double over exact integer
    * inputs, bit-identical on any engine. Empty input → empty result. */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins > 0, "histogram: bins must be positive")
    val v = col(valueCol).cast("double")
    val row = df.agg(min(v).as("lo"), max(v).as("hi")).first()
    val out =
      if (row.isNullAt(0)) df.limit(0).select(lit(0L).as("bin"), lit(0L).as("n"))
      else {
        val lo = row.getDouble(0)
        val width = (row.getDouble(1) - lo) / bins
        val bin =
          if (width == 0) lit(0L)
          else least(floor((v - lit(lo)) / lit(width)).cast("long"), lit(bins - 1L))
        df.groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
      }
    out.orderBy("bin")
  }

  /** Per-group top-k rows by a score column, id-ascending tie-break —
    * the "best k docs per source" shape. One hash shuffle on the group
    * key; the window sorts within each group only (never a global
    * order). For pathological giant groups, `salts > 1` adds the same
    * two-phase pre-prune as [[quotaSample]]: a salted local top-k first,
    * so the final per-group sort sees ≤ salts·k rows. */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      k: Int,
      idCol: String = "doc_id",
      salts: Int = 1): DataFrame = {
    require(k > 0, "topKPerGroup: k must be positive")
    val gs = groupCols.map(col)
    val pruned =
      if (salts <= 1) df
      else {
        val wLocal = org.apache.spark.sql.expressions.Window
          .partitionBy(gs :+ pmod(xxhash64(col(idCol)), lit(salts)): _*)
          .orderBy(col(scoreCol).desc, col(idCol).asc)
        df.withColumn("_lr", row_number().over(wLocal))
          .where(col("_lr") <= k)
          .drop("_lr")
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    pruned.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** Weighted sampling WITHOUT RNG: sequential Poisson sampling
    * (Ohlsson) — per-row priority ξ = u/w where u is a 44-bit integer
    * drawn from the content fingerprint and w > 0 the weight; the n
    * smallest ξ form an approximate probability-proportional-to-size
    * sample. Deterministic, reshuffle-stable, and engine-portable: ξ is
    * ONE double division of exact integers (IEEE-identical everywhere —
    * no pow/log whose libm rounding could differ across engines).
    * Global top-n = TakeOrdered (per-partition heads, never a full
    * sort). Non-positive or NULL weights raise. */
  def weightedSample(
      docs: DataFrame,
      n: Int,
      weightCol: String,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n > 0, "weightedSample: n must be positive")
    val u = conv(substring(TextAnalysis.fingerprint(col(textCol), 16), 1, 11), 16, 10)
      .cast("long")
    val w = col(weightCol).cast("double")
    // NULL text would make ξ NULL, and NULL ordering diverges across
    // engines (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST) — raise
    val xi = when(col(weightCol).isNull || w <= 0.0 || col(textCol).isNull,
        raise_error(concat(lit("weightedSample: NULL text or non-positive weight for id "),
          col(idCol).cast("string"))))
      .otherwise(u.cast("double") / w)
    docs
      .select(col(idCol), col(weightCol), xi.as("xi"))
      .orderBy(col("xi").asc, col(idCol).asc)
      .limit(n)
  }

  /** Per-group token-length quantiles (p50/p90/p99) + count — the
    * distribution profile behind length-cutoff filters.
    *
    * `approx = false` (default): EXACT interpolated percentiles via the
    * [[graft.ops.RankLadder]] recipe — oracle-checkable AND
    * bounded-memory (per-group (length → count) partial agg,
    * running-sum ranks over that length-span-bounded table,
    * conditional-min folds; bit-identical to Spark's `Percentile`
    * without its per-group value buffer, so the default survives
    * 100 TB). `approx = true`: `percentile_approx` (KLL-style sketch,
    * single pass, one aggregate instead of count-collapse + window) —
    * rank error ≤ 1/`accuracy`, gated within 5% of exact by p53 and
    * CorpusOpsSpec. Same output shape either way. */
  def lengthQuantiles(
      docs: DataFrame,
      groupCol: String = "lang",
      textCol: String = "text",
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    val withN = docs.withColumn("_n", TextAnalysis.tokenCount(col(textCol)))
    if (approx) {
      def q(p: Double): Column =
        round(expr(s"percentile_approx(_n, ${p}D, $accuracy)").cast("double"), 4) + 0.0
      withN
        .groupBy(col(groupCol))
        .agg(
          count(lit(1)).as("n_docs"),
          q(0.5).as("p50"),
          q(0.9).as("p90"),
          q(0.99).as("p99"))
        .orderBy(groupCol)
    } else {
      import org.apache.spark.sql.expressions.Window
      val counts = withN
        .where(col("_n").isNotNull)
        .groupBy(col(groupCol), col("_n").cast("double").as("_v"))
        .agg(count(lit(1)).as("_c"))
      val ranked = counts
        .withColumn("_cum", sum(col("_c")).over(
          Window.partitionBy(col(groupCol)).orderBy(col("_v"))))
        .withColumn("_n", sum(col("_c")).over(
          Window.partitionBy(col(groupCol))))
      val ps = Seq(0.5 -> "a", 0.9 -> "b", 0.99 -> "c")
      val aggCols = ps.flatMap { case (p, t) => graft.ops.RankLadder.cumFolds(p, t) }
      val qtbl = ranked.groupBy(col(groupCol))
        .agg(aggCols.head, aggCols.tail: _*)
        .select(col(groupCol).as("_grpq"),
          (round(graft.ops.RankLadder.blend("a"), 4) + 0.0).as("p50"),
          (round(graft.ops.RankLadder.blend("b"), 4) + 0.0).as("p90"),
          (round(graft.ops.RankLadder.blend("c"), 4) + 0.0).as("p99"))
      // null-safe broadcast join back so an all-NULL-length group keeps
      // NULL quantiles and a NULL group key keeps its row — exactly the
      // aggregate's semantics
      withN
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as("n_docs"))
        .join(broadcast(qtbl), col(groupCol) <=> col("_grpq"), "left")
        .select(col(groupCol), col("n_docs"), col("p50"), col("p90"), col("p99"))
        .orderBy(groupCol)
    }
  }

  /** Bloom-filter decontamination — membership of each probe document's
    * content fingerprint in the corpus, answered by a one-pass mergeable
    * [[graft.functions.BloomFilterAgg]] fold instead of a join. At
    * 100 TB the exact corpus-side join is the thing you cannot afford;
    * the filter is built in a single map-side-combined pass (8 KB
    * partials ORed at m=2^16; size the m knob to the corpus), broadcast
    * once, and probed with pure column arithmetic. The `exact_hit`
    * column is the gate-scale audit of the filter's answers (no false
    * negatives, measurable false positives); production keeps only
    * `bloom_hit`.
    *
    * Returns probeIdCols ++ (bloom_hit, exact_hit) as 0/1 ints. */
  def bloomDecontam(
      corpus: DataFrame,
      probes: DataFrame,
      probeIdCols: Seq[String],
      textCol: String = "text",
      hexChars: Int = 4,
      k: Int = 4): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    def hexC = sha2(TextAnalysis.normText(col(textCol)), 256)
    val bf = corpus.select(hexC.as("_hx"))
      .agg(toCol(graft.functions.BloomFilterAgg(toExpr(col("_hx")), hexChars, k)
        .toAggregateExpression()).as("_bf"))
    val exact = corpus.select(hexC.as("_cx")).distinct()
    val windows = (0 until k).map(j =>
      conv(substring(col("_hx"), 1 + hexChars * j, hexChars), 16, 10)
        .cast("long").as(s"_w$j"))
    val withW = probes
      .select(probeIdCols.map(col) :+ hexC.as("_hx"): _*)
      .select((probeIdCols.map(col) :+ col("_hx")) ++ windows: _*)
    val hit = expr((0 until k).map(j =>
      s"((shiftrightunsigned(element_at(_bf, CAST(_w$j div 64 AS INT) + 1), " +
        s"CAST(_w$j % 64 AS INT)) & 1) = 1)").mkString(" AND "))
    withW.crossJoin(broadcast(bf))
      .join(broadcast(exact), col("_hx") === col("_cx"), "left")
      .select(probeIdCols.map(col)
        :+ hit.cast("int").as("bloom_hit")
        :+ col("_cx").isNotNull.cast("int").as("exact_hit"): _*)
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): per document,
    * PageRank over the word co-occurrence graph (undirected edges
    * between adjacent tokens, self-loops dropped), top-k words by final
    * score. INTEGER-EXACT so any engine replays it bit-for-bit: scores
    * live in micro-units (r0 = 10^6), each update is
    * `r' = 0.15 + 0.85 * SUM_u r(u) * cnt(u,v) / wdeg(u)` computed as
    * `150000 + (850 * SUM_u (r(u) * cnt) div wdeg(u)) div 1000` with
    * integral division — no float accumulates anywhere, so partition
    * order cannot flip a tie.
    *
    * Shape: ZERO shuffle — the graph, degrees, and every iteration live
    * inside one document's token array, so the whole computation is the
    * [[graft.functions.TextRankExpression]] kernel (map-only scan +
    * explode of the ≤ k result structs). A join-per-iteration
    * formulation moves (doc, word) rows cluster-wide for no reason and
    * measured 7× slower in-suite. Isolated words (docs whose every
    * bigram is a repeated word) get the damping floor 150000. */
  def textrankKeywords(
      docs: DataFrame,
      k: Int = 3,
      iters: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1 && iters >= 1, "textrank: k and iters must be >= 1")
    val ranked = graft.functions.TextRankFunctions.textrank(
      TextAnalysis.tokens(col(textCol)), k, iters)
    docs.select(col(idCol), explode(ranked).as("_e"))
      .select(col(idCol), col("_e")("rank").as("rank"),
        col("_e")("word").as("word"), col("_e")("score").as("score"))
  }

  /** Deterministic training-epoch shuffle: assign every document a
    * shard and an intra-shard position that look random but are a pure
    * function of (epoch, content) — the data-ordering step of a
    * pretraining run. Re-running any epoch reproduces its permutation
    * exactly (restart-safe, no RNG state to persist), different epochs
    * give unrelated permutations, and identical-content docs stay
    * adjacent (id tie-break) so dedup-adjacent batching is stable.
    *
    * Shard = (first hex digit of sha256("epoch<e>|" ++ norm text)) mod
    * nShards — requires nShards | 16 so the digit maps uniformly.
    * Position = rank of the full hash within the shard. Map-only plus
    * one per-shard window; at cluster scale swap the window for the
    * blocked two-pass rank (the [[graft.ops.Packing]] prefix-sum
    * shape) and write shards as separate files. */
  def epochShuffle(
      docs: DataFrame,
      epoch: Int,
      nShards: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(nShards > 0 && 16 % nShards == 0, "epochShuffle: nShards must divide 16")
    val hx = sha2(concat(lit(s"epoch$epoch|"), TextAnalysis.normText(col(textCol))), 256)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_hx"), col(idCol))
    docs.select(col(idCol), hx.as("_hx"))
      .withColumn("shard",
        pmod(conv(substring(col("_hx"), 1, 1), 16, 10).cast("int"), lit(nShards)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** BPE merge learning (Sennrich et al. 2016) — the tokenizer-training
    * kernel, distributed: count corpus word frequencies once (the only
    * corpus-sized pass; afterwards everything is vocab-sized), then per
    * merge round pick the globally most frequent adjacent symbol pair
    * and fuse it. Each round is one vocab-sized pair-count shuffle plus
    * a ONE-ROW driver fetch (the argmax — inherently sequential, same
    * in every real BPE trainer); production trainers run ~30k rounds on
    * exactly this loop shape.
    *
    * Merge application is ENGINE-PORTABLE by construction: symbols live
    * in a sentinel-spaced string (" a b c ") and a merge is two
    * leftmost-non-overlapping `replace` passes of " l r " → " lr "
    * (the second pass catches occurrences whose leading space the first
    * pass consumed). For every non-self pair (l ≠ r) this provably
    * equals the textbook left-to-right scan — merging cannot create a
    * fresh (l, r) adjacency — and self-pair runs ≥ 5 (where the two
    * rules can differ) are documented out of scope.
    *
    * Returns nMerges rows: (rank, lsym, rsym, cnt) — the learned merge
    * table, tie-broken (cnt desc, lsym, rsym). */
  def bpeMerges(
      docs: DataFrame,
      nMerges: Int = 3,
      textCol: String = "text"): DataFrame = {
    require(nMerges >= 1 && nMerges <= 16, "bpeMerges: nMerges must be in [1,16]")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("wc"))
    // filter() drops the empty strings Java's split-by-empty-regex can
    // emit at the boundaries (DuckDB's string_split(w, '') never does)
    var enc = words.select(col("wc"),
      concat(lit(" "),
        array_join(filter(split(col("w"), ""), x => x =!= ""), " "),
        lit(" ")).as("enc"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    // grandparent lifecycle: the round's collect() below materializes
    // the CURRENT enc cache (pulling its predecessor's cache once), so
    // the predecessor can drop right after the collect — no eager
    // count() job per round just to release it early
    var prevEnc: DataFrame = null
    while (rank <= nMerges && !exhausted) {
      val syms = enc.select(col("wc"), split(trim(col("enc")), " ").as("syms"))
      val topRows = syms
        .select(col("wc"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p")("0").as("l"), col("p")("1").as("r"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect() // bounded: ONE row per round
      // the collect above materialized the CURRENT enc cache (pulling
      // its predecessor's cache exactly once), so the grandparent can
      // drop now — this replaces the old eager count() job per round
      if (prevEnc != null) { prevEnc.unpersist(blocking = false); prevEnc = null }
      if (topRows.isEmpty) {
        // no adjacent pair left anywhere (empty corpus, or every word
        // fully fused): a shorter merge table, not a crash
        exhausted = true
      } else {
        val top = topRows(0)
        val (l, r, c) = (top.getString(0), top.getString(1), top.getLong(2))
        merges += ((rank, l, r, c))
        val pat = lit(s" $l $r ")
        val rep = lit(s" $l$r ")
        val next = enc
          .select(col("wc"), replace(replace(col("enc"), pat, rep), pat, rep).as("enc"))
          .persist()
        prevEnc = enc // still feeds `next` until next round's collect
        enc = next
        rank += 1
      }
    }
    if (prevEnc != null) prevEnc.unpersist(blocking = false)
    enc.unpersist()
    merges.toSeq.toDF("rank", "lsym", "rsym", "cnt")
  }

  /** APPLY a learned [[bpeMerges]] table: re-encode every document with
    * the merge rules and report tokenizer-fit statistics — words,
    * pre-merge symbols (chars), post-merge BPE tokens, and the
    * chars-per-token compression ratio in exact micro-units (the
    * standard "how well does this tokenizer fit this corpus" health
    * metric; a domain shift shows up as a compression drop before it
    * shows up in loss curves).
    *
    * The merge table is driver-sized by contract (≤16 learned rows
    * here; a production 30k-merge table is still kilobytes), so each
    * merge folds into the SAME engine-portable double-`replace` the
    * trainer used — the whole encode is ONE static expression tree per
    * row: map-only, codegen'd, zero shuffle at any corpus size. The
    * alternative (encode the distinct-word table, join back) trades
    * map-side recompute for two corpus shuffles — the right swap only
    * when merges number in the tens of thousands; documented, not
    * default. Docs without tokens emit nothing (mirrors [[oovRate]]).
    *
    * The per-token counts fold into LENGTH arithmetic instead of
    * re-splitting: n_sym = length(word) (the chars ARE the pre-merge
    * symbols), and since the sentinel form " a b c " has exactly
    * 2·n_sym + 1 chars and every successful merge deletes exactly one
    * space, n_bpe = length(applied) − n_sym − 1 — one string scan per
    * merge and none to count.
    *
    * Returns (idCol, n_words, n_sym, n_bpe, compression_micro). */
  def bpeEncodeStats(
      docs: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(merges.nonEmpty && merges.length <= 64,
      s"bpeEncodeStats: need 1..64 merges, got ${merges.length}")
    def sentinel(t: Column): Column =
      concat(lit(" "),
        array_join(filter(split(t, ""), x => x =!= ""), " "), lit(" "))
    def applied(t: Column): Column = merges.foldLeft(sentinel(t)) {
      case (s, (l, r)) =>
        val pat = lit(s" $l $r ")
        val rep = lit(s" $l$r ")
        replace(replace(s, pat, rep), pat, rep)
    }
    val nSym: Column => Column = t => length(t)
    val nBpe: Column => Column = t => length(applied(t)) - length(t) - lit(1)
    def summed(f: Column => Column): Column =
      aggregate(transform(col("_toks"), f),
        lit(0L), (acc, x) => acc + x.cast("long"))
    docs
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col(idCol),
        size(col("_toks")).cast("long").as("n_words"),
        summed(nSym).as("n_sym"),
        summed(nBpe).as("n_bpe"))
      .withColumn("compression_micro", expr("(n_sym * 1000000) div n_bpe"))
  }

  /** Out-of-vocabulary rate per document against a fixed token budget:
    * the vocab is the top `vocabSize` corpus tokens (count desc, token
    * asc — total order), and each doc reports how much of its token
    * mass falls outside it. The tokenizer-coverage health metric for a
    * corpus/vocab pairing; rate in exact micro-units (`div`, no float).
    *
    * Shapes: one corpus token count (map-side combined), vocab via
    * TakeOrdered (never a global sort), broadcast membership join,
    * per-doc count — all safe at any corpus size since the vocab is
    * bounded by construction. */
  def oovRate(
      docs: DataFrame,
      vocabSize: Int = 200,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(vocabSize >= 1, "oovRate: vocabSize must be >= 1")
    val toks = docs
      .select(col(idCol), explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
      .where(col("t") =!= "")
    val vocab = toks.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t").asc)
      .limit(vocabSize)
      .select(col("t"), lit(1).as("_in"))
    toks.join(broadcast(vocab), Seq("t"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        expr("(n_oov * 1000000) div n_tokens").as("oov_micro"))
  }

  /** Data selection under a token budget: take documents in quality
    * order (desc, id tie-break) while the running token total stays
    * within `budget` — the "best data first" mixture-construction step
    * (quality-pruned pretraining sets, budgeted fine-tune mixes). A doc
    * is selected iff the tokens BEFORE it plus its own fit the budget
    * (strict: never overshoots).
    *
    * The running total is a global prefix sum in quality order — the
    * naive window serializes the corpus through one task, so this
    * reuses the [[Packing]] two-pass shape with QUALITY-RANGE blocks:
    * `blk = -(quality div bucketWidth)` gives blocks that partition the
    * sort order exactly (equal-quality rows share a block; blocks are
    * mutually ordered), per-block prefix sums run parallel, and only
    * the |range/bucketWidth| block summaries see a global window.
    * Returns (idCol, quality, tokens, cum_tokens) for selected rows. */
  def selectUnderBudget(
      docs: DataFrame,
      budget: Long,
      idCol: String = "doc_id",
      qualityCol: String = "quality",
      tokensCol: String = "n_tokens",
      bucketWidth: Long = 1024L): DataFrame = {
    require(budget >= 0 && bucketWidth > 0, "selectUnderBudget: bad budget/bucketWidth")
    import org.apache.spark.sql.expressions.Window
    val blk = expr(s"-(`$qualityCol` div $bucketWidth)")
    val withBlk = docs
      .select(col(idCol), col(qualityCol), col(tokensCol), blk.as("_blk"))
    val wIn = Window.partitionBy(col("_blk"))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = withBlk.withColumn("_local_off",
      coalesce(sum(col(tokensCol)).over(wIn), lit(0L)))
    val sums = withBlk.groupBy(col("_blk")).agg(sum(col(tokensCol)).as("_s"))
    // #blocks-bounded carry ladder (rows div blockSize — Packing contract)
    val wCarry = Window.orderBy(col("_blk")).rowsBetween(Window.unboundedPreceding, -1)
    val bases = sums.withColumn("_base", coalesce(sum(col("_s")).over(wCarry), lit(0L)))
      .select(col("_blk"), col("_base"))
    within.join(broadcast(bases), Seq("_blk"))
      .withColumn("cum_tokens", col("_base") + col("_local_off") + col(tokensCol))
      .where(col("cum_tokens") <= budget)
      .select(col(idCol), col(qualityCol), col(tokensCol), col("cum_tokens"))
  }

  /** Per-group percentile-rank calibration in exact micro-units: maps a
    * score to its within-group rank position `((rk−1)·10⁶) div (n−1)`
    * (0 = group minimum, 10⁶ = maximum; singleton groups pin 0). The
    * data-mixing normalizer: raw quality scores are NOT comparable
    * across sources (each source has its own score distribution), so a
    * single global cutoff over- or under-prunes whole sources —
    * calibrating to per-source percentiles first makes "keep the top
    * 30%" mean the same thing everywhere. Integer `div` end to end —
    * no float percent_rank wobble in gates or reruns; ties break by id
    * (total order, reshuffle-stable).
    *
    * Shape: ONE hash shuffle on the group; rank and group count ride
    * the same window partitioning. Returns the input columns plus
    * `pct_micro`. */
  def groupPercentileRank(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    df.withColumn("_rk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .withColumn("pct_micro",
        when(col("_n") === 1, 0L)
          .otherwise(expr("((_rk - 1) * CAST(1000000 AS BIGINT)) div (_n - 1)")))
      .drop("_rk", "_n")
  }

  /** Cross-document boilerplate LINE removal (the RefinedWeb/CCNet
    * corpus-frequency rule): a trimmed line appearing in at least
    * `minDocFreq` DISTINCT documents is template text — nav bars,
    * cookie banners, footers repeat across pages; prose doesn't — and
    * is cut from EVERY document, order of the survivors preserved.
    * Complements [[TextAnalysis.c4LineClean]] (per-row heuristics —
    * needs only the line) with the statistic that needs the corpus.
    *
    * Shape at 100 TB: distinct (line, doc) pairs feed one partial-agg
    * shuffle into the line→doc-frequency table; `df ≥ minDocFreq`
    * leaves only genuinely repeated template lines — a tiny relation by
    * construction — which broadcasts back as the membership probe, so
    * document text crosses the wire exactly once (the reassembly
    * groupBy, this operator's second and final shuffle). Lines key the
    * frequency table as raw strings here for oracle parity; at
    * petabyte scale key it on a 16-byte line fingerprint and keep the
    * string only on the probe side.
    *
    * Returns (idCol, n_lines, n_kept, clean_md5) where clean_md5 pins
    * the kept lines rejoined with `\n` (md5("") when every line was
    * boilerplate — loud, never NULL). */
  def boilerplateLines(
      docs: DataFrame,
      minDocFreq: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minDocFreq >= 2, "boilerplateLines: minDocFreq must be >= 2")
    val lined = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")))
      .withColumn("_line", trim(col("_line")))
    val template = lined.select(col(idCol), col("_line")).distinct()
      .groupBy("_line").agg(count(lit(1)).as("_df"))
      .where(col("_df") >= minDocFreq)
      .select(col("_line"), lit(true).as("_bp"))
    lined.join(broadcast(template), Seq("_line"), "left")
      .withColumn("_bp", coalesce(col("_bp"), lit(false)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("_bp"), 0L).otherwise(1L)).as("n_kept"),
        sort_array(collect_list(struct(col("_pos"), col("_bp"), col("_line")))).as("_ls"))
      .select(col(idCol), col("n_lines"), col("n_kept"),
        md5(array_join(
          transform(
            filter(col("_ls"), s => !s.getField("_bp")),
            s => s.getField("_line")),
          "\n")).as("clean_md5"))
  }

  /** Benchmark-contamination SPAN localization: the exact token ranges
    * of each corpus document that overlap any benchmark text as a
    * contiguous `n`-gram match — [[contamination]] says WHICH docs
    * leaked; this says WHERE, and its output is a [[Dedup.repeatedSpans]]
    * -shaped cut list (span_start inclusive, span_end exclusive, token
    * coordinates), so [[Dedup.applySpanCuts]] surgically removes the
    * leaked spans instead of dropping whole documents — the GPT-3/Pile
    * decontamination playbook.
    *
    * Shape at 100 TB: benchmark n-grams are DISTINCT and BROADCAST
    * (benchmarks are small by definition — that asymmetry is the whole
    * design); corpus-side positional n-grams are map-only (native
    * `word_ngrams` kernel + posexplode), the probe is a broadcast
    * left-semi join, and only MATCHED positions — rare by construction —
    * reach the one per-doc shuffle that merges adjacent hits into
    * maximal islands (`pos − row_number` grouping, exactly
    * repeatedSpans' merge).
    *
    * Returns (idCol, span_start, span_end, n_windows). */
  def contaminationSpans(
      corpus: DataFrame,
      bench: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 1, s"contaminationSpans: n must be >= 1, got $n")
    def toks(df: DataFrame) =
      TextAnalysis.tokens(lower(df.col(textCol)))
    val benchGrams = bench
      .select(explode(graft.functions.ShingleFunctions.word_ngrams(toks(bench), n)).as("g"))
      .distinct()
    val hits = corpus
      .select(col(idCol),
        posexplode(graft.functions.ShingleFunctions.word_ngrams(toks(corpus), n))
          .as(Seq("pos", "g")))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
    val wdw = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      .withColumn("_grp", col("pos") - row_number().over(wdw))
      .groupBy(col(idCol), col("_grp"))
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(n)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** SPAN-CORRUPTION mask planning (the T5 / span-denoising data-prep
    * step): pick mask-span start positions DETERMINISTICALLY — position
    * `p` of doc `d` starts a span iff
    * `(d·2654435761 + p·40503) mod 10⁶ < densityPpm`, a multiplicative
    * integer hash any engine replays exactly, so the same corpus always
    * yields the same masking plan (reproducible pre-training runs, no
    * RNG state to ship) — then merge overlapping/touching fixed-length
    * spans `[p, p+spanLen)` into maximal islands and clip at the doc
    * end. Consumers: the span list feeds [[graft.ops.Dedup.applySpanCuts]]
    * to materialize the input side, and sentinel insertion is a map-only
    * transform over the same list.
    *
    * Shape: one map-only pass emits each doc's selected positions (the
    * position stream never shuffles — selection is a per-row predicate);
    * the merge is ONE per-doc window + ONE aggregate on the same key
    * (exchange reused, the intervalCoverage sweep recipe, islands via
    * strictly-greater gap test on the running max end). Work ∝ selected
    * positions ≈ densityPpm × corpus tokens — at 100 TB parallelism is
    * #docs and nothing global exists.
    *
    * Returns (idCol, span_start, span_end, n_starts), one row per
    * merged span; docs with no selected position emit nothing. */
  def spanCorruptionPlan(
      docs: DataFrame,
      densityPpm: Long = 150000L,
      spanLen: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(densityPpm > 0 && densityPpm <= 1000000L,
      s"spanCorruptionPlan: density must be ppm in (0, 1e6], got $densityPpm")
    require(spanLen >= 1, s"spanCorruptionPlan: spanLen must be >= 1, got $spanLen")
    val starts = docs
      .select(col(idCol), TextAnalysis.tokenCount(col(textCol)).cast("long").as("_n"))
      .where(col("_n") > 0)
      .select(col(idCol), col("_n"),
        explode(sequence(lit(0L), col("_n") - 1L)).as("p"))
      .where(pmod(col(idCol).cast("long") * lit(2654435761L) + col("p") * lit(40503L),
        lit(1000000L)) < densityPpm)
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("p"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("p"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    starts
      .withColumn("_pmax", max(col("p") + lit(spanLen.toLong)).over(wPrev))
      .withColumn("_new",
        when(col("_pmax").isNull || col("p") > col("_pmax"), 1L).otherwise(0L))
      .withColumn("_isl", sum(col("_new")).over(wRun))
      .groupBy(col(idCol), col("_isl"))
      .agg(min(col("p")).as("span_start"),
        least(max(col("p")) + lit(spanLen.toLong), first(col("_n"))).as("span_end"),
        count(lit(1)).as("n_starts"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_starts"))
  }

  /** MATERIALIZE a [[spanCorruptionPlan]] into the T5 denoising pair:
    * the input sequence replaces each masked span with its ordinal
    * sentinel `<extra_id_k>` (spans sorted by start), the target
    * sequence is each sentinel followed by the tokens it hides — the
    * actual (input, target) example layout span-denoising pre-training
    * consumes. Emitted as md5 fingerprints of the space-joined
    * sequences plus token accounting, the engine-portable comparison
    * form (the [[graft.ops.Dedup.applySpanCuts]] contract).
    *
    * Shape: the span list aggregates to a few structs per doc (spans
    * are merged maximal islands, disjoint by construction), joins back
    * on the doc id — the tiny side — and both sequences build as
    * higher-order array expressions: map-only after one doc-keyed
    * shuffle of the span side. Docs without spans pass through with the
    * original text fingerprint and an empty target.
    *
    * Returns (idCol, n_tokens, n_spans, n_masked, input_md5,
    * target_md5). */
  def spanDenoisePairs(
      docs: DataFrame,
      plan: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spans = plan
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("span_start"), col("span_end")))).as("_ss"))
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .where(size(col("_toks")) > 0)
      .join(spans, Seq(idCol), "left")
      .withColumn("_ss", coalesce(col("_ss"),
        expr("CAST(array() AS ARRAY<STRUCT<span_start: BIGINT, span_end: BIGINT>>)")))
      .withColumn("_starts", expr("transform(_ss, s -> s.span_start)"))
      .withColumn("_input", expr(
        "flatten(transform(sequence(0L, size(_toks) - 1L), i -> " +
          "CASE WHEN array_position(_starts, i) > 0 " +
          "THEN array(concat('<extra_id_', CAST(array_position(_starts, i) - 1 AS STRING), '>')) " +
          "WHEN exists(_ss, s -> i >= s.span_start AND i < s.span_end) " +
          "THEN CAST(array() AS ARRAY<STRING>) " +
          "ELSE array(_toks[CAST(i AS INT)]) END))"))
      .withColumn("_target", expr(
        "flatten(transform(_ss, (s, k) -> " +
          "concat(array(concat('<extra_id_', CAST(k AS STRING), '>')), " +
          "slice(_toks, CAST(s.span_start AS INT) + 1, CAST(s.span_end - s.span_start AS INT)))))"))
      .select(col(idCol),
        size(col("_toks")).cast("long").as("n_tokens"),
        size(col("_ss")).cast("long").as("n_spans"),
        expr("aggregate(_ss, 0L, (acc, s) -> acc + s.span_end - s.span_start)").as("n_masked"),
        md5(concat_ws(" ", col("_input"))).as("input_md5"),
        md5(concat_ws(" ", col("_target"))).as("target_md5"))
  }

  /** TYPE-TOKEN RATIO per source — the corpus-linguistics lexical-
    * diversity screen (template-generated or scraped-boilerplate
    * sources have pathologically LOW TTR; a healthy natural-language
    * source sits far higher at comparable volume), plus the hapax
    * share (vocabulary seen exactly once — the long-tail health
    * signal). Integer ppm.
    *
    * Shape: one (source, token) count table (partial agg on the
    * exploded stream — the only corpus-sized shuffle), then a
    * vocab-bounded per-source fold. NOTE the classic caveat, kept in
    * the output rather than corrected: raw TTR falls with volume, so
    * compare sources at similar n_tokens (that's why n_tokens is a
    * column, not a footnote).
    *
    * Returns (source, n_tokens, n_types, n_hapax, ttr_ppm,
    * hapax_ppm) ordered by source. */
  def typeTokenRatio(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("_t"))
      .groupBy(col("source"), col("_t"))
      .agg(count(lit(1)).as("_c"))
    counts.groupBy("source")
      .agg(sum(col("_c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("_c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("n_types * 1000000 div n_tokens").as("ttr_ppm"),
        expr("n_hapax * 1000000 div n_types").as("hapax_ppm"))
      .orderBy("source")
  }

  /** FIM (fill-in-the-middle) TRANSFORMATION, PSM order — the
    * code-LLM training prep (Bavarian et al., "Efficient Training of
    * Language Models to Fill in the Middle"): split each document at
    * two cut points into prefix/middle/suffix and re-serialize as
    * `<fim_prefix> P <fim_suffix> S <fim_middle> M`, teaching the
    * model to infill. The sibling of [[spanCorruptionPlan]]'s T5
    * masking, with the same reproducibility contract: cuts come from
    * multiplicative hashes of the doc id — RNG-FREE, so every run,
    * every engine, and the oracle agree on the exact split.
    *
    * Cut rule for an n-token doc (n ≥ 3): `c1 = 1 + (id·40503 + 7)
    * mod (n−2)`, `c2 = c1 + 1 + (id·69069 + 13) mod (n−c1−1)` —
    * 0 < c1 < c2 < n always, so all three parts are non-empty.
    * Multiplier magnitudes keep id·m inside BIGINT for any realistic
    * id (no overflow-wrap divergence between engines). Docs shorter
    * than 3 tokens pass through untransformed (fim_md5 of the raw
    * token stream, c1 = c2 = 0) — the paper's "FIM rate" knob decides
    * upstream which docs enter at all.
    *
    * Map-only: split + two hashes + three slices per row, no shuffle —
    * at 100 TB this is the scan.
    *
    * Returns (idCol, n_tokens, c1, c2, fim_md5). */
  def fimTransform(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .where(size(col("_toks")) > 0)
      .withColumn("_n", size(col("_toks")).cast("long"))
      .withColumn("_c1",
        when(col("_n") < 3L, lit(0L))
          .otherwise(lit(1L) + pmod(col(idCol).cast("long") * 40503L + 7L, col("_n") - 2L)))
      .withColumn("_c2",
        when(col("_n") < 3L, lit(0L))
          .otherwise(col("_c1") + 1L +
            pmod(col(idCol).cast("long") * 69069L + 13L, col("_n") - col("_c1") - 1L)))
      .withColumn("_fim",
        when(col("_n") < 3L, concat_ws(" ", col("_toks")))
          .otherwise(concat_ws(" ",
            expr("concat(array('<fim_prefix>'), slice(_toks, 1, CAST(_c1 AS INT)), " +
              "array('<fim_suffix>'), slice(_toks, CAST(_c2 AS INT) + 1, CAST(_n - _c2 AS INT)), " +
              "array('<fim_middle>'), slice(_toks, CAST(_c1 AS INT) + 1, CAST(_c2 - _c1 AS INT)))"))))
      .select(col(idCol), col("_n").as("n_tokens"), col("_c1").as("c1"),
        col("_c2").as("c2"), md5(col("_fim")).as("fim_md5"))
  }

  /** WINDOWED CO-OCCURRENCE LIFT: for token pairs appearing within
    * ±`window` positions of each other, how much MORE often than
    * independence predicts — the integer-exact cousin of PMI
    * (`lift = PMI's ratio before the log`; ranking by lift ≡ ranking
    * by PMI, and staying in ratio space keeps the output a pure
    * integer, so the oracle can't drift in the mantissa). The
    * collocation table word2vec/GloVe-style pipelines build first.
    *
    * Counting model: tokens are lowercased whitespace tokens; a
    * co-occurrence is a position pair (t[i], t[j]) with
    * `0 < j − i ≤ window`, keyed UNORDERED as (min, max) by string
    * sort. With `c(t)` the plain occurrence counts and `N = Σ c(t)`,
    * `lift_ppm = c_ab·N·10⁶ div (c_a·c_b)` — every pair shares the
    * same global normalizer, so the ORDERING equals true lift/PMI
    * ordering exactly, which is all a collocation table is consumed
    * for.
    *
    * Shape: explode to (doc, pos, tok) once; the pair stream is a
    * self-join ON THE DOC KEY with the position band predicate —
    * per-doc cost O(len·window), linear in corpus size for fixed
    * window (never all-pairs). Token counts are a second partial agg
    * on the same exploded projection; the joins after counting are
    * vocab- and |pairs|-bounded. `minPairCount` prunes the hapax tail
    * BEFORE the count joins. At 100 TB, the band self-join is the
    * textbook sort-merge-per-doc case and hot boilerplate tokens
    * inflate c(t), not the join — no skew hazard beyond AQE's reach.
    *
    * Returns (tok_a, tok_b, n_ab, n_a, n_b, lift_ppm) with
    * tok_a < tok_b, ordered by (n_ab desc, tok_a, tok_b), top
    * `topK`. */
  def cooccurLift(
      docs: DataFrame,
      window: Int = 3,
      minPairCount: Long = 5L,
      topK: Int = 50,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(window >= 1, s"cooccurLift: need window >= 1, got $window")
    val toks = docs.select(col(idCol).as("_doc"),
        posexplode(TextAnalysis.tokens(lower(col(textCol)))).as(Seq("_p", "_t")))
    val n = toks.agg(count(lit(1)).as("_n"))
    val cnt = toks.groupBy(col("_t")).agg(count(lit(1)).as("_c"))
    val pairs = toks.as("x")
      .join(toks.as("y"),
        col("x._doc") === col("y._doc") &&
          col("y._p") > col("x._p") &&
          col("y._p") <= col("x._p") + window)
      .select(least(col("x._t"), col("y._t")).as("tok_a"),
        greatest(col("x._t"), col("y._t")).as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    pairs
      .join(cnt.select(col("_t").as("tok_a"), col("_c").as("n_a")), Seq("tok_a"))
      .join(cnt.select(col("_t").as("tok_b"), col("_c").as("n_b")), Seq("tok_b"))
      .crossJoin(n)
      .select(col("tok_a"), col("tok_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * _n * 1000000 div (n_a * n_b)").as("lift_ppm"))
      .orderBy(col("n_ab").desc, col("tok_a"), col("tok_b"))
      .limit(topK)
  }

  /** TOKENIZER SCORECARD per language — fertility (subwords per word)
    * and compression (chars per subword), the two numbers every
    * multilingual-tokenizer evaluation reports: a language whose
    * fertility is far above the corpus mean is being over-segmented by
    * the tokenizer (more sequence length per sentence → more compute,
    * worse downstream quality — the standard argument for vocabulary
    * rebalancing). Uses [[TextAnalysis.subwordTokens]] (the engine's
    * deterministic pre-tokenizer stand-in) against whitespace words.
    *
    * Integer-exact ppm/micro by integral division; ONE map-only pass
    * (both tokenizations are per-row expressions) into a partial-agg'd
    * fold on the language key. At 100 TB this is the scan.
    *
    * Returns (lang, n_docs, n_chars, n_words, n_subwords,
    * fertility_ppm, chars_per_subword_micro) ordered by lang. */
  def tokenizerStats(
      docs: DataFrame,
      langCol: String = "lang",
      textCol: String = "text"): DataFrame =
    docs.select(col(langCol),
        length(col(textCol)).cast("long").as("_nc"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("_nw"),
        size(TextAnalysis.subwordTokens(col(textCol))).cast("long").as("_ns"))
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_nc")).as("n_chars"),
        sum(col("_nw")).as("n_words"),
        sum(col("_ns")).as("n_subwords"))
      .select(col(langCol), col("n_docs"), col("n_chars"), col("n_words"),
        col("n_subwords"),
        when(col("n_words") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(n_subwords * 1000000 div n_words AS BIGINT)"))
          .as("fertility_ppm"),
        when(col("n_subwords") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(n_chars * 1000000 div n_subwords AS BIGINT)"))
          .as("chars_per_subword_micro"))
      .orderBy(col(langCol))

  /** VOCABULARY GROWTH (Heaps' law) curve — distinct types seen vs
    * tokens processed, walking the corpus in doc-id order: the
    * corpus-linguistics health curve (natural text grows ∝ n^β,
    * β ≈ 0.5; template/boilerplate corpora flatten early, OCR noise
    * never flattens). Same first-occurrence decomposition as
    * [[graft.ops.EventsOps.cumulativeUniques]] — each type counts at
    * its FIRST document, so no running count-distinct exists: one
    * (token → min doc) aggregate, per-doc new-type counts, and a
    * running sum over the |docs|-bounded ladder.
    *
    * Returns (doc_id, n_tokens, new_types, cum_tokens, cum_types)
    * ordered by doc_id — docs with no tokens carry zeros. */
  def vocabGrowth(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("_t"))
    val firstSeen = toks.groupBy(col("_t")).agg(min(col(idCol)).as("_first"))
      .groupBy(col("_first").as(idCol)).agg(count(lit(1)).as("new_types"))
    val perDoc = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    // |docs|-bounded ladder (see Scaladoc: the vocab-growth curve is
    // inherently a sequential prefix over doc order)
    val run = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    perDoc.join(firstSeen, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(run))
      .withColumn("cum_types", sum(col("new_types")).over(run))
      .orderBy(idCol)
  }

  /** RECIPROCAL-RANK FUSION (Cormack et al. 2009) — merge two ranked
    * lists into one hybrid ranking: each list contributes
    * `1/(kRrf + rank)` for every id it ranked, summed over lists — the
    * standard lexical × semantic hybrid-search combiner (BM25 list ⊕
    * embedding list), robust precisely because it never compares the
    * two lists' incomparable scores, only their ranks. Integer-exact:
    * each term is `10⁶ div (kRrf + rank)` (declared micro floor), so
    * the fused ordering is engine-portable with no float summation
    * anywhere; ties break by id.
    *
    * Shape: full outer join of two ≤ list-length tables + a
    * TakeOrdered — everything is candidate-bounded; the expensive part
    * is whatever PRODUCED the rankings. Returns topK rows of
    * (id, rank_a, rank_b, rrf_micro) by fused rank. */
  def rrfFusion(
      rankA: DataFrame,
      rankB: DataFrame,
      idCol: String = "doc_id",
      rankCol: String = "rank",
      kRrf: Int = 60,
      topK: Int = 10): DataFrame = {
    require(kRrf >= 1, s"rrfFusion: need kRrf >= 1, got $kRrf")
    require(topK >= 1, s"rrfFusion: need topK >= 1, got $topK")
    val a = rankA.select(col(idCol).as("id"), col(rankCol).cast("long").as("rank_a"))
    val b = rankB.select(col(idCol).as("id"), col(rankCol).cast("long").as("rank_b"))
    a.join(b, Seq("id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"1000000 div ($kRrf + rank_a)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($kRrf + rank_b)"), lit(0L)))
      .orderBy(col("rrf_micro").desc, col("id"))
      .limit(topK)
  }

  /** HASHING-TRICK VECTORIZER (Weinberger et al. 2009) — text to a
    * fixed-width sparse feature space with NO vocabulary pass: feature
    * index = hash(token) mod dim, term frequency as the weight — the
    * stateless featurizer linear classifiers/regressors train on at
    * corpus scale (no vocab table to build, ship, or version; collisions
    * are the accepted trade). Engine-portable hash: the first 8 hex
    * chars of md5(token) parsed base-16 (the [[epochShuffle]] /
    * table-fingerprint primitive), so any engine reproduces the exact
    * same sparse matrix.
    *
    * Map-only explode + ONE partial-agg on (doc, idx) — at 100 TB this
    * is the scan; output is (tokens)-sized, never (docs × dim).
    * Returns (idCol, idx, tf) — one row per nonzero cell. */
  def hashingVectorizer(
      docs: DataFrame,
      dim: Int = 1024,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(dim >= 2, s"hashingVectorizer: need dim >= 2, got $dim")
    docs
      .select(col(idCol),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("_t"))
      .select(col(idCol),
        pmod(expr("CAST(conv(substring(md5(_t), 1, 8), 16, 10) AS BIGINT)"),
          lit(dim.toLong)).as("idx"))
      .groupBy(col(idCol), col("idx"))
      .agg(count(lit(1)).as("tf"))
  }

  /** SMOOTHED TARGET ENCODING — the categorical-feature workhorse:
    * replace a category with the shrunken mean of the target,
    * `enc = (Σ_c target + m · global_mean) / (n_c + m)` — rare
    * categories pull toward the global mean (m pseudo-observations,
    * Micci-Barreca 2001), so a category seen twice cannot memorize its
    * two labels. Integer-exact in micro-units: the global mean is
    * itself the declared floored integer, and both divisions are
    * re-signed magnitude divs (portable for negative targets).
    *
    * Shape: one partial-agg (n, Σ) on the category; the global mean is
    * a 1-row fold OF the category table broadcast back — single data
    * pass, category-bounded everything. Leakage note: this is the
    * fit-on-train artifact — compute it on the TRAIN split (e.g.
    * [[graft.ops.EventsOps.temporalSplit]]) and join it onto eval.
    * Returns (catCol, n, raw_mean_micro, enc_micro). */
  def targetEncoding(
      df: DataFrame,
      catCol: String,
      valueCol: String,
      m: Long = 10L): DataFrame = {
    require(m >= 0, s"targetEncoding: need m >= 0, got $m")
    import org.apache.spark.sql.types.DecimalType
    val d = DecimalType(38, 0)
    val cats = df
      .where(col(valueCol).isNotNull)
      .select(col(catCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(col("_v").cast(d)).as("_s"))
    val glob = cats.agg(
        (sum(col("n"))).as("_gn"), sum(col("_s")).as("_gs"))
      .selectExpr(
        "CASE WHEN _gn = 0 THEN 0 ELSE " +
          "CAST(CASE WHEN _gs >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(abs(_gs) div CAST(_gn AS DECIMAL(38,0)) AS BIGINT) END AS _gmean")
    cats.crossJoin(broadcast(glob))
      .selectExpr(catCol, "n",
        "CAST(CASE WHEN _s >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(abs(_s) div CAST(n AS DECIMAL(38,0)) AS BIGINT) AS raw_mean_micro",
        s"CAST(CASE WHEN _s + $m * _gmean >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          s"CAST(abs(_s + $m * _gmean) div CAST(n + $m AS DECIMAL(38,0)) AS BIGINT) AS enc_micro")
  }

  /** RARE-LEVEL COLLAPSE — fold categorical levels seen fewer than
    * `minCount` times into a single OTHER bucket: the feature-prep
    * step before one-hot/target encoding that keeps the level table
    * bounded and stops single-row levels from memorizing labels
    * (companion to [[targetEncoding]]'s shrinkage). Reports the
    * RECODED distribution — how many original levels folded into each
    * surviving bucket and the row mass they carry.
    *
    * One partial-agg count on the level, then |levels|-bounded
    * recode + fold. Returns (recoded, n_original_levels, n_rows,
    * share_ppm) — NULL input levels recode to OTHER too (a null level
    * is the rarest kind of rare). */
  def rareLevelCollapse(
      df: DataFrame,
      catCol: String,
      minCount: Long,
      otherLabel: String = "OTHER"): DataFrame = {
    require(minCount >= 1, s"rareLevelCollapse: need minCount >= 1, got $minCount")
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(catCol).as("_l"))
      .agg(count(lit(1)).as("_n"))
      .select(
        when(col("_l").isNull || col("_n") < minCount, lit(otherLabel))
          .otherwise(col("_l").cast("string")).as("recoded"),
        col("_n"))
      .groupBy(col("recoded"))
      .agg(count(lit(1)).as("n_original_levels"), sum(col("_n")).as("n_rows"))
      .withColumn("share_ppm", expr(
        "CAST(n_rows * 1000000 div sum(n_rows) OVER () AS BIGINT)"))
      .orderBy("recoded")
  }

  /** CCNet-STYLE PERPLEXITY BUCKETS (Wenzek et al. 2020,
    * arXiv:1911.00359) — split the corpus into head / middle / tail by
    * language-model perplexity terciles, the curation convention CCNet
    * introduced and RedPajama/CCNet-derived corpora publish: "head" is
    * the cleanest third under the LM, "tail" the noisiest, and
    * downstream mixing weights are chosen PER BUCKET. The LM here is
    * the engine's own [[bigramSurprisal]] (add-one smoothed corpus
    * bigram model, integer whole-bit scoring) instead of the paper's
    * KenLM — same construction, engine-portable.
    *
    * Terciles are exact rank cuts over the (avg bits, doc id) total
    * order: bucket b = ⌈3·rank/n⌉ via integer arithmetic (the ntile
    * construction without its window function — rank and n come from
    * the same single-exchange ladder, and `(3·rank + n − 1) div n`
    * needs no per-bucket state). Docs with no bigram (|tokens| < 2)
    * are excluded, like the model itself excludes them.
    *
    * Shape: [[bigramSurprisal]]'s two corpus passes + ONE slim global
    * rank ladder over (bits_micro, doc_id) pairs — the same watched
    * single-partition-window caveat as [[curriculumOrder]], with the
    * same documented blocked-prefix-sum swap at cluster scale.
    * Returns (doc_id, n_bigrams, bits, bucket 1..3, bucket_name)
    * where 1=head (lowest surprisal). */
  def ccnetBuckets(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bigramSurprisal(docs, idCol, textCol)
      // integer sort key: total bits scaled by count — avg_bits without
      // the float (a/b < c/d ⇔ a·d < c·b needs pairwise compares; the
      // micro-quantized per-doc average is a stable portable proxy)
      .withColumn("_k", expr("CAST(bits * 1000000 div n_bigrams AS BIGINT)"))
    // GLOBAL per-doc order — see this op's Scaladoc caveat: swap for
    // percentile cut points at 100 TB (the woeIv/gainsTable remedy)
    val w = Window.orderBy(col("_k"), col(idCol))
    val n = Window.partitionBy()
    scored
      .withColumn("_rank", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(n))
      .withColumn("bucket", expr("CAST((3 * _rank + _n - 1) div _n AS INT)"))
      .select(col(idCol), col("n_bigrams"), col("bits"), col("bucket"),
        when(col("bucket") === 1, lit("head"))
          .when(col("bucket") === 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket_name"))
  }

  /** CURRICULUM ORDER — a deterministic easy-to-hard training order
    * with difficulty mixing: docs are scored by token count (short ≈
    * easy — swap in any integer difficulty), cut into `nBuckets`
    * difficulty tiers (ntile over the (score, doc_id) total order), and
    * the final position round-robins ACROSS tiers —
    * `pos = (rank_within_tier − 1) · nBuckets + tier` — so every
    * consecutive stretch of the schedule touches every tier while still
    * front-loading each tier's own easiest docs (the standard
    * anti-curriculum-collapse interleave: pure sorted-by-difficulty
    * training destabilizes early optimization). Within a tier the order
    * is a content-seeded shuffle — md5 of the doc id, RNG-free like
    * [[epochShuffle]] — so the schedule is reproducible on any engine
    * and cluster layout.
    *
    * Shape: token counts are map-only; the tier cut needs a GLOBAL
    * rank over (score, id), which is computed with the blocked
    * two-pass recipe ([[graft.ops.EventsOps.acfByKey]] /
    * [[graft.ops.Ffill.ffillBlocked]]): score-range blocks
    * (`n_tokens div blockTokens` — monotone, so blocks partition the
    * sort order) rank in parallel windows and a carry over the bounded
    * per-block count summary restores the global rank; Spark's exact
    * ntile arithmetic (first n mod k buckets one row larger) is then
    * replayed from (rank, n) in pure integers — NO single-partition
    * corpus window anywhere. Within-tier windows partition on the
    * tier. A pathologically constant-score corpus degrades to one
    * block (the old envelope); compose a wider difficulty score there.
    *
    * Returns (doc_id, n_tokens, tier 1-based, curriculum_pos 1-based)
    * — curriculum_pos is a total order (dense in 1..n when tiers are
    * equal-sized, gap-free per round-robin cycle otherwise). */
  def curriculumOrder(
      docs: DataFrame,
      nBuckets: Int = 10,
      idCol: String = "doc_id",
      textCol: String = "text",
      blockTokens: Long = 64L): DataFrame = {
    require(nBuckets >= 1, s"curriculumOrder: need nBuckets >= 1, got $nBuckets")
    require(blockTokens >= 1, s"curriculumOrder: need blockTokens >= 1, got $blockTokens")
    import org.apache.spark.sql.expressions.Window
    val scored = docs
      .select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("_blk", expr(s"n_tokens div ${blockTokens}L"))
    val wIn = Window.partitionBy(col("_blk")).orderBy(col("n_tokens"), col(idCol))
    // #blocks-bounded ladders (n_tokens div blockTokens distinct blocks)
    val wCarry = Window.orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val carry = scored.groupBy(col("_blk")).agg(count(lit(1)).as("_bc"))
      .withColumn("_carry", coalesce(sum(col("_bc")).over(wCarry), lit(0L)))
      .withColumn("_n", sum(col("_bc")).over(wAll))
      .select(col("_blk"), col("_carry"), col("_n"))
    // Spark's ntile, replayed: with q = n div k and m = n mod k the
    // first m buckets hold q+1 rows; rank → bucket is two integral
    // divisions (the q = 0 small-n case never reaches the ELSE branch)
    val inTier = Window.partitionBy(col("tier"))
      .orderBy(col("_h"), col(idCol))
    scored
      .withColumn("_rnIn", row_number().over(wIn).cast("long"))
      .join(broadcast(carry), Seq("_blk"))
      .withColumn("_rank", col("_rnIn") + col("_carry"))
      .withColumn("tier", expr(
        s"CAST(CASE WHEN _rank <= (_n % $nBuckets) * (_n div $nBuckets + 1) " +
          s"THEN (_rank - 1) div (_n div $nBuckets + 1) + 1 " +
          s"ELSE (_n % $nBuckets) + (_rank - (_n % $nBuckets) * (_n div $nBuckets + 1) - 1) " +
          s"div (_n div $nBuckets) + 1 END AS INT)"))
      .withColumn("_h", md5(col(idCol).cast("string")))
      .withColumn("curriculum_pos",
        (row_number().over(inTier).cast("long") - 1L) * nBuckets + col("tier"))
      .select(col(idCol), col("n_tokens"), col("tier"), col("curriculum_pos"))
  }

  /** JENSEN–SHANNON DIVERGENCE between the unigram distributions of two
    * corpus slices — the symmetric, always-finite "how different are
    * these two sources really" number (Lin 1991): JS(P,Q) =
    * ½KL(P‖M) + ½KL(Q‖M) with M the even mixture. Unlike KL it never
    * blows up on a token one side lacks (the mixture is nonzero
    * wherever either side is), and it is bounded by ln 2 — directly
    * comparable across source pairs. The pre-training read: a mixture
    * weight decision ([[mixSources]]) or a drift alarm between two
    * crawl snapshots starts from exactly this number; PSI/KS
    * ([[graft.ops.Governance]]) watch one numeric column, this watches
    * the whole vocabulary.
    *
    * Float policy ([[graft.ops.Governance.mutualInformation]]'s): token
    * counts and totals exact; each token's two pointwise terms put the
    * INTEGER cross-ratio `2·cā·n_b / (c_a·n_b + c_b·n_a)` inside one
    * `ln` (operands cast to double in fixed order), weight `c/n` as an
    * exact rational, round-6 per term; side sums add the ROUNDED terms
    * and `js_nats_micro` is the FLOORED
    * micro half-sum `floor((sa+sb)·5×10⁵)` — a pure function of the
    * shared double. (Rounding the half-sum instead would sit exactly on
    * a .5×10⁻⁶ boundary whenever the two round-6 grid sums are an odd
    * micro apart, where Spark's decimal-string HALF_UP and DuckDB's
    * binary-double rounding disagree — measured on the p295 fr–zh cell.
    * The floor may land one ulp below the exact integer; deterministic
    * on every engine, which is the contract.) A token absent from a
    * side contributes zero to that side (lim x·ln x = 0).
    *
    * Shape: one (token, side) conditional partial agg — the only
    * corpus-sized stage — then windows and the final fold ride the
    * vocabulary-bounded count table. Both slices must hold ≥ 1 token:
    * one-sided input raises in-plan (a silent 0 or NaN would read as
    * "identical"/"broken"). Empty input → empty output.
    *
    * Returns ONE row (group_a, group_b, tokens_a, tokens_b, vocab_size,
    * js_nats_micro). */
  def jsDivergence(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    require(groupA != groupB, "jsDivergence: need two distinct slices")
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .where(col(groupCol).isin(groupA, groupB) && col(textCol).isNotNull)
      .select(col(groupCol).cast("string").as("_g"),
        explode(TextAnalysis.tokens(col(textCol))).as("_t"))
      .where(col("_t") =!= "")
    val cells = toks.groupBy(col("_t"))
      .agg(sum(when(col("_g") === groupA, 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_g") === groupB, 1L).otherwise(0L)).as("_cb"))
    val wAll = Window.partitionBy()
    val terms = cells
      .withColumn("_na", sum(col("_ca")).over(wAll))
      .withColumn("_nb", sum(col("_cb")).over(wAll))
      .selectExpr("_na", "_nb",
        "CASE WHEN _ca = 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
          "round((CAST(_ca AS DOUBLE) / _na) * ln(2.0d * _ca * _nb / " +
          "(CAST(_ca AS DOUBLE) * _nb + CAST(_cb AS DOUBLE) * _na)), 6) + 0.0 " +
          "END AS _ta",
        "CASE WHEN _cb = 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
          "round((CAST(_cb AS DOUBLE) / _nb) * ln(2.0d * _cb * _na / " +
          "(CAST(_ca AS DOUBLE) * _nb + CAST(_cb AS DOUBLE) * _na)), 6) + 0.0 " +
          "END AS _tb")
    terms
      .groupBy(lit(groupA).as("group_a"), lit(groupB).as("group_b"))
      .agg(max(col("_na")).as("_na"), max(col("_nb")).as("_nb"),
        count(lit(1)).as("vocab_size"),
        (round(sum(col("_ta")), 6) + lit(0.0d)).as("_sa"),
        (round(sum(col("_tb")), 6) + lit(0.0d)).as("_sb"))
      .select(col("group_a"), col("group_b"),
        when(col("_na") === 0L || col("_nb") === 0L,
          raise_error(lit("jsDivergence: both slices need at least one " +
            "token"))).otherwise(col("_na")).as("tokens_a"),
        col("_nb").as("tokens_b"), col("vocab_size"),
        floor((col("_sa") + col("_sb")) * lit(500000.0d)).cast("long")
          .as("js_nats_micro"))
  }

  /** PAIRWISE JENSEN–SHANNON MATRIX over ALL slices of `groupCol` —
    * [[jsDivergence]] for every unordered pair at once, the
    * mixture-design table: sources with near-zero mutual JS are
    * redundant (dedup or down-weight one), the far-from-everything
    * source is the diversity you cannot replace. Every cell is
    * BIT-IDENTICAL to the 2-slice op on the same pair (the per-token
    * round-6 terms are the same expressions — spec-pinned), so the
    * matrix is the batch form, not an approximation.
    *
    * Shape: ONE (group, token) partial agg is the only corpus-sized
    * stage. Each of its rows is then replicated to the ≤ G−1 pairs
    * containing its group via two broadcast joins against the
    * pair list — the working set is vocab × G(G−1)/2 cells, which is
    * why `maxGroups` (default 20) raises in-plan on breach: the G²
    * fan-out is the declared contract, exactly the
    * [[graft.ops.Stats.bradleyTerry]] items² idiom. Windows and folds
    * ride the cell table only. Empty input → empty output; a group
    * with zero tokens simply has no rows, so every emitted pair has
    * both sides non-empty by construction (no in-plan raise needed —
    * contrast the 2-slice op, where a named-but-absent slice must fail
    * loudly).
    *
    * Returns one row per pair (group_a, group_b, tokens_a, tokens_b,
    * vocab_size, js_nats_micro) ordered by (group_a, group_b),
    * group_a < group_b lexicographically. */
  def jsDivergenceMatrix(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      maxGroups: Int = 20): DataFrame = {
    require(maxGroups >= 2 && maxGroups <= 100,
      s"jsDivergenceMatrix: maxGroups must be in [2, 100], got $maxGroups")
    import org.apache.spark.sql.expressions.Window
    // persisted: three consumers (group list + both join sides) would
    // otherwise re-run the corpus-sized token aggregation each — the
    // only corpus-sized stage, measured 2× the op's cost at ×20 docs.
    // Vocabulary × G rows; the pageRank persist lifecycle (GC-released).
    val counts = df
      .where(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).cast("string").as("_g"),
        explode(TextAnalysis.tokens(col(textCol))).as("_t"))
      .where(col("_t") =!= "")
      .groupBy(col("_g"), col("_t")).agg(count(lit(1)).as("_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = counts.select(col("_g")).distinct()
    val gGuard = groups.agg(count(lit(1)).as("_ng"))
    val gl = groups.crossJoin(broadcast(gGuard))
      .select(when(col("_ng") > maxGroups, raise_error(concat(
        lit(s"jsDivergenceMatrix: more than $maxGroups groups ("),
        col("_ng").cast("string"),
        lit(") — the G^2 pair fan-out is the working-set contract"))))
        .otherwise(col("_g")).as("_g"))
    val pairs = gl.as("x").join(gl.as("y"),
        col("x._g") < col("y._g"))
      .select(col("x._g").as("_ga"), col("y._g").as("_gb"))
    val sideA = counts.join(broadcast(pairs), col("_g") === col("_ga"))
      .select(col("_ga"), col("_gb"), col("_t"),
        col("_c").as("_ca"), lit(0L).as("_cb"))
    val sideB = counts.join(broadcast(pairs), col("_g") === col("_gb"))
      .select(col("_ga"), col("_gb"), col("_t"),
        lit(0L).as("_ca"), col("_c").as("_cb"))
    val cells = sideA.unionByName(sideB)
      .groupBy(col("_ga"), col("_gb"), col("_t"))
      .agg(sum(col("_ca")).as("_ca"), sum(col("_cb")).as("_cb"))
    val wPair = Window.partitionBy(col("_ga"), col("_gb"))
    val terms = cells
      .withColumn("_na", sum(col("_ca")).over(wPair))
      .withColumn("_nb", sum(col("_cb")).over(wPair))
      .selectExpr("_ga", "_gb", "_na", "_nb",
        "CASE WHEN _ca = 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
          "round((CAST(_ca AS DOUBLE) / _na) * ln(2.0d * _ca * _nb / " +
          "(CAST(_ca AS DOUBLE) * _nb + CAST(_cb AS DOUBLE) * _na)), 6) + 0.0 " +
          "END AS _ta",
        "CASE WHEN _cb = 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
          "round((CAST(_cb AS DOUBLE) / _nb) * ln(2.0d * _cb * _na / " +
          "(CAST(_ca AS DOUBLE) * _nb + CAST(_cb AS DOUBLE) * _na)), 6) + 0.0 " +
          "END AS _tb")
    terms
      .groupBy(col("_ga").as("group_a"), col("_gb").as("group_b"))
      .agg(max(col("_na")).as("tokens_a"), max(col("_nb")).as("tokens_b"),
        count(lit(1)).as("vocab_size"),
        (round(sum(col("_ta")), 6) + lit(0.0d)).as("_sa"),
        (round(sum(col("_tb")), 6) + lit(0.0d)).as("_sb"))
      .select(col("group_a"), col("group_b"), col("tokens_a"),
        col("tokens_b"), col("vocab_size"),
        floor((col("_sa") + col("_sb")) * lit(500000.0d)).cast("long")
          .as("js_nats_micro"))
      .orderBy("group_a", "group_b")
  }

  /** ZIPF SLOPE — the discrete power-law exponent of the token
    * frequency distribution by maximum likelihood:
    * α̂ = 1 + n · [Σ ln(f_i / (xmin − ½))]⁻¹ over the n types with
    * frequency ≥ xmin (Clauset, Shalizi & Newman 2009, eq. 3.7 — the
    * continuous-MLE discrete approximation, accurate for xmin ≥ ~5),
    * with the large-n standard error (α̂ − 1)/√n (eq. 3.2). Natural
    * language sits near α ≈ 2 (Zipf's law: rank-frequency slope ≈ 1);
    * a corpus that drifts far off is telling you something — α ≫ 2 is
    * repetitive/templated text (mass concentrated in few types),
    * α ≈ 1.6–1.8 is heavy boilerplate-free prose. The same number also
    * prices the vocabulary tail ([[vocabTailMass]] measures it at one
    * k; α extrapolates it).
    *
    * Float policy: frequencies exact; each type contributes one
    * round-6 `ln(f / (xmin − 0.5))` (f integer, the literal half-offset
    * the only non-integer operand), the sum adds ROUNDED terms,
    * `alpha` is round-6 of `1 + n/sum` off the round-6 sum, and
    * `alpha_se` is round-6 of `(alpha − 1)/√n` off the ROUNDED alpha —
    * every downstream number derives from an already-pinned one.
    *
    * Shape: one token partial-agg count (the only corpus-sized stage);
    * the MLE folds over the vocabulary-bounded frequency table. No type
    * reaches xmin (or empty input) → EMPTY output — a fit on zero tail
    * types has no estimator, and an absent row is honest where a NULL
    * α would read as "computed, undefined".
    *
    * Returns ONE row (xmin, n_types, alpha, alpha_se). */
  def zipfSlope(
      df: DataFrame,
      textCol: String = "text",
      xmin: Long = 5L): DataFrame = {
    require(xmin >= 1L, s"zipfSlope: xmin must be >= 1, got $xmin")
    val freq = df
      .where(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("_t"))
      .where(col("_t") =!= "")
      .groupBy(col("_t")).agg(count(lit(1)).as("_f"))
      .where(col("_f") >= xmin)
    freq
      .groupBy(lit(xmin).as("xmin"))
      .agg(count(lit(1)).as("n_types"),
        (round(sum(round(log(col("_f").cast("double") / lit(xmin - 0.5d)), 6)
          + lit(0.0d)), 6) + lit(0.0d)).as("_s"))
      .withColumn("alpha",
        round(lit(1.0d) + col("n_types").cast("double") / col("_s"), 6)
          + lit(0.0d))
      .select(col("xmin"), col("n_types"), col("alpha"),
        (round((col("alpha") - lit(1.0d)) /
          sqrt(col("n_types").cast("double")), 6) + lit(0.0d)).as("alpha_se"))
  }

  /** UNSEEN-VOCABULARY estimate — how much vocabulary has this corpus
    * NOT seen yet? Two classical estimators off the singleton/doubleton
    * counts, INTEGER-EXACT: Good–Turing sample coverage
    * C = 1 − f₁/N (Gale & Sampson 1995 — the unseen-probability mass
    * is the singleton share) and the bias-corrected Chao1 richness
    * floor V + f₁(f₁−1)/(2(f₂+1)) (Chao 1984; the +1 form is defined
    * at f₂ = 0 and is the EstimateS default). The curation read:
    * coverage says whether another crawl of the same source can still
    * pay ([[vocabGrowth]] draws the curve, this prices its asymptote),
    * and Chao1 minus V is the expected novel-type yield.
    *
    * Both estimates are floored micro/ppm integral divisions of exact
    * counts — no floats anywhere. Shape: one token partial-agg count
    * (the only corpus-sized stage), then one fold over the
    * vocabulary-bounded frequency table. Empty corpus → empty output.
    *
    * Returns ONE row (n_tokens, v_types, f1_singletons, f2_doubletons,
    * chao1_est_micro, coverage_ppm). */
  def vocabUnseen(df: DataFrame, textCol: String = "text"): DataFrame = {
    val freq = df
      .where(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("_t"))
      .where(col("_t") =!= "")
      .groupBy(col("_t")).agg(count(lit(1)).as("_f"))
    freq
      .groupBy(lit(1).as("_one"))
      .agg(sum(col("_f")).as("n_tokens"),
        count(lit(1)).as("v_types"),
        sum(when(col("_f") === 1L, 1L).otherwise(0L)).as("f1_singletons"),
        sum(when(col("_f") === 2L, 1L).otherwise(0L)).as("f2_doubletons"))
      .selectExpr("n_tokens", "v_types", "f1_singletons", "f2_doubletons",
        "v_types * 1000000 + f1_singletons * (f1_singletons - 1) * 1000000 " +
          "div (2 * (f2_doubletons + 1)) AS chao1_est_micro",
        "1000000 - f1_singletons * 1000000 div n_tokens AS coverage_ppm")
  }
}
