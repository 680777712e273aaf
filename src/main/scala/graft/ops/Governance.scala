package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-governance screens a training-data pipeline runs before a
  * corpus ships: re-identification risk (k-anonymity over
  * quasi-identifier combinations), distribution drift between corpus
  * snapshots (population stability index), data-contract drift (null
  * profiles), and label quality (Cohen's kappa). Complements the
  * content-level screens ([[TextAnalysis.piiStats]] redacts PII inside
  * text; this audits the STRUCTURED columns around it). */
object Governance {

  /** K-ANONYMITY audit: every quasi-identifier equivalence class whose
    * row count is below `k` — the classes whose members a linkage
    * attack can single out, the standard pre-release re-identification
    * screen (Sweeney's k-anonymity). This REPORTS violations
    * (suppression/generalization is a policy decision for the caller);
    * `n_rows` tells the cost of suppressing the class outright.
    *
    * Shape: one partial-agg count shuffle on the QI tuple — map-side
    * combine absorbs duplicate tuples, the violation filter runs on the
    * |classes|-bounded aggregate, and nothing resembling a row-level
    * join or window exists. At 100 TB parallelism = #classes; a
    * heavily-duplicated QI tuple is exactly the class the filter
    * discards earliest. All-integer output.
    *
    * Returns (qiCols..., n_rows) for classes with n_rows < k. */
  def kAnonymityAudit(
      df: DataFrame,
      qiCols: Seq[String],
      k: Long): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityAudit: need at least one quasi-identifier")
    require(k >= 2, s"kAnonymityAudit: k < 2 flags nothing, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") < k)
  }

  /** NULL-PROFILE of named columns: one row per column with its null
    * count and ppm rate — the per-snapshot half of a data contract.
    * ONE aggregate pass over the data however many columns are profiled
    * (each column contributes one conditional-sum aggregate; the row
    * count is shared), then a map-only explode of the single result row
    * into the per-column report. All-integer (ppm by integral division;
    * empty input reports NULL rates, not a division error). */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullProfile: need at least one column")
    val aggs = count(lit(1)).as("_n") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("_n"), explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(s"_null_$c").as("n_nulls"))): _*)).as("_e"))
      .select(col("_e.col_name").as("col_name"),
        col("_n").as("n_rows"),
        coalesce(col("_e.n_nulls"), lit(0L)).as("n_nulls"))
      .selectExpr("col_name", "n_rows", "n_nulls",
        "CASE WHEN n_rows = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE n_nulls * 1000000 div n_rows END AS null_ppm")
  }

  /** NULL-profile DRIFT between two snapshots — the data-contract
    * tripwire ("the upstream export started nulling `value`") that PSI's
    * value-distribution lens cannot see, because a null row simply
    * leaves the histogram. One [[nullProfile]] pass per side, joined on
    * the |cols|-bounded column name. `drift_ppm` is signed
    * (cur − ref); both sides empty ⇒ NULL rates propagate as NULL
    * drift. Returns (col_name, ref_null_ppm, cur_null_ppm, drift_ppm),
    * column-ordered. */
  def nullDrift(ref: DataFrame, cur: DataFrame, cols: Seq[String]): DataFrame =
    nullProfile(ref, cols).select(col("col_name"), col("null_ppm").as("ref_null_ppm"))
      .join(nullProfile(cur, cols).select(col("col_name"), col("null_ppm").as("cur_null_ppm")),
        Seq("col_name"))
      .withColumn("drift_ppm", col("cur_null_ppm") - col("ref_null_ppm"))
      .orderBy("col_name")

  /** COHEN'S KAPPA between two label columns — the inter-annotator
    * agreement statistic a labeled-data QC step reports before anyone
    * trains on the labels (raw percent agreement over-credits
    * imbalanced label sets; kappa subtracts the chance-agreement
    * floor).
    *
    * INTEGER-EXACT via the rational form: with N rows, A agreeing rows,
    * and P = Σ_label n_a(label)·n_b(label) the joint marginal product,
    *
    *   κ = (A/N − P/N²) / (1 − P/N²) = (A·N − P) / (N² − P)
    *
    * — numerator and denominator are plain BIGINT products (DECIMAL(38)
    * here so N up to ~10⁹ with ppm scaling cannot wrap), reported as
    * `kappa_ppm` by integral division with the [[EventsOps.groupTrend]]
    * re-sign recipe (truncate-toward-zero on both engines; κ can be
    * negative). N² = P (chance agreement 1 — a single marginal class on
    * both sides) reports NULL, the statistic's own undefined case.
    *
    * Shape: one count aggregate for (N, A) + two label-vocab-sized
    * marginal counts joined on the label value, all folded to scalars
    * that meet in a 1-row broadcast cross join — corpus data is
    * touched twice, map-only, nothing row-scaled ever joins.
    * NULL labels count as a real label value on both sides (two NULLs
    * agree), matching the SQL `IS NOT DISTINCT FROM` the oracle uses.
    *
    * Returns one row (n, n_agree, kappa_ppm). */
  def cohenKappa(
      df: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = DecimalType(38, 0)
    val base = df.select(col(aCol).as("_a"), col(bCol).as("_b"))
    val totals = base.agg(
      count(lit(1)).as("n"),
      sum(when(col("_a") <=> col("_b"), 1L).otherwise(0L)).as("n_agree"))
    val na = base.groupBy(col("_a").as("_l")).agg(count(lit(1)).as("_na"))
    val nb = base.groupBy(col("_b").as("_lb")).agg(count(lit(1)).as("_nb"))
    val pe = na.join(nb, col("_l") <=> col("_lb"))
      .agg(coalesce(sum(col("_na").cast(d) * col("_nb").cast(d)), lit(0).cast(d)).as("_p"))
    totals.crossJoin(broadcast(pe))
      .selectExpr("n", "n_agree",
        // the groupTrend re-sign recipe: divide non-negative magnitudes,
        // re-apply the sign — Spark div truncates, DuckDB // floors, and
        // only non-negative operands make them agree for negative kappa
        "CASE WHEN CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) - _p = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(CASE WHEN CAST(n_agree AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) - _p >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(abs(CAST(n_agree AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) - _p) * 1000000 div " +
          "(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) - _p) AS BIGINT) END AS kappa_ppm")
  }

  /** KRIPPENDORFF'S α (nominal data) — multi-rater reliability with
    * MISSING ratings, the generalization [[cohenKappa]] (exactly two
    * columns, fully crossed) cannot cover: any number of raters, any
    * unit rated by any subset of them. α = 1 − D_o/D_e over the
    * coincidence matrix: each pairable unit u (n_u ≥ 2 ratings)
    * contributes its discordant ordered pairs with weight 1/(n_u − 1);
    * expected disagreement comes from the label marginals.
    *
    * INTEGER-EXACT despite the per-unit 1/(n_u − 1) weights: every
    * term is pre-scaled by L = lcm(1 .. maxRatingsPerUnit − 1) — a
    * CONSTANT ≤ 720720 — so `A_u · (L div (n_u − 1))` is an exact
    * integer (the divisor always divides L; a unit exceeding the cap
    * raises IN-PLAN rather than silently rounding). With
    * A_u = n_u(n_u−1) − Σ_c c_uc(c_uc−1):
    * α = 1 − (n−1)·Σ_u A_u/(n_u−1) / (n² − Σ_c n_c²), computed as one
    * re-signed integral division of DECIMAL(38,0) L-scaled terms
    * (headroom: n²·L·10⁶ ≤ 10³⁸ up to n ≈ 10¹³ pairable ratings).
    *
    * Shape: one (unit, label) partial agg, a unit-keyed fold, a
    * label-marginal fold over the same count table, two scalar
    * broadcasts. Corpus touched once. NULL labels are missing ratings
    * (dropped); α NULL when D_e = 0 (single label or nothing
    * pairable); α < 0 (systematic disagreement) keeps its sign via the
    * [[cohenKappa]] re-sign recipe.
    *
    * Returns one row (n_units, n_values, n_labels, alpha_ppm). */
  def krippendorffAlpha(
      df: DataFrame,
      unitCol: String,
      labelCol: String,
      maxRatingsPerUnit: Int = 16): DataFrame = {
    require(maxRatingsPerUnit >= 2 && maxRatingsPerUnit <= 17,
      s"krippendorffAlpha: need maxRatingsPerUnit in [2, 17] (L = lcm fits a " +
        s"compile-time Long), got $maxRatingsPerUnit")
    import org.apache.spark.sql.types.DecimalType
    val d = DecimalType(38, 0)
    val L = (1 until maxRatingsPerUnit)
      .foldLeft(BigInt(1))((a, b) => a * BigInt(b) / a.gcd(BigInt(b))).toLong
    val base = df.select(col(unitCol).as("_u"), col(labelCol).as("_l"))
      .where(col("_l").isNotNull)
    val ul = base.groupBy(col("_u"), col("_l")).agg(count(lit(1)).as("_c"))
    val per = ul.groupBy(col("_u"))
      .agg(sum(col("_c")).as("_nu"),
        sum(col("_c") * (col("_c") - 1)).as("_cc"))
      .where(col("_nu") >= 2)
    val term = expr(
      s"(_nu * (_nu - 1) - _cc) * (CASE WHEN _nu <= $maxRatingsPerUnit " +
        s"THEN $L div (_nu - 1) " +
        "ELSE CAST(raise_error('krippendorffAlpha: a unit exceeds " +
        "maxRatingsPerUnit — raise the cap') AS BIGINT) END)")
    val totals = per.agg(
      coalesce(sum(term.cast(d)), lit(0).cast(d)).as("_dol"),
      coalesce(sum(col("_nu")), lit(0L)).as("_n"),
      count(lit(1)).as("n_units"))
    val marg = ul.join(per.select("_u"), Seq("_u"))
      .groupBy(col("_l")).agg(sum(col("_c")).as("_nc"))
      .agg(coalesce(sum(col("_nc").cast(d) * col("_nc").cast(d)), lit(0).cast(d))
          .as("_snc2"),
        count(lit(1)).as("n_labels"))
    totals.crossJoin(broadcast(marg))
      .selectExpr("n_units", "_n AS n_values", "n_labels",
        // de = (n² − Σn_c²)·L; do = Σ L-scaled discordance · (n−1);
        // α = (de − do)/de, re-signed for the engines' div/floor split
        s"CASE WHEN (CAST(_n AS DECIMAL(38,0)) * CAST(_n AS DECIMAL(38,0)) - _snc2) * $L = 0 " +
          "THEN CAST(NULL AS BIGINT) ELSE " +
          s"CAST(CASE WHEN (CAST(_n AS DECIMAL(38,0)) * CAST(_n AS DECIMAL(38,0)) - _snc2) * $L - _dol * (_n - 1) >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          s"CAST(abs((CAST(_n AS DECIMAL(38,0)) * CAST(_n AS DECIMAL(38,0)) - _snc2) * $L - _dol * (_n - 1)) * 1000000 div " +
          s"((CAST(_n AS DECIMAL(38,0)) * CAST(_n AS DECIMAL(38,0)) - _snc2) * $L) AS BIGINT) END AS alpha_ppm")
  }

  /** POPULATION STABILITY INDEX between a reference and a current
    * snapshot of one numeric column, over caller-fixed bucket edges:
    * `PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)` — the drift tripwire that
    * tells a recurring curation run "this month's corpus is not last
    * month's distribution" (PSI > 0.2 is the conventional alarm).
    *
    * Buckets are closed-open `[lo, hi)` over `edges` plus two unbounded
    * tail buckets — edges are DATA, passed in, so the report is
    * reproducible across runs and engines (deriving edges from
    * quantiles of the reference is one `approx_quantile` call away and
    * deliberately out of this operator). Empty buckets are
    * Laplace-smoothed by half a count on BOTH sides before
    * normalization, the standard guard that keeps ln finite without
    * ever zeroing a real contribution.
    *
    * Float policy: the only non-integer step is the final
    * `(p−q)·ln(p/q)` with FIXED operand order, reported round-6 (+0.0
    * to fold −0.0) — the [[CorpusOps.bm25TopK]] cross-engine contract:
    * the last-ulp wobble of ln would need two snapshots within ~1e-15
    * relative PSI to flip a rendered digit.
    *
    * Shape: one partial-agg count per side on the bucket id (map-side
    * combine collapses each partition to ≤ |edges|+2 rows), a
    * |buckets|-sized outer join, and scalar totals broadcast back —
    * corpus-sized data is touched exactly twice, map-only.
    *
    * Returns (bucket, ref_n, cur_n, psi_term) per bucket, bucket-
    * ordered; `SUM(psi_term)` is the index. */
  def psiDrift(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      edges: Seq[Double]): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      s"psiDrift: edges must be non-empty, sorted, distinct — got $edges")
    def bucketOf(c: Column): Column =
      edges.foldLeft(lit(0))((acc, e) => acc + when(c >= e, 1).otherwise(0))
    def sideCounts(df: DataFrame, as: String): DataFrame =
      df.where(col(valueCol).isNotNull)
        .groupBy(bucketOf(col(valueCol).cast("double")).as("bucket"))
        .agg(count(lit(1)).as(as))
    val joined = sideCounts(ref, "ref_n")
      .join(sideCounts(cur, "cur_n"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    // scalar totals ride the plan as a 1-row broadcast cross join (the
    // conversionLatency recipe) — construction stays lazy, no .first()
    val totals = joined.agg(
      sum(col("ref_n")).as("_rt"), sum(col("cur_n")).as("_ct"),
      count(lit(1)).as("_nb"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("ref_n"), col("cur_n"), {
        // half-count smoothing on both sides, SAME denominator form:
        // p = (n + 0.5) / (total + 0.5·buckets)
        val p = (col("ref_n").cast("double") + lit(0.5)) /
          (col("_rt").cast("double") + lit(0.5) * col("_nb").cast("double"))
        val q = (col("cur_n").cast("double") + lit(0.5)) /
          (col("_ct").cast("double") + lit(0.5) * col("_nb").cast("double"))
        (round((p - q) * log(p / q), 6) + 0.0).as("psi_term")
      })
      .orderBy("bucket")
  }

  /** CRAMÉR'S V — the 0..1 association strength between two
    * categorical columns (the r×c generalization of the 2×2 χ² gate):
    * the profiling answer to "is `source` just `lang` in disguise?"
    * before anyone joins, stratifies, or drops a column. NULL is a
    * real category on both axes (an association carried by
    * missingness is still an association).
    *
    * Exactness: the contingency table, margins, and n are integers;
    * each cell's χ² term is the exact scaled rational
    * ((o·n − rᵢ·cⱼ)²·1e6) div (rᵢ·cⱼ·n) in DECIMAL(38,0) (numerators
    * are squares, so truncating div ≡ floor), summed to chi2_micro.
    * V = sqrt(χ²/(n·min(r−1, c−1))) is the declared float tail,
    * round-6.
    *
    * Shape: ONE partial-agg count on the (a, b) pair; margins and
    * totals are aggregates/windows over that cells-bounded table —
    * corpus rows are touched once. Returns ONE row:
    * (col_a, col_b, n, r, c, chi2_micro, cramers_v); V NULL when
    * either axis has a single category. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = DecimalType(38, 0)
    val cells = df
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_o"))
    val wa = org.apache.spark.sql.expressions.Window.partitionBy(col("_a"))
    val wb = org.apache.spark.sql.expressions.Window.partitionBy(col("_b"))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    cells
      .withColumn("_ri", sum(col("_o")).over(wa))
      .withColumn("_cj", sum(col("_o")).over(wb))
      .withColumn("_n", sum(col("_o")).over(wAll))
      .withColumn("_term", {
        val dev = col("_o").cast(d) * col("_n").cast(d) -
          col("_ri").cast(d) * col("_cj").cast(d)
        dev * dev * lit(1000000L).cast(d)
      })
      .agg(
        max(col("_n")).as("n"),
        // count_distinct skips NULL, but NULL is a category here —
        // add the null group back explicitly on each axis
        (count_distinct(col("_a")) +
          max(when(col("_a").isNull, 1L).otherwise(0L))).as("r"),
        (count_distinct(col("_b")) +
          max(when(col("_b").isNull, 1L).otherwise(0L))).as("c"),
        sum(expr(
          "CAST(_term div (CAST(_ri AS DECIMAL(38,0)) * _cj * _n) AS DECIMAL(38,0))"))
          .as("_chi2_obs"),
        // ABSENT cells (o = 0) contribute (0−e)²/e = e each; their
        // total is n − Σ_observed e, so no r×c enumeration is needed —
        // omitting them is the classic sparse-contingency χ² bug
        sum(expr(
          "CAST((CAST(_ri AS DECIMAL(38,0)) * _cj * 1000000) div _n AS DECIMAL(38,0))"))
          .as("_e_obs_micro"))
      .select(lit(aCol).as("col_a"), lit(bCol).as("col_b"),
        col("n"), col("r"), col("c"),
        (col("_chi2_obs") +
          (col("n").cast(DecimalType(38, 0)) * lit(1000000L).cast(DecimalType(38, 0)) -
            col("_e_obs_micro"))).cast("long").as("chi2_micro"))
      .select(col("col_a"), col("col_b"),
        col("n"), col("r"), col("c"), col("chi2_micro"), {
          val dof = least(col("r"), col("c")).cast("double") - lit(1.0d)
          when(col("r") < 2 || col("c") < 2, lit(null).cast("double"))
            .otherwise(round(sqrt(col("chi2_micro").cast("double") / lit(1.0e6d) /
              (col("n").cast("double") * dof)), 6) + lit(0.0d))
            .as("cramers_v")
        })
  }

  /** NULL-PATTERN mining: row counts per missingness COMBINATION over
    * the audited columns — the step beyond [[nullProfile]]'s per-column
    * rates: "value and props are always missing TOGETHER" (one upstream
    * join failed) reads completely differently from independent holes,
    * and the pattern table is what imputation strategy and
    * listwise-deletion cost estimates are decided on.
    *
    * Shape: ONE partial-agg count on the boolean mask tuple — at most
    * 2^|cols| groups leave the map side — and the share denominator
    * rides a window over that bounded table. Integer-exact.
    *
    * Returns (has_<col>..., n_rows, share_ppm), most-common first
    * (ties broken by the mask columns ascending). */
  def nullPatterns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullPatterns: need at least one column")
    df.groupBy(cols.map(c => col(c).isNotNull.as(s"has_$c")): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("share_ppm",
        expr("CAST(n_rows * 1000000 div sum(n_rows) OVER () AS BIGINT)"))
      .orderBy(col("n_rows").desc +: cols.map(c => col(s"has_$c").asc): _*)
  }

  /** REFERENTIAL-INTEGRITY audit: orphan rate of a child table's
    * foreign-key column against the parent's key set — the "can I
    * actually join these?" check every pipeline should run before its
    * first inner join silently drops rows. NULL FKs are counted
    * separately (a NULL is a missing link, not an orphan).
    *
    * Shape: one partial-agg count on the child FK (value-bounded df
    * table), one distinct projection of the parent key, and a
    * key-table-sized LEFT join — the child table itself is touched
    * once, map-side-combined; the parent side is its key cardinality.
    * At 100 TB both sides of the join are key-sized, not row-sized.
    *
    * Returns ONE row: (relation, n_child, n_null_fk, n_orphan,
    * orphan_ppm) — orphan_ppm over non-NULL FK rows, NULL when there
    * are none. */
  def refIntegrity(
      child: DataFrame,
      parent: DataFrame,
      fkCol: String,
      pkCol: String,
      relation: String): DataFrame = {
    val fkCounts = child
      .groupBy(col(fkCol).as("_fk"))
      .agg(count(lit(1)).as("_n"))
    val pk = parent.select(col(pkCol).as("_pk")).distinct()
    fkCounts
      .join(pk, col("_fk") === col("_pk"), "left")
      .agg(
        coalesce(sum(col("_n")), lit(0L)).as("n_child"),
        coalesce(sum(when(col("_fk").isNull, col("_n"))), lit(0L)).as("n_null_fk"),
        coalesce(sum(when(col("_fk").isNotNull && col("_pk").isNull, col("_n"))),
          lit(0L)).as("n_orphan"))
      .select(lit(relation).as("relation"), col("n_child"), col("n_null_fk"),
        col("n_orphan"),
        when(col("n_child") - col("n_null_fk") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST(n_orphan * 1000000 div (n_child - n_null_fk) AS BIGINT)"))
          .as("orphan_ppm"))
  }

  /** FUNCTIONAL-DEPENDENCY check: does `detCol` determine `depCol`?
    * Reports the determinant values that map to MORE than one distinct
    * dependent value — the discovery step behind normalization,
    * dictionary extraction, and "is this column safe to drop after a
    * join" decisions. NULL dependents count as one distinct value
    * (two rows (k, NULL) and (k, 'x') are a real violation).
    *
    * Shape: one exact distinct on the (det, dep) PAIR (partial-agg'd,
    * pair-cardinality-bounded), then a count per det over that bounded
    * table — nothing row-sized past the first aggregate. Returns ONE
    * row: (determinant, dependent, n_keys, n_violating_keys,
    * fd_holds). */
  def fdCheck(
      df: DataFrame,
      detCol: String,
      depCol: String): DataFrame = {
    val perKey = df
      .select(col(detCol).as("_det"), col(depCol).as("_dep"))
      .distinct()
      .groupBy(col("_det"))
      .agg(count(lit(1)).as("_nv"))
    perKey.agg(
        count(lit(1)).as("n_keys"),
        coalesce(sum(when(col("_nv") > 1, 1L)), lit(0L)).as("n_violating_keys"))
      .select(lit(detCol).as("determinant"), lit(depCol).as("dependent"),
        col("n_keys"), col("n_violating_keys"),
        (col("n_violating_keys") === 0).as("fd_holds"))
  }

  /** COMPOSITE-KEY uniqueness audit: is `keyCols` a primary key? —
    * duplicate-group count, worst multiplicity, and the dup rate the
    * dedup stage will face. The one-query answer to "can this tuple be
    * my merge key".
    *
    * Shape: one partial-agg count on the key tuple; every statistic
    * folds over the key-cardinality-bounded table. Returns ONE row:
    * (key_cols, n_rows, n_keys, n_dup_rows, max_multiplicity,
    * dup_ppm). */
  def keyUniqueness(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyUniqueness: need at least one key column")
    val g = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_n"))
    g.agg(
        coalesce(sum(col("_n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_keys"),
        coalesce(sum(when(col("_n") > 1, col("_n") - 1)), lit(0L)).as("n_dup_rows"),
        coalesce(max(col("_n")), lit(0L)).as("max_multiplicity"))
      .select(lit(keyCols.mkString(",")).as("key_cols"),
        col("n_rows"), col("n_keys"), col("n_dup_rows"), col("max_multiplicity"),
        when(col("n_rows") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(n_dup_rows * 1000000 div n_rows AS BIGINT)"))
          .as("dup_ppm"))
  }

  /** CARDINALITY PROFILE: per audited column — row count, non-null
    * count, exact distinct count, and the modal value with its share —
    * the first page of any data-profiling report and the input to
    * "should this column be a join key / a dictionary / dropped"
    * decisions. Values are profiled through their canonical STRING
    * rendering so one tidy frame covers heterogeneous column types.
    *
    * Shape: per column, ONE partial-agg count on the value (map-side
    * combine collapses each partition to ≤ |distinct| rows — the
    * boilerplateLines df-table recipe), then every statistic folds
    * over that value-bounded table in a second |distinct|-sized
    * aggregate: n_rows = Σn (null group included), n_distinct = count
    * of non-null groups, and the mode via min(struct(−n, v)) — count
    * desc, value asc tie-break, no sort. Columns scan independently
    * (column-pruned parquet reads); nothing row-sized survives any
    * first aggregate. Integer-exact.
    *
    * Returns one row per column: (col_name, n_rows, n_nonnull,
    * n_distinct, top_value, top_n, top_ppm) — top_* NULL for an
    * all-NULL column; top_ppm is the share of NON-NULL rows. */
  def cardinalityProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cardinalityProfile: need at least one column")
    val profiles = cols.map { c =>
      df.select(col(c).cast("string").as("_v"))
        .groupBy(col("_v"))
        .agg(count(lit(1)).as("_n"))
        .agg(
          coalesce(sum(col("_n")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("_v").isNotNull, col("_n"))), lit(0L)).as("n_nonnull"),
          count(col("_v")).as("n_distinct"),
          min(when(col("_v").isNotNull,
            struct((-col("_n")).as("_neg"), col("_v").as("_val")))).as("_best"))
        .select(
          lit(c).as("col_name"), col("n_rows"), col("n_nonnull"), col("n_distinct"),
          col("_best._val").as("top_value"),
          (-col("_best._neg")).as("top_n"),
          when(col("n_nonnull") === 0, lit(null).cast("long"))
            .otherwise(expr("CAST((0 - _best._neg) * 1000000 div n_nonnull AS BIGINT)"))
            .as("top_ppm"))
    }
    profiles.reduce(_.unionByName(_)).orderBy("col_name")
  }

  /** BENFORD first-significant-digit screen over a positive numeric
    * column — the classic fabricated-numbers tripwire (invoices,
    * expense lines, vote tallies): natural multi-scale magnitudes put
    * ~30.1% of first digits at 1, falling to 4.6% at 9; hand-typed or
    * synthesized figures don't. Reports the per-digit observed vs
    * Benford distribution plus the global χ² in micro-points.
    *
    * Integer-exact throughout: the first digit comes from the DECIMAL
    * STRING of the micro-quantized magnitude (`substring(cast(floor(
    * |v|·1e6) as string), 1, 1)`) — no log10, whose last-ulp wobble
    * differs across libm builds; integer→string is exact in every
    * engine. Benford probabilities are the universal constants
    * round(log10(1+1/d)·1e6) HARDCODED identically here and in the
    * oracle (they sum to exactly 1e6), so no engine evaluates a
    * transcendental. χ² = Σ_d (n_d − p_d·N)²/(p_d·N) is computed in
    * scaled integers: with o_d = n_d·1e6 and e_d = p_ppm(d)·N,
    * χ²·1e6 = Σ (o_d − e_d)² div e_d — numerators are squares (≥ 0), so
    * truncating div ≡ floor div. DECIMAL(38,0) headroom: (o−e)² tops
    * out ~1e24 at a billion rows.
    *
    * Shape: one map-only digit projection, one partial-agg count on the
    * 9-value digit key, and the scalar total rides a 9-row window — the
    * corpus is touched once. All 9 digits are emitted even at zero
    * observations (χ² includes their expected mass).
    *
    * Returns 9 rows (digit, n_obs, obs_ppm, benford_ppm, chi2_micro)
    * with chi2_micro the suite-wide global repeated per row; zero
    * qualifying values ⇒ NULL obs_ppm/chi2_micro. */
  def benfordScreen(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = DecimalType(38, 0)
    // round(log10(1 + 1/d) * 1e6), d = 1..9 — sums to exactly 1,000,000
    val benfordPpm =
      Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)
    val counts = df
      .select(floor(abs(col(valueCol).cast("double")) * lit(1000000.0d))
        .cast("long").as("_m"))
      .where(col("_m") > 0)
      .groupBy(substring(col("_m").cast("string"), 1, 1).cast("int").as("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val digits = counts.sparkSession
      .range(1, 10)
      .select(col("id").cast("int").as("digit"))
      .withColumn("benford_ppm",
        element_at(array(benfordPpm.map(lit): _*), col("digit")))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    digits
      .join(counts, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("_nt", sum(col("n_obs")).over(wAll))
      .withColumn("_e", col("benford_ppm").cast(d) * col("_nt").cast(d))
      .withColumn("_t",
        when(col("_nt") === 0, lit(null).cast(d)).otherwise(
          (col("n_obs").cast(d) * lit(1000000L).cast(d) - col("_e")) *
            (col("n_obs").cast(d) * lit(1000000L).cast(d) - col("_e"))))
      .select(
        col("digit"), col("n_obs"),
        when(col("_nt") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(n_obs * 1000000 div _nt AS BIGINT)")).as("obs_ppm"),
        col("benford_ppm").cast("long").as("benford_ppm"),
        when(col("_nt") === 0, lit(null).cast("long"))
          .otherwise(sum(expr("CAST(_t div _e AS DECIMAL(38,0))")).over(wAll)
            .cast("long")).as("chi2_micro"))
      .orderBy("digit")
  }

  /** SEQUENCE AUDIT — is a per-group sequence column dense 1..n? For
    * each group: does `seqCol` start at 1, end at the group size, with
    * no gaps and no duplicates (the invariant of line numbers, page
    * numbers, retry attempts, version counters)? Reports ONE row per
    * audited relation: group count, how many groups are perfectly
    * dense, how many carry duplicates, how many gaps, and the worst
    * span excess (max over groups of `span − distinct`, the size of
    * the biggest hole) — the shape a data contract asserts on.
    *
    * Shape: one partial-agg fold on the group key (n, distinct, min,
    * max per group — map-side combine), then every verdict folds over
    * the |groups|-bounded table into a single row. Nothing row-sized
    * survives the first aggregate; at 100 TB parallelism = #groups.
    * All-integer output; NULL sequence values are excluded from
    * min/max/distinct but counted in n_rows (they break density via
    * the distinct-vs-n test). */
  def sequenceAudit(
      df: DataFrame,
      groupCol: String,
      seqCol: String,
      label: String): DataFrame = {
    val g = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("_n"),
      countDistinct(col(seqCol)).as("_nd"),
      min(col(seqCol)).cast("long").as("_mn"),
      max(col(seqCol)).cast("long").as("_mx"))
    g.agg(
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("_mn") === 1L && col("_mx") === col("_n") &&
          col("_nd") === col("_n"), 1L).otherwise(0L)), lit(0L)).as("n_dense"),
        coalesce(sum(when(col("_nd") < col("_n"), 1L).otherwise(0L)), lit(0L))
          .as("n_with_dups"),
        coalesce(sum(when(col("_mx") - col("_mn") + 1L > col("_nd"), 1L)
          .otherwise(0L)), lit(0L)).as("n_gapped"),
        coalesce(max(col("_mx") - col("_mn") + 1L - col("_nd")), lit(0L))
          .as("max_span_excess"))
      .select(lit(label).as("audited"), col("n_groups"), col("n_dense"),
        col("n_with_dups"), col("n_gapped"), col("max_span_excess"))
  }

  /** TABLE FINGERPRINT — order-independent bucket checksums for replica
    * reconciliation (anti-entropy): render each row canonically
    * (caller's `renderCol` — the contract is "same rendering on both
    * replicas"), hash it, and fold per bucket a COMMUTATIVE sum of a
    * 32-bit slice of the hash. Two replicas of the same table produce
    * identical (bucket, n_rows, checksum) tables; any single-row
    * difference flips its bucket's row — compare nBuckets rows instead
    * of re-shipping the table, and re-sync only the buckets that
    * disagree (the Merkle-lite recipe every replicated store uses).
    *
    * Engine-portable by construction: sha256 hex is the shared
    * primitive; bucket = first-hex-digit mod nBuckets and the checksum
    * slice is hex chars 1..8 parsed base-16 — both reproducible in any
    * SQL engine. The sum is commutative so NO ordering exists anywhere:
    * one partial-agg'd aggregate, parallelism = #buckets at 100 TB,
    * checksums summed exactly in DECIMAL(38,0).
    *
    * Returns (bucket, n_rows, checksum) — nBuckets rows (present
    * buckets only; an absent bucket is itself a signal). */
  def tableFingerprint(
      df: DataFrame,
      renderCol: Column,
      nBuckets: Int = 16): DataFrame = {
    require(nBuckets >= 1 && nBuckets <= 16,
      s"tableFingerprint: bucket comes from one hex digit, need 1..16, got $nBuckets")
    import org.apache.spark.sql.types.DecimalType
    val hx = sha2(renderCol, 256)
    df.select(
        pmod(conv(substring(hx, 1, 1), 16, 10).cast("int"), lit(nBuckets))
          .as("bucket"),
        conv(substring(hx, 2, 8), 16, 10).cast("long").as("_slice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        // exact DECIMAL sum folded into 63 bits so the checksum stays a
        // BIGINT at any row count (operands non-negative: pmod ≡ %)
        pmod(sum(col("_slice").cast(DecimalType(38, 0))),
          lit(BigDecimal("9223372036854775808")).cast(DecimalType(38, 0)))
          .cast("long").as("checksum"))
      .orderBy("bucket")
  }

  /** JOIN-CARDINALITY estimate WITHOUT executing the join: |A ⋈ B| on
    * an equi-key is EXACTLY Σ_k n_A(k)·n_B(k), computable from the two
    * key-count tables — the planning number that decides broadcast vs
    * shuffle vs salting BEFORE a 100 TB join runs, plus the top hot
    * keys by output contribution (the keys salting would split). This
    * is the diagnostic twin of the AQE skew threshold: run it in CI
    * against production key histograms and a quadratic join blowup is
    * a report row, not a 3 a.m. page.
    *
    * Shape: one partial-agg count per side (map-side combine), an
    * equi-join of the two key-bounded tables, a 1-row total plus a
    * TakeOrdered top-k — nothing row-sized past the first aggregates.
    * DECIMAL(38,0) products so hot keys cannot overflow. Returns
    * topK+1 rows: ('TOTAL', NULL-key row with the full estimate) then
    * the top keys by contribution desc, each (row_kind, key rendered
    * as string, n_left, n_right, contribution). */
  def joinCardinality(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      topK: Int = 10): DataFrame = {
    require(topK >= 1, s"joinCardinality: need topK >= 1, got $topK")
    import org.apache.spark.sql.types.DecimalType
    val d = DecimalType(38, 0)
    val la = left.groupBy(col(leftKey).cast("string").as("key"))
      .agg(count(lit(1)).as("n_left"))
    val rb = right.groupBy(col(rightKey).cast("string").as("key"))
      .agg(count(lit(1)).as("n_right"))
    val contrib = la.join(rb, Seq("key"))
      .withColumn("contribution",
        (col("n_left").cast(d) * col("n_right").cast(d)).cast(d))
    val total = contrib.agg(
        coalesce(sum(col("n_left")), lit(0L)).as("n_left"),
        coalesce(sum(col("n_right")), lit(0L)).as("n_right"),
        coalesce(sum(col("contribution")), lit(0).cast(d)).as("contribution"))
      .select(lit("TOTAL").as("row_kind"), lit(null).cast("string").as("key"),
        col("n_left"), col("n_right"),
        col("contribution").cast("decimal(38,0)").cast("string").as("contribution"))
    val top = contrib
      .orderBy(col("contribution").desc, col("key"))
      .limit(topK)
      .select(lit("HOT_KEY").as("row_kind"), col("key"),
        col("n_left"), col("n_right"),
        col("contribution").cast("string").as("contribution"))
    total.unionByName(top)
      // union order is not contractual — pin a total output order
      .orderBy(col("row_kind"),
        col("contribution").cast(d).desc, col("key"))
  }

  /** PARTITION-BALANCE forecast — how evenly would a hash partitioning
    * on `keyCol` spread this table over `nParts` reducers? Simulates
    * the exchange without running it: partition = md5-hash of the key
    * mod nParts (engine-portable — the table-fingerprint primitive;
    * Spark's real exchange uses Murmur3, but hash-mixing quality is
    * equivalent for balance purposes and THIS one both engines can
    * reproduce), then per-partition row counts plus the imbalance
    * summary every AQE-skew conversation starts from: max/mean ppm and
    * the largest partition's share. A 2× imbalance here is a salting
    * decision made BEFORE the job runs, not after a straggler.
    *
    * One partial-agg count on the simulated partition id; the summary
    * folds over ≤ nParts rows. Returns nParts-or-fewer rows
    * (partition, n_rows, share_ppm, max_over_mean_ppm) ordered by
    * partition. */
  def partitionBalance(
      df: DataFrame,
      keyCol: String,
      nParts: Int = 32): DataFrame = {
    require(nParts >= 1, s"partitionBalance: need nParts >= 1, got $nParts")
    import org.apache.spark.sql.expressions.Window
    val sizes = df
      .select(pmod(
        expr(s"CAST(conv(substring(md5(CAST($keyCol AS STRING)), 1, 8), 16, 10) AS BIGINT)"),
        lit(nParts.toLong)).as("partition"))
      .groupBy(col("partition"))
      .agg(count(lit(1)).as("n_rows"))
    val wAll = Window.partitionBy()
    sizes
      .withColumn("_tot", sum(col("n_rows")).over(wAll))
      .withColumn("_max", max(col("n_rows")).over(wAll))
      .withColumn("_np", count(lit(1)).over(wAll))
      .selectExpr("partition", "n_rows",
        "CAST(n_rows * 1000000 div _tot AS BIGINT) AS share_ppm",
        // max/mean with mean = tot/np — cross-multiplied to stay integer
        "CAST(_max * _np * 1000000 div _tot AS BIGINT) AS max_over_mean_ppm")
      .orderBy("partition")
  }

  /** MUTUAL INFORMATION between two categorical columns — the
    * feature-selection companion to [[cramersV]]: per cell the
    * pointwise term `p_ij · ln(p_ij / (p_i·p_j))` and the total
    * I(A;B) = Σ terms (nats). V asks "associated at all?"; MI says how
    * many nats of B one learns from A — directly comparable across
    * candidate features. NULL is a category (`<=>` grouping).
    *
    * Float policy ([[graft.ops.EventsOps.woeIv]]'s): counts and
    * marginals exact; each cell's term is one ln over the integer
    * cross-ratio `(n_ij·n)/(r_i·c_j)` times the exact rational
    * `n_ij/n`, in fixed operand order, round-6 (+0.0); `mi_total` sums
    * the ROUNDED terms. Empty cells contribute nothing (lim x·ln x =
    * 0 — absent cells are genuinely zero here, unlike the chi-square).
    *
    * One (a, b) partial-agg count; marginals and terms fold over the
    * cell-bounded table. Returns (a, b, n_ij, mi_term, mi_total)
    * ordered by (a, b). */
  def mutualInformation(
      df: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n_ij"))
    cells
      .withColumn("_ra", sum(col("n_ij")).over(Window.partitionBy(col("a"))))
      .withColumn("_cb", sum(col("n_ij")).over(Window.partitionBy(col("b"))))
      .withColumn("_n", sum(col("n_ij")).over(Window.partitionBy()))
      .selectExpr("a", "b", "n_ij",
        "round((CAST(n_ij AS DOUBLE) / _n) * " +
          "ln(CAST(n_ij AS DOUBLE) * _n / (CAST(_ra AS DOUBLE) * _cb)), 6) + 0.0 AS mi_term")
      .withColumn("mi_total",
        round(sum(col("mi_term")).over(Window.partitionBy()), 6) + lit(0.0d))
      .orderBy("a", "b")
  }

  /** L-DIVERSITY audit — the companion screen to [[kAnonymityAudit]]:
    * a QI class can be large (k-anonymous) yet still leak if every
    * member shares the SAME sensitive value; l-diversity requires ≥ l
    * DISTINCT sensitive values per class (Machanavajjhala et al.'s
    * distinct-l-diversity, the standard release criterion after
    * k-anonymity). Reports EVERY class with its diversity and a meets
    * flag — the violating subset is a filter away, and the full table
    * is what a release review reads.
    *
    * Shape: distinct (QI, sensitive) first — one partial-agg'd
    * aggregate whose map side collapses repeats — then a second
    * |classes|-bounded fold counting distinct values and joining the
    * class row counts (also |classes|-bounded). Nothing row-sized
    * survives the first aggregate; at 100 TB parallelism = #classes.
    *
    * Returns (qiCols..., n_rows, l_diversity, meets_l), all-integer,
    * one row per QI class. */
  def lDiversity(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty, "lDiversity: need at least one quasi-identifier")
    require(l >= 2, s"lDiversity: l < 2 holds trivially, got $l")
    val qi = qiCols.map(col)
    val sizes = df.groupBy(qi: _*).agg(count(lit(1)).as("n_rows"))
    val distinctVals = df
      .select((qiCols :+ sensitiveCol).map(col): _*)
      .distinct()
      .groupBy(qi: _*)
      .agg(count(lit(1)).as("l_diversity"))
    sizes.join(distinctVals, qiCols)
      .withColumn("meets_l", col("l_diversity") >= l)
  }

  /** FRESHNESS report — per key: last-seen time, age versus the
    * newest event anywhere in the snapshot, and a staleness bucket
    * (floor(age / bucketSeconds)) — the data-SLA half of snapshot
    * monitoring ([[nullDrift]] watches content, this watches
    * recency; a key whose bucket keeps climbing is a dead producer).
    *
    * Shape: one partial-agg (max, count) on the key; the global
    * high-water mark is a 1-row aggregate OF THE KEY TABLE (not a
    * second data scan) broadcast-joined back, so the op is lazy and
    * single-pass. Ages are non-negative by construction, so the
    * bucket's integral `div` is a true floor. At 100 TB parallelism =
    * #keys; the report is key-sized.
    *
    * Returns (keyCol, n_events, last_sec, age_sec, stale_bucket),
    * all-integer. */
  def freshnessReport(
      df: DataFrame,
      keyCol: String,
      tsCol: String = "ts",
      bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, s"freshnessReport: need bucketSeconds > 0, got $bucketSeconds")
    val sec = floor(unix_micros(col(tsCol)).cast("double") / lit(1000000.0d)).cast("long")
    val perKey = df
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), max(sec).as("last_sec"))
    val hwm = perKey.agg(max(col("last_sec")).as("_hwm"))
    perKey
      .crossJoin(broadcast(hwm))
      .select(col(keyCol), col("n_events"), col("last_sec"),
        (col("_hwm") - col("last_sec")).as("age_sec"),
        expr(s"CAST((_hwm - last_sec) div $bucketSeconds AS BIGINT)").as("stale_bucket"))
  }

  /** McNEMAR PAIRED TEST — do two classifiers/labelers differ on the
    * SAME items? The discordant-pair test ([[cohenKappa]] measures
    * agreement; this decides whether the disagreement is one-sided):
    * b = items only A gets right, c = items only B gets right,
    * χ² = (b−c)²/(b+c). Statistic reported as integral ppm
    * ((b−c)²·10⁶ div (b+c), NULL when b+c = 0 — no discordant
    * evidence), and the α=0.05 verdict decided WITHOUT any CDF:
    * χ² > 3.841459 ⇔ (b−c)²·10⁶ > 3841459·(b+c) — an exact integer
    * cross-multiplication against the χ²₁ critical value, so no libm
    * ever runs.
    *
    * ONE map-combined aggregate; DECIMAL(38,0) squares. Returns one
    * row (n, both_right, both_wrong, a_only, b_only, chi2_ppm,
    * significant_05). */
  def mcnemar(
      df: DataFrame,
      truthCol: String,
      aCol: String,
      bCol: String): DataFrame = {
    val aR = col(aCol) === col(truthCol)
    val bR = col(bCol) === col(truthCol)
    df.where(col(truthCol).isNotNull && col(aCol).isNotNull && col(bCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(aR && bR, 1L).otherwise(0L)).as("both_right"),
        sum(when(!aR && !bR, 1L).otherwise(0L)).as("both_wrong"),
        sum(when(aR && !bR, 1L).otherwise(0L)).as("a_only"),
        sum(when(!aR && bR, 1L).otherwise(0L)).as("b_only"))
      .withColumn("chi2_ppm",
        when(col("a_only") + col("b_only") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST(CAST(a_only - b_only AS DECIMAL(38,0)) * (a_only - b_only) " +
              "* 1000000 div (a_only + b_only) AS BIGINT)")))
      .withColumn("significant_05",
        when(col("a_only") + col("b_only") === 0, lit(null).cast("boolean"))
          .otherwise(expr(
            "CAST(a_only - b_only AS DECIMAL(38,0)) * (a_only - b_only) " +
              "* 1000000 > CAST(3841459 AS DECIMAL(38,0)) * (a_only + b_only)")))
  }

  /** T-CLOSENESS release audit (Li, Li & Venkatasubramanian 2007) — the
    * third rung of the anonymization ladder after [[kAnonymityAudit]]
    * and [[lDiversity]]: per quasi-identifier class, the variational
    * distance between the class's sensitive-value distribution and the
    * GLOBAL one (categorical EMD with uniform ground distance = ½Σ|p−q|),
    * in EXACT integer arithmetic: t_num = Σ_i |c_i·N − g_i·n_b| over the
    * full sensitive domain (absent values contribute g_i·n_b), and
    * t_ppm = t_num·10⁶ div (2·N·n_b) — one integral division, no
    * per-term rate rounding to accumulate. A class that mirrors the
    * population scores 0; a class revealing a sensitive skew scores
    * toward 10⁶. The sensitive column must be bounded-cardinality
    * (bucket a continuous one upstream).
    *
    * Shape: ONE partial agg collapses the corpus to (QI, sensitive)
    * cells; the full-domain grid is classes × sensitive values (both
    * bounded) with a left join for the zero cells; the global
    * distribution rides a broadcast. Returns (qiCols..., n_rows,
    * t_ppm, meets_t), one row per class. */
  def tCloseness(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      tPpm: Long): DataFrame = {
    require(qiCols.nonEmpty, "tCloseness: need at least one quasi-identifier")
    require(tPpm >= 0, s"tCloseness: need tPpm >= 0, got $tPpm")
    import org.apache.spark.sql.types.DecimalType
    val d = DecimalType(38, 0)
    val qi = qiCols.map(col)
    val cells = df.groupBy(qi :+ col(sensitiveCol).as("_s"): _*)
      .agg(count(lit(1)).as("_c"))
    val classes = cells.groupBy(qi: _*).agg(sum(col("_c")).as("n_rows"))
    val global = cells.groupBy(col("_s")).agg(sum(col("_c")).as("_g"))
    val total = global.agg(sum(col("_g")).as("_N"))
    val grid = classes
      .crossJoin(broadcast(global))
      .join(cells, qiCols :+ "_s", "left")
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
      .crossJoin(broadcast(total))
    val perClass = grid
      .withColumn("_term",
        abs(col("_c").cast(d) * col("_N").cast(d) -
          col("_g").cast(d) * col("n_rows").cast(d)))
      .groupBy(qi :+ col("n_rows") :+ col("_N"): _*)
      .agg(sum(col("_term")).as("_tnum"))
    perClass
      .withColumn("t_ppm",
        expr("CAST(_tnum * 1000000 div (2 * CAST(_N AS DECIMAL(38,0)) * n_rows) AS BIGINT)"))
      .withColumn("meets_t", col("t_ppm") <= tPpm)
      .select(qi ++ Seq(col("n_rows"), col("t_ppm"), col("meets_t")): _*)
  }

  /** ADJUSTED RAND INDEX between two partitions of the same rows
    * (Hubert & Arabie 1985) — the chance-corrected agreement score
    * between two labelings (a clustering vs a gold label, two labeler
    * runs, this week's segments vs last week's): 10⁶ = identical
    * partitions, ~0 = chance-level, negative = worse than chance.
    * Complements [[cohenKappa]]/[[krippendorffAlpha]], which compare
    * labelings by VALUE — ARI compares by co-membership STRUCTURE, so
    * renaming every cluster leaves it unchanged.
    *
    * EXACT to the floored ppm: the corpus collapses to the
    * (|A|·|B|)-bounded contingency table in ONE partial agg; pair
    * counts clear to the integer rational
    * 10⁶·2·(S₂N₂ − A₂B₂) / ((A₂+B₂)N₂ − 2A₂B₂) with
    * X₂ = Σx(x−1), N₂ = n(n−1), evaluated by the `ari_ppm` native
    * kernel (arbitrary-precision BigInt — the interior is ~n⁴, past
    * DECIMAL(38,0) beyond n ≈ 2.6·10⁷; floor division toward −∞ so
    * below-chance scores stay consistent with the `div` convention).
    * NULL when undefined (both partitions trivial — all singletons or
    * one block — and n < 2). Rows with a NULL label on either side
    * are excluded (no co-membership evidence).
    *
    * Returns ONE row (n_rows, ari_ppm); zero-count row on empty
    * input (the [[krippendorffAlpha]] scalar-fold convention). */
  def adjustedRand(
      df: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val rows = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("_a"), col(bCol).cast("string").as("_b"))
    val cells = rows.groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_c"))
    val s2 = cells.agg(
      coalesce(sum((col("_c").cast(d38) * (col("_c") - lit(1L))).cast(d38)), lit(0L).cast(d38))
        .cast(d38).as("_s2"))
    val a2 = cells.groupBy(col("_a")).agg(sum(col("_c")).as("_ca"))
      .agg(
        coalesce(sum((col("_ca").cast(d38) * (col("_ca") - lit(1L))).cast(d38)), lit(0L).cast(d38))
          .cast(d38).as("_a2"),
        coalesce(sum(col("_ca")), lit(0L)).as("_n"))
    val b2 = cells.groupBy(col("_b")).agg(sum(col("_c")).as("_cb"))
      .agg(
        coalesce(sum((col("_cb").cast(d38) * (col("_cb") - lit(1L))).cast(d38)), lit(0L).cast(d38))
          .cast(d38).as("_b2"))
    s2.crossJoin(a2).crossJoin(b2) // three 1-row aggregates
      .select(
        col("_n").as("n_rows"),
        graft.functions.GraftFunctions.ari_ppm(
          col("_s2"), col("_a2"), col("_b2"), col("_n").cast(d38))
          .cast("long").as("ari_ppm"))
  }

  /** DISPARATE-IMPACT audit — the four-fifths rule (EEOC Uniform
    * Guidelines 1978; Feldman et al. 2015 "Certifying and Removing
    * Disparate Impact" for the ML framing): per protected group, the
    * positive-outcome rate and its ratio to the HIGHEST-rate group;
    * any group under 80% of the reference fails the rule. The
    * selection audit a training-data pipeline owes its quality/keep
    * flags before they become a model's labels.
    *
    * INTEGER-EXACT: per-group rates are floored ppm divisions; the
    * reference rate is their exact max (the reported `ref_group` is
    * the lexicographically smallest holder on ties); `ratio_vs_ref_ppm`
    * is the floored cross-ratio rate·10⁶ div ref_rate — NULL (never a
    * blow-up) when nothing is positive anywhere, with the fail flag
    * conservatively false. A NULL group or a label outside {0, 1}
    * raises in-plan.
    *
    * Shape: ONE group-keyed partial agg over the corpus; the max and
    * the reference label ride the |groups|-bounded table broadcast
    * back. Empty input → empty output.
    *
    * Returns (group, n, n_pos, rate_ppm, ref_group, ratio_vs_ref_ppm,
    * four_fifths_fail) ordered by group. */
  def disparateImpact(
      df: DataFrame,
      groupCol: String,
      positiveCol: String): DataFrame = {
    val rows = df.select(
      when(col(groupCol).isNull,
        raise_error(lit("disparateImpact: NULL protected group")))
        .otherwise(col(groupCol).cast("string")).as("_g"),
      when(col(positiveCol).isNull ||
          !col(positiveCol).cast("int").isin(0, 1),
        raise_error(lit("disparateImpact: positive flag must be 0 or 1")))
        .otherwise(col(positiveCol).cast("long")).as("_y"))
    val perG = rows.groupBy(col("_g"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"))
      .withColumn("rate_ppm", expr("n_pos * 1000000 div n"))
    val ref = perG
      .agg(max(col("rate_ppm")).as("_mr"))
      .crossJoin(perG.select(col("_g"), col("rate_ppm")))
      .where(col("rate_ppm") === col("_mr"))
      .agg(max(col("_mr")).as("_mr"), min(col("_g")).as("ref_group"))
    perG.crossJoin(broadcast(ref))
      .select(col("_g").as("group"), col("n"), col("n_pos"),
        col("rate_ppm"), col("ref_group"),
        when(col("_mr") === 0L, lit(null).cast("long"))
          .otherwise(expr("rate_ppm * 1000000 div _mr"))
          .as("ratio_vs_ref_ppm"))
      .withColumn("four_fifths_fail",
        coalesce(col("ratio_vs_ref_ppm") < 800000L, lit(false)))
      .orderBy("group")
  }
}
