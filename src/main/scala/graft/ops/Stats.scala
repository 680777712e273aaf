package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-column / cross-row statistical screens that round out the
  * analytics surface: the 2-D Pareto frontier (skyline) and the exact
  * pairwise correlation matrix. Both are single-digit-shuffle shapes
  * with the integer-exact arithmetic contract the rest of the suite
  * uses (DECIMAL(38,0) cross-products, division or sqrt LAST). */
object Stats {

  /** 2-D PARETO FRONTIER (skyline): the rows not dominated by any other
    * row, minimizing `xCol` while maximizing `yCol` — "cheapest part at
    * every size class you can't beat", the classic price/performance
    * short-list that no single ORDER BY can produce.
    *
    * Dominance is the standard non-strict-with-one-strict rule: row r is
    * dominated iff some r' has x' ≤ x AND y' ≥ y with at least one
    * strict; exact (x, y) duplicates do not dominate each other and are
    * all kept. Split by case: dominated ⇔ max{y' : x' < x} ≥ y OR
    * max{y' : x' = x} > y.
    *
    * Shape: one partial agg collapses the corpus to per-x max-y rows
    * (output is x-cardinality-bounded — prices, not rows), the running
    * strictly-before max is ONE unpartitioned window over that bounded
    * table (the value-cardinality-bounded window contract every gate
    * with a global frame documents; at 100 TB with unbounded x
    * cardinality, swap in the [[Ffill]] blocked two-pass prefix max —
    * same algebra, range-partitioned), and survivors come back via one
    * broadcast-able equi-join on x. The corpus is never globally
    * sorted.
    *
    * `xCol` must be integer-valued (quantize micro upstream — the p59
    * recipe) so the strictly-before frame is exact.
    * Returns the surviving rows of `df` (all columns), frontier-ordered
    * by (x asc, y desc, first id col asc if `tieCols` given). */
  def paretoFrontier(
      df: DataFrame,
      xCol: String,
      yCol: String): DataFrame = {
    // per-x max y: the only corpus-sized pass, partial-agg'd map-side
    val perX = df.groupBy(col(xCol)).agg(max(col(yCol)).as("_my"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(xCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // x values are distinct here, so rowsBetween(-1) ≡ "strictly smaller
    // x" — no RANGE frame needed
    val keepX = perX
      .withColumn("_pm", max(col("_my")).over(w))
      .where(col("_pm").isNull || col("_pm") < col("_my"))
      .select(col(xCol), col("_my"))
    df.join(broadcast(keepX), Seq(xCol))
      .where(col(yCol) === col("_my"))
      .drop("_my")
  }

  /** Exact pairwise PEARSON CORRELATION matrix over micro-quantized
    * numeric columns — the "which fields move together" one-pager a
    * profiling pass emits before any modeling. Emits the upper triangle
    * (colA < colB alphabetically), one row per pair.
    *
    * Exactness contract: inputs are quantized `floor(value·1e6)` BIGINT
    * (the p59 recipe — both engines quantize IDENTICAL doubles with
    * IEEE-exact multiply+floor), every sum (Σx, Σx², Σxy) runs in
    * DECIMAL(38,0) so the moments are EXACT integers, and the only
    * float steps are the final three exact-integer→double casts and
    * `num / sqrt(d1·d2)` — +, ×, /, sqrt are all correctly-rounded
    * IEEE, so the result is deterministic to the last ulp given exact
    * integer moments; reported round-6 (+0.0 folds −0.0), the
    * [[Governance.psiDrift]] float policy. Overflow headroom: with
    * |x| ≤ 1.1e11 micro (a 105k price) the largest moment n·Σx² is
    * ~4e33 at n = 6e5 — inside DECIMAL(38,0); at 100 TB row counts,
    * quantize coarser (milli) — same code path.
    *
    * Shape: ONE map-side-combined global aggregate computes every
    * pair's moments in a single reduce (no per-pair pass, no shuffle of
    * data rows — the 1-row result broadcasts); rows with a NULL in any
    * column are excluded from ALL pairs so every pair shares one n
    * (listwise deletion, the standard matrix convention).
    *
    * Returns (col_a, col_b, n, corr) with corr NULL when either column
    * is constant (zero variance). */
  def correlationMatrix(
      df: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"correlationMatrix: need >= 2 columns, got $cols")
    require(cols.distinct == cols, s"correlationMatrix: duplicate columns in $cols")
    val sorted = cols.sorted
    def q(c: String): Column =
      floor(col(c).cast("double") * lit(1000000.0d)).cast("long")
    val base = df
      .where(sorted.map(col(_).isNotNull).reduce(_ && _))
      .select(sorted.map(c => q(c).as(s"_q_$c")): _*)
    pearsonOfLongs(base, sorted)
  }

  /** Shared Pearson kernel over pre-quantized BIGINT `_q_<col>`
    * columns: exact DECIMAL(38,0) moments in ONE map-side-combined
    * global aggregate, float only in the final `num / sqrt(d1·d2)`.
    * [[correlationMatrix]] feeds micro-quantized values;
    * [[spearmanMatrix]] feeds raw doubled ranks (already integers — no
    * rescale, which is what keeps its moments inside DECIMAL(38,0) to
    * n ≈ 2·10⁹). */
  private def pearsonOfLongs(base: DataFrame, sorted: Seq[String]): DataFrame = {
    val d = DecimalType(38, 0)
    val pairs = for {
      i <- sorted.indices; j <- (i + 1) until sorted.size
    } yield (sorted(i), sorted(j))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("_n")) ++
        sorted.map(c => sum(col(s"_q_$c").cast(d)).as(s"_s_$c")) ++
        sorted.map(c => sum(col(s"_q_$c").cast(d) * col(s"_q_$c").cast(d)).as(s"_ss_$c")) ++
        pairs.map { case (a, b) =>
          sum(col(s"_q_$a").cast(d) * col(s"_q_$b").cast(d)).as(s"_sp_${a}_$b")
        }
    val m = base.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val n = col("_n").cast(d)
      val num = n * col(s"_sp_${a}_$b") - col(s"_s_$a") * col(s"_s_$b")
      val d1 = n * col(s"_ss_$a") - col(s"_s_$a") * col(s"_s_$a")
      val d2 = n * col(s"_ss_$b") - col(s"_s_$b") * col(s"_s_$b")
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        col("_n").cast("long").as("n"),
        when(d1 === 0 || d2 === 0, lit(null).cast("double"))
          .otherwise(round(num.cast("double") /
            sqrt(d1.cast("double") * d2.cast("double")), 6) + lit(0.0d))
          .as("corr"))
    }
    m.select(explode(array(rows: _*)).as("_r"))
      .select(col("_r.col_a"), col("_r.col_b"), col("_r.n"), col("_r.corr"))
  }

  /** RANK REPORT — the full SQL ranking-function suite per group over a
    * measure, INTEGER-EXACT: row_number / rank / dense_rank / ntile on
    * the (value, tie) total order, plus cume_ppm — cume_dist re-derived
    * as `count(*) OVER (ORDER BY value RANGE UNBOUNDED PRECEDING..
    * CURRENT) * 1e6 div n` so the tie semantics (all peers share the
    * count of rows ≤ their value) survive integer arithmetic instead of
    * hiding in a float. percent_rank's numerator is `rank − 1` and its
    * denominator `n − 1`, reported as ppm with the same integral div
    * (NULL for 1-row groups, matching SQL's 0/0 convention being
    * undefined — declared NULL here).
    *
    * Shape: ONE hash exchange on the group key; every window (rows
    * frame, range frame, ntile, the group count) shares that partition
    * + sort. The measure is micro-quantized BEFORE the windows so the
    * RANGE frame compares BIGINTs. At 100 TB parallelism = #groups;
    * the per-row frame updates are O(1) sliding-window ops, and no
    * global sort exists — callers wanting a report ORDER BY add it on
    * the (already small) result.
    *
    * Returns (groupCol, tieCol, value_micro, rn, rnk, dense_rnk,
    * tile, cume_ppm, pct_rank_ppm). */
  /** PER-GROUP OLS SLOPE of y on x — the generic "does y move with x
    * inside each group" screen ([[graft.ops.EventsOps.groupTrend]] is
    * the time-x special case; this takes any numeric regressor —
    * price sensitivity per product, dose-response per cohort). Exact
    * DECIMAL(38,0) moments; slope reported as the re-signed ppm ratio
    * `(nΣxy − ΣxΣy)·10⁶ div (nΣx² − (Σx)²)` — micro-y per micro-x
    * scaled by 10⁶, NULL for degenerate x. Groups under `minN` rows
    * are dropped (no slope evidence).
    *
    * One partial-agg pass on the group; everything after is
    * group-bounded. Returns (keyCol, n, slope_ppm). */
  def groupSlope(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String,
      minN: Long = 2L): DataFrame = {
    require(minN >= 2, s"groupSlope: need minN >= 2, got $minN")
    val d = DecimalType(38, 0)
    df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol),
        floor(col(xCol).cast("double") * lit(1000000.0d)).cast("long").as("_x"),
        floor(col(yCol).cast("double") * lit(1000000.0d)).cast("long").as("_y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_x").cast(d)).as("_sx"), sum(col("_y").cast(d)).as("_sy"),
        sum(col("_x").cast(d) * col("_y").cast(d)).as("_sxy"),
        sum(col("_x").cast(d) * col("_x").cast(d)).as("_sxx"))
      .where(col("n") >= minN)
      .selectExpr(keyCol, "n",
        "CASE WHEN CAST(n AS DECIMAL(38,0)) * _sxx - _sx * _sx = 0 THEN CAST(NULL AS BIGINT) ELSE " +
          "CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * _sxy - _sx * _sy >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(abs(CAST(n AS DECIMAL(38,0)) * _sxy - _sx * _sy) * 1000000 div " +
          "(CAST(n AS DECIMAL(38,0)) * _sxx - _sx * _sx) AS BIGINT) END AS slope_ppm")
  }

  /** NEYMAN ALLOCATION — the survey-sampling optimum for a stratified
    * sample of total size `totalN`: allocate ∝ N_h·S_h (stratum size ×
    * stratum standard deviation), so volatile strata get the
    * observations and near-constant strata stop wasting budget — the
    * principled way to size per-source eval sets over a heterogeneous
    * corpus. Largest-remainder rounding makes the allocations sum to
    * EXACTLY totalN (remainder ties break by stratum name).
    *
    * Integer-exact throughout: the variance numerator n·Σv²−(Σv)² is
    * DECIMAL(38,0); sd_micro is the exact floor integer square root of
    * the (declared) integral-div sample variance — computed as an IEEE
    * sqrt GUESS corrected by one integer comparison step, so engines
    * with correctly-rounded sqrt agree bit-for-bit even where the
    * float alone would misround. Singleton strata carry S = 0
    * (declared: no variance evidence, minimal allocation).
    *
    * One partial-agg pass on the stratum; everything after is
    * |strata|-bounded. Returns (stratumCol, n_rows, sd_micro,
    * allocation) ordered by stratum; Σ allocation = totalN. */
  def neymanAllocation(
      df: DataFrame,
      stratumCol: String,
      valueCol: String,
      totalN: Long): DataFrame = {
    require(totalN >= 0, s"neymanAllocation: need totalN >= 0, got $totalN")
    import org.apache.spark.sql.expressions.Window
    val d = DecimalType(38, 0)
    val stats = df
      .where(col(valueCol).isNotNull)
      .select(col(stratumCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("_v").cast(d)).as("_s"),
        sum(col("_v").cast(d) * col("_v").cast(d)).as("_ss"))
      // exact floor isqrt of the integral-div sample variance: IEEE
      // sqrt guess ± one integer correction step
      .selectExpr(stratumCol, "n_rows",
        "CASE WHEN n_rows < 2 THEN CAST(0 AS DECIMAL(38,0)) ELSE " +
          "(CAST(n_rows AS DECIMAL(38,0)) * _ss - _s * _s) div " +
          "(CAST(n_rows AS DECIMAL(38,0)) * (n_rows - 1)) END AS _var")
      .selectExpr(stratumCol, "n_rows", "_var",
        "CAST(floor(sqrt(CAST(_var AS DOUBLE))) AS BIGINT) AS _g")
      .selectExpr(stratumCol, "n_rows",
        "CASE WHEN CAST(_g + 1 AS DECIMAL(38,0)) * (_g + 1) <= _var THEN _g + 1 " +
          "WHEN CAST(_g AS DECIMAL(38,0)) * _g > _var THEN _g - 1 " +
          "ELSE _g END AS sd_micro")
    val wAll = Window.partitionBy()
    val weighted = stats
      .withColumn("_w", col("n_rows").cast(d) * col("sd_micro").cast(d))
      .withColumn("_tw", sum(col("_w")).over(wAll))
    val based = weighted
      .selectExpr(stratumCol, "n_rows", "sd_micro", "_w", "_tw",
        s"CASE WHEN _tw = 0 THEN 0 ELSE CAST($totalN * _w div _tw AS BIGINT) END AS _base",
        // remainder as the exact numerator residue (no floats)
        s"CASE WHEN _tw = 0 THEN CAST(0 AS DECIMAL(38,0)) " +
          s"ELSE $totalN * _w - (CASE WHEN _tw = 0 THEN 0 ELSE CAST($totalN * _w div _tw AS BIGINT) END) * _tw END AS _rem")
      .withColumn("_short", lit(totalN) - sum(col("_base")).over(wAll))
      .withColumn("_rk", row_number().over( // |strata|-bounded ladder
        Window.orderBy(col("_rem").desc, col(stratumCol))))
    based
      .select(col(stratumCol), col("n_rows"), col("sd_micro"),
        (col("_base") + when(col("_rk") <= col("_short"), 1L).otherwise(0L))
          .as("allocation"))
      .orderBy(stratumCol)
  }

  def rankReport(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String,
      nTiles: Int = 4): DataFrame = {
    require(nTiles >= 1, s"rankReport: need nTiles >= 1, got $nTiles")
    import org.apache.spark.sql.expressions.Window
    val total = Window.partitionBy(col(groupCol)).orderBy(col("_v"), col(tieCol))
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
    val cume = byVal.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val grp = Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(tieCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .withColumn("rn", row_number().over(total))
      .withColumn("rnk", rank().over(byVal))
      .withColumn("dense_rnk", dense_rank().over(byVal))
      .withColumn("tile", ntile(nTiles).over(total))
      .withColumn("_le", count(lit(1)).over(cume))
      .withColumn("_n", count(lit(1)).over(grp))
      .select(col(groupCol), col(tieCol), col("_v").as("value_micro"),
        col("rn"), col("rnk"), col("dense_rnk"), col("tile"),
        expr("CAST(_le * 1000000 div _n AS BIGINT)").as("cume_ppm"),
        when(col("_n") === 1, lit(null).cast("long"))
          // rank() is 32-bit: widen BEFORE the ×1e6 or ranks past ~2147
          // wrap negative
          .otherwise(expr(
            "CAST((CAST(rnk AS BIGINT) - 1) * 1000000 div (_n - 1) AS BIGINT)"))
          .as("pct_rank_ppm"))
  }

  /** SPEARMAN RANK CORRELATION matrix — [[correlationMatrix]]'s Pearson
    * machinery run over AVERAGE-RANK transforms, the monotone-association
    * screen that survives outliers and nonlinear-but-monotone links the
    * Pearson matrix understates.
    *
    * Integer-exact: the fractional average rank of a tied block (ties get
    * the mean of the positions they span) is carried DOUBLED — for a
    * value v with `less` rows strictly below and `c` ties, the doubled
    * average rank is `2·less + c + 1`, always an integer — so the moment
    * arithmetic stays in DECIMAL(38,0) and ρ is invariant under the ×2
    * (and the downstream ×1e6) scaling.
    *
    * Shape: ONE partial agg per column collapses the corpus to its
    * distinct-value counts; the strictly-before running sum is a window
    * over that value-cardinality-bounded table (the [[paretoFrontier]]
    * contract — swap in the [[Ffill]] blocked two-pass prefix sum if a
    * column's cardinality is corpus-sized); ranks come back via one
    * broadcast equi-join per column. The corpus is never globally
    * sorted. Returns (col_a, col_b, n, rho) per unordered pair. */
  def spearmanMatrix(
      df: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"spearmanMatrix: need >= 2 columns, got $cols")
    require(cols.distinct == cols, s"spearmanMatrix: duplicate columns in $cols")
    import org.apache.spark.sql.expressions.Window
    // quantize every column ONCE up front, and derive each column's
    // count table from this narrow base — NOT from the accumulated join
    // chain: counts over column c are identical either way (each rank
    // join is inner on a key set that covers every base row, so it is
    // lossless and leaves other columns untouched), but folding counts
    // off the accumulator replayed the whole join lineage per column —
    // the executed plan carried 16 parquet scans for 4 columns (4 scans
    // would be: one per single-column count + the main chain)
    val base = df.where(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        floor(col(c).cast("double") * lit(1000000.0d)).cast("long")
          .as(s"_v_$c")): _*)
    // ONE unpivoted rank pass for ALL columns (round-18): the per-column
    // fold ran k sequential single-partition windows, each fed by its
    // own narrow corpus scan — k+1 corpus passes and a serial rank
    // ladder per column (the round-17 scaling block measured p231 flat
    // from 8 → 32 cores: the ladders are the serial fraction). Stacking
    // (column ordinal, value) via posexplode computes every ladder off
    // ONE corpus pass and ONE shuffle, and the window partitioned by
    // ordinal runs the k ladders in parallel. Values are identical: per
    // (column, value) the count and the strictly-less running sum are
    // unchanged, so each doubled rank 2·less + c + 1 is the same
    // integer. The ladder table (Σ per-column distinct values — the
    // winsorize cardinality contract) is persisted so the k broadcast
    // builds read it instead of re-running the pass per column.
    val stacked = base.select(
      posexplode(array(cols.map(c => col(s"_v_$c")): _*)).as(Seq("_ci", "_v")))
    val w = Window.partitionBy(col("_ci")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ladders = stacked
      .groupBy(col("_ci"), col("_v")).agg(count(lit(1)).as("_c"))
      .withColumn("_less", coalesce(sum(col("_c")).over(w), lit(0L)))
      .select(col("_ci"), col("_v"),
        (lit(2L) * col("_less") + col("_c") + lit(1L)).as("_dr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranked = cols.zipWithIndex.foldLeft(base) { case (acc, (c, i)) =>
      val ranks = ladders.where(col("_ci") === i)
        .select(col("_v").as(s"_v_$c"), col("_dr").as(s"_dr_$c"))
      acc.join(broadcast(ranks), Seq(s"_v_$c"))
    }
    // doubled ranks are integers ≤ 2n+1 and feed the Pearson kernel
    // UNSCALED (no ×1e6 — that would overflow n·Σx² ~ (4/3)n⁴·10¹²
    // past DECIMAL(38,0) at n ≈ 3·10⁶); raw ranks keep every moment
    // exact to n ≈ 2·10⁹, and ρ is scale-invariant so the value is
    // the same real number either way
    val sortedCols = cols.sorted
    val drBase = ranked.select(sortedCols.map(c => col(s"_dr_$c").as(s"_q_$c")): _*)
    pearsonOfLongs(drBase, sortedCols).withColumnRenamed("corr", "rho")
  }

  /** ETA-SQUARED (variance explained by a categorical) — the
    * feature-screen bridge between [[correlationMatrix]] (numeric ×
    * numeric) and mutual information (categorical × categorical): what
    * share of a numeric column's variance does group membership
    * explain? η² = SS_between/SS_total, here as
    * `(N·T − S²)·10⁶ div (N·Q − S²)` with T = Σ_g S_g·⌊S_g/n_g⌋ — the
    * group mean floored to whole micro before the product (the ONE
    * declared rounding, relative error ≤ n_g/S_g per group; crucially
    * ⌊S/n⌋ is long-ranged, where ⌊S²/n⌋ would overflow Spark's
    * long-valued integral division). Every other product is exact
    * DECIMAL(38,0). 0 = the grouping tells you nothing; 10⁶ = group
    * means explain everything.
    *
    * ONE partial agg on the group key, then a group-bounded fold.
    * NULL when the column is constant (zero total variance). Returns
    * one row (n, k_groups, eta_sq_ppm). */
  def etaSquared(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val d = DecimalType(38, 0)
    val per = df
      .where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"),
        sum(floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long")
          .cast(d)).as("_s"),
        sum(floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long")
          .cast(d) *
          floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long"))
          .as("_q"))
    per.agg(sum(col("_n")).as("n"), count(lit(1)).as("k_groups"),
        sum(col("_s")).as("_S"), sum(col("_q")).as("_Q"),
        sum(expr("_s * CAST(_s div _n AS DECIMAL(38,0))")).as("_T"))
      .select(col("n"), col("k_groups"),
        when(expr("CAST(n AS DECIMAL(38,0)) * _Q - _S * _S") === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * _T - _S * _S) * 1000000 " +
              "div (CAST(n AS DECIMAL(38,0)) * _Q - _S * _S) AS BIGINT)"))
          .as("eta_sq_ppm"))
  }

  /** QINI / UPLIFT TABLE — the incrementality ladder: rank by score,
    * cut into tiles, and compare TREATED vs CONTROL outcome rates
    * inside each tile. [[gainsTable]] asks "does the score find
    * responders"; this asks the campaign question that actually pays —
    * "does the score find people the treatment CHANGES". Qini(k) =
    * cumulative treated positives minus control positives scaled to
    * the treated volume — the uplift curve's running area numerator.
    *
    * Integral: uplift_ppm = p_t·10⁶ div n_t − p_c·10⁶ div n_c (each
    * term its own non-negative division, the difference exact);
    * qini_micro = cum_p_t·10⁶ − cum_p_c·cum_n_t·10⁶ div cum_n_c
    * (DECIMAL products, one division). NULL where a tile (or prefix)
    * has no control rows. Tiles are rank-based ntile over (score desc,
    * tie) — the [[gainsTable]] determinism contract, including its
    * at-scale percentile-cut swap note. Returns (tile, n_treat,
    * pos_treat, n_ctrl, pos_ctrl, uplift_ppm, qini_micro),
    * tile-ordered. */
  def qiniTable(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      treatCol: String,
      tieCol: String,
      nTiles: Int = 10): DataFrame = {
    require(nTiles >= 2, s"qiniTable: need nTiles >= 2, got $nTiles")
    import org.apache.spark.sql.expressions.Window
    // GLOBAL rank order (single task over the slim projection) — the
    // Scaladoc's at-scale contract applies: swap for percentile cuts
    val wOrd = Window.orderBy(col(scoreCol).desc, col(tieCol).asc)
    val tiles = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull &&
        col(treatCol).isNotNull)
      .withColumn("tile", ntile(nTiles).over(wOrd).cast("long"))
      .groupBy(col("tile"))
      .agg(
        sum(when(col(treatCol).cast("boolean"), 1L).otherwise(0L)).as("n_treat"),
        sum(when(col(treatCol).cast("boolean") && col(labelCol).cast("boolean"),
          1L).otherwise(0L)).as("pos_treat"),
        sum(when(!col(treatCol).cast("boolean"), 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(!col(treatCol).cast("boolean") && col(labelCol).cast("boolean"),
          1L).otherwise(0L)).as("pos_ctrl"))
    val wCum = Window.orderBy(col("tile")) // nTiles-bounded cum ladder
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tiles
      .withColumn("_cnt", sum(col("n_treat")).over(wCum))
      .withColumn("_cpt", sum(col("pos_treat")).over(wCum))
      .withColumn("_cnc", sum(col("n_ctrl")).over(wCum))
      .withColumn("_cpc", sum(col("pos_ctrl")).over(wCum))
      .select(col("tile"), col("n_treat"), col("pos_treat"),
        col("n_ctrl"), col("pos_ctrl"),
        when(col("n_treat") === 0 || col("n_ctrl") === 0, lit(null).cast("long"))
          .otherwise(
            expr("CAST(pos_treat * 1000000 div n_treat AS BIGINT) - " +
              "CAST(pos_ctrl * 1000000 div n_ctrl AS BIGINT)"))
          .as("uplift_ppm"),
        when(col("_cnc") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST(CAST(_cpt AS DECIMAL(38,0)) * 1000000 - " +
              "CAST(_cpc AS DECIMAL(38,0)) * _cnt * 1000000 div _cnc AS BIGINT)"))
          .as("qini_micro"))
      .orderBy("tile")
  }

  /** EXACT AUC (ties-corrected, Mann–Whitney identity) — the
    * probability a random positive outranks a random negative, THE
    * scalar next to the [[gainsTable]] in every model report. Computed
    * from rank sums with the [[spearmanMatrix]] doubled-average-rank
    * trick so ties contribute their exact ½ credit in pure integers:
    * `auc_ppm = (Σ_pos dr − n₁(n₁+1))·10⁶ div (2·n₁·n₀)` where dr is
    * the doubled average rank (2·less + c + 1) of the row's score.
    *
    * Shape: ONE partial agg collapses the corpus to per-distinct-score
    * (n, pos); the rank ladder is a window over that value-cardinality-
    * bounded table; everything after is one scalar aggregate. NULL AUC
    * when either class is empty. Returns one row
    * (n, n_pos, n_neg, auc_ppm). */
  def aucExact(
      df: DataFrame,
      scoreCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = DecimalType(38, 0)
    val per = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(floor(col(scoreCol).cast("double") * lit(1000000.0d)).cast("long")
        .as("_v"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("_p"))
    // unpartitioned ladder bounded by |distinct micro values| (≤ 10⁶+1
    // under the micro quantization — the winsorize doc-contract bound)
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    per
      .withColumn("_less", coalesce(sum(col("_n")).over(w), lit(0L)))
      .withColumn("_dr", lit(2L) * col("_less") + col("_n") + 1L)
      .agg(sum(col("_n")).as("n"),
        sum(col("_p")).as("n_pos"),
        sum(col("_p").cast(d) * col("_dr").cast(d)).as("_r1x2"))
      .select(col("n"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        when(col("n_pos") === 0 || col("n") === col("n_pos"),
          lit(null).cast("long"))
          .otherwise(expr(
            "CAST((_r1x2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 1000000 " +
              "div (CAST(2 AS DECIMAL(38,0)) * n_pos * (n - n_pos)) AS BIGINT)"))
          .as("auc_ppm"))
  }

  /** GAINS / LIFT TABLE — the model-triage one-pager: rank by score
    * descending, cut into `nTiles`, and report how much of the positive
    * class each tile captures and its lift over the base rate. The
    * campaign-targeting companion to [[giniSplit]] (which finds ONE
    * threshold; this shows the whole targeting curve).
    *
    * Deterministic: tiles are `ntile` over the TOTAL order (score desc,
    * then `tieCol`) — rank-based, engine-independent under ties. All
    * integral: capture = cum_pos·10⁶ div P, lift = pos·N·10⁶ div
    * (n·P), cumulative lift likewise, DECIMAL(38,0) products. NULL
    * lift when the corpus has no positives.
    *
    * Shape: one corpus pass assigns tiles (unpartitioned ntile — the
    * rfmSegments contract: beyond ~10⁸ rows swap for a percentile cut
    * table, two passes, same buckets), one tile-bounded aggregate, and
    * cumulative windows over the ≤ nTiles rows. Returns (tile, n, pos,
    * capture_ppm, lift_ppm, cum_lift_ppm), tile-ordered. */
  def gainsTable(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      tieCol: String,
      nTiles: Int = 10): DataFrame = {
    require(nTiles >= 2, s"gainsTable: need nTiles >= 2, got $nTiles")
    import org.apache.spark.sql.expressions.Window
    val d = DecimalType(38, 0)
    // GLOBAL rank order (single task over the slim projection) — the
    // Scaladoc's at-scale contract applies: swap for percentile cuts
    val wOrd = Window.orderBy(col(scoreCol).desc, col(tieCol).asc)
    val tiles = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("tile", ntile(nTiles).over(wOrd).cast("long"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("pos"))
    val wCum = Window.orderBy(col("tile")) // nTiles-bounded cum ladder
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    tiles
      .withColumn("_cn", sum(col("n")).over(wCum))
      .withColumn("_cp", sum(col("pos")).over(wCum))
      .withColumn("_N", sum(col("n")).over(wAll))
      .withColumn("_P", sum(col("pos")).over(wAll))
      .select(col("tile"), col("n"), col("pos"),
        when(col("_P") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(_cp * 1000000 div _P AS BIGINT)"))
          .as("capture_ppm"),
        when(col("_P") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(CAST(pos AS DECIMAL(38,0)) * _N * 1000000 " +
            "div (CAST(n AS DECIMAL(38,0)) * _P) AS BIGINT)"))
          .as("lift_ppm"),
        when(col("_P") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(CAST(_cp AS DECIMAL(38,0)) * _N * 1000000 " +
            "div (CAST(_cn AS DECIMAL(38,0)) * _P) AS BIGINT)"))
          .as("cum_lift_ppm"))
      .orderBy("tile")
  }

  /** ISOTONIC CALIBRATION (PAVA by the minimax closed form) — fit the
    * best MONOTONE rate curve over ordered buckets: the calibration
    * every threshold-based decision wants when the raw per-bucket rates
    * wiggle ("a higher score must never mean a lower predicted rate").
    * Uses the exact L2-isotonic identity fit(i) = max_{j≤i} min_{k≥i}
    * avg(pos over buckets j..k) — no sequential pooling loop, so the
    * whole fit is three bounded relational steps any engine replays.
    *
    * Integer convention: interval averages enter the minimax as
    * integral ppm (`sum·10⁶ div n` — the declared micro-resolution;
    * flooring before min/max keeps every comparison integer and the
    * fit stays monotone because the max-over-prefixes structure is
    * untouched). Buckets must be bounded-cardinality — the (j, i, k)
    * triple space is O(B³) rows of a BOUNDED table (B ≈ dozens), never
    * corpus-sized; the corpus is touched exactly once by the bucket
    * count.
    *
    * Returns (bucket, n, pos, raw_rate_ppm, iso_rate_ppm),
    * bucket-ordered; iso_rate_ppm is nondecreasing. */
  def isotonicCalibration(
      df: DataFrame,
      xCol: String,
      labelCol: String,
      bucketWidthMicro: Long = 10000000L): DataFrame = {
    require(bucketWidthMicro > 0,
      s"isotonicCalibration: need bucketWidthMicro > 0, got $bucketWidthMicro")
    import org.apache.spark.sql.expressions.Window
    val b = df
      .where(col(xCol).isNotNull && col(xCol) >= 0 && col(labelCol).isNotNull)
      .groupBy(expr(s"CAST(CAST(floor(CAST($xCol AS DOUBLE) * 1000000) AS BIGINT) " +
        s"div $bucketWidthMicro AS BIGINT)").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("pos"))
    // bucket-bounded ladder: ≤ 10⁶ div bucketWidthMicro + 1 rows
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = b
      .withColumn("_cn", sum(col("n")).over(w))
      .withColumn("_cp", sum(col("pos")).over(w))
    // interval table (j ≤ k) over the bounded bucket set
    val lo = pre.select(col("bucket").as("_j"),
      (col("_cn") - col("n")).as("_cnj"), (col("_cp") - col("pos")).as("_cpj"))
    val hi = pre.select(col("bucket").as("_k"),
      col("_cn").as("_cnk"), col("_cp").as("_cpk"))
    val ivl = lo.join(hi, col("_j") <= col("_k"))
      .select(col("_j"), col("_k"),
        expr("CAST((_cpk - _cpj) * 1000000 div (_cnk - _cnj) AS BIGINT)").as("_avg"))
    // fit(i) = max over j ≤ i of (min over k ≥ i of avg[j,k])
    val tri = ivl.join(b.select(col("bucket").as("_i")),
        col("_j") <= col("_i") && col("_i") <= col("_k"))
      .groupBy(col("_i"), col("_j")).agg(min(col("_avg")).as("_mn"))
      .groupBy(col("_i")).agg(max(col("_mn")).as("iso_rate_ppm"))
    b.join(tri, b("bucket") === tri("_i"))
      .select(col("bucket"), col("n"), col("pos"),
        expr("CAST(pos * 1000000 div n AS BIGINT)").as("raw_rate_ppm"),
        col("iso_rate_ppm"))
      .orderBy("bucket")
  }

  /** TWO-SAMPLE CRAMÉR–VON MISES drift statistic — the whole-curve
    * companion to the KS max-gap (p135): T integrates the SQUARED CDF
    * gap over the merged sample, so many small shifts that never break
    * the KS max still register. Exact integers end to end: at each
    * merged distinct value v, the gap numerator is `m·cum1 − n·cum2`
    * (both cumulative counts), weighted by the merged point count at v;
    * `t_ppm = Σ w·(m·cum1 − n·cum2)² · 10⁶ div (n·m·(n+m)²)` — the
    * standard nm/(n+m)²·Σw(F1−F2)² scaling with ONE integral division
    * at the end. DECIMAL(38,0) keeps every product exact past 10⁹ rows
    * per side.
    *
    * Shape: one (value, side) partial agg, cumulative sums over the
    * value-cardinality-bounded merged table, a 1-row broadcast of
    * (n, m). Returns one row (n, m, t_ppm). */
  def cvmDrift(
      df: DataFrame,
      valueCol: String,
      sideCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = DecimalType(38, 0)
    val per = df
      .where(col(valueCol).isNotNull && col(sideCol).isNotNull)
      .groupBy(floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long")
        .as("_v"))
      .agg(sum(when(col(sideCol).cast("boolean"), 1L).otherwise(0L)).as("_c1"),
        sum(when(col(sideCol).cast("boolean"), 0L).otherwise(1L)).as("_c2"))
    // unpartitioned ladder bounded by |distinct micro values| (≤ 10⁶+1
    // under the micro quantization — the winsorize doc-contract bound)
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.agg(sum(col("_c1")).as("_n"), sum(col("_c2")).as("_m"))
    per
      .withColumn("_u1", sum(col("_c1")).over(w))
      .withColumn("_u2", sum(col("_c2")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("_n"), col("_m"),
        ((col("_c1") + col("_c2")).cast(d) *
          (col("_m").cast(d) * col("_u1") - col("_n").cast(d) * col("_u2")) *
          (col("_m").cast(d) * col("_u1") - col("_n").cast(d) * col("_u2")))
          .as("_term"))
      .groupBy(col("_n"), col("_m")).agg(sum(col("_term")).as("_num"))
      .select(col("_n").as("n"), col("_m").as("m"),
        expr("CAST(_num * 1000000 div (CAST(_n AS DECIMAL(38,0)) * _m * " +
          "(_n + _m) * (_n + _m)) AS BIGINT)").as("t_ppm"))
  }

  /** EFFECTIVE SAMPLE SIZE of an importance-weighted corpus — Kish's
    * ESS = (Σw)²/Σw², the one number that says whether a reweighted
    * dataset (DSIR, temperature sampling, inverse-propensity) still
    * carries real evidence or has collapsed onto a handful of documents.
    * `ess_ratio_ppm` = ESS/n in ppm: 10⁶ means uniform weights, → 0
    * means degenerate.
    *
    * Weights must be positive integers (micro-quantize or power-of-two
    * scale upstream; any common scale cancels in the ratio). ONE
    * map-combined global aggregate over exact DECIMAL(38,0) moments;
    * integral divisions only. Returns one row
    * (n, sum_w, ess, ess_ratio_ppm). */
  def effectiveSampleSize(
      df: DataFrame,
      weightCol: String): DataFrame = {
    val d = DecimalType(38, 0)
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .agg(count(lit(1)).as("n"),
        sum(col(weightCol).cast(d)).as("_sw"),
        sum(col(weightCol).cast(d) * col(weightCol).cast(d)).as("_sw2"))
      .select(col("n"),
        col("_sw").cast("long").as("sum_w"),
        expr("CAST(_sw * _sw div _sw2 AS BIGINT)").as("ess"),
        expr("CAST(_sw * _sw * 1000000 div (_sw2 * n) AS BIGINT)")
          .as("ess_ratio_ppm"))
  }

  /** 1-D DECISION STUMP by Gini purity — the exact best-threshold
    * screen ("does this feature split the label at all, and where")
    * that tree libraries answer per node; here as a standalone feature-
    * triage operator. Candidate splits are `x ≤ t` for every distinct
    * value t with a non-empty right side; the score is the CHILD PURITY
    * `Σ_c (pos_c² + neg_c²)·10⁶ div n_c` (maximizing it minimizes
    * weighted Gini — same argmax, no 1−… subtraction to round), an
    * integral ppm so every engine picks the identical winner; ties
    * break toward the smaller threshold.
    *
    * Shape: ONE partial agg collapses the corpus to per-distinct-x
    * (n, pos) — after that everything is value-cardinality bounded:
    * prefix counts are a window over the bounded table (the
    * [[paretoFrontier]] contract; blocked two-pass prefix sums if x is
    * corpus-cardinality), totals ride a broadcast. DECIMAL(38,0)
    * squares — exact past 10⁹ rows per side.
    *
    * Returns the top-`topK` splits (threshold_micro, n_left, pos_left,
    * n_right, pos_right, purity_ppm), best first. */
  def giniSplit(
      df: DataFrame,
      xCol: String,
      labelCol: String,
      topK: Int = 5): DataFrame = {
    require(topK >= 1, s"giniSplit: need topK >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val per = df
      .where(col(xCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(floor(col(xCol).cast("double") * lit(1000000.0d)).cast("long")
        .as("_x"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("_p"))
    // distinct-micro-value-bounded ladder (winsorize doc contract)
    val w = Window.orderBy(col("_x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.agg(sum(col("_n")).as("_tn"), sum(col("_p")).as("_tp"))
    per
      .withColumn("_nl", sum(col("_n")).over(w))
      .withColumn("_pl", sum(col("_p")).over(w))
      .crossJoin(broadcast(tot))
      .where(col("_nl") < col("_tn")) // right side must be non-empty
      .select(col("_x").as("threshold_micro"),
        col("_nl").as("n_left"), col("_pl").as("pos_left"),
        (col("_tn") - col("_nl")).as("n_right"),
        (col("_tp") - col("_pl")).as("pos_right"))
      .withColumn("purity_ppm",
        expr("CAST((CAST(pos_left AS DECIMAL(38,0)) * pos_left + " +
          "CAST(n_left - pos_left AS DECIMAL(38,0)) * (n_left - pos_left)) " +
          "* 1000000 div n_left AS BIGINT) + " +
          "CAST((CAST(pos_right AS DECIMAL(38,0)) * pos_right + " +
          "CAST(n_right - pos_right AS DECIMAL(38,0)) * (n_right - pos_right)) " +
          "* 1000000 div n_right AS BIGINT)"))
      .orderBy(col("purity_ppm").desc, col("threshold_micro"))
      .limit(topK)
  }

  /** THEIL–SEN ROBUST SLOPE per group — the lower median of all
    * pairwise slopes (y_j−y_i)/(x_j−x_i) over distinct-x pairs, the
    * outlier-proof trend line (breakdown point ~29%) that [[groupSlope]]'s
    * OLS can't give: one wild row drags OLS arbitrarily, moves the
    * pair-slope median not at all.
    *
    * Integer-exact: both axes micro-quantize; each pair slope is the
    * re-signed integral ppm `sgn(Δy)·(|Δy|·10⁶ div Δx)` with Δx > 0 by
    * construction (the join orders pairs by x, equal-x pairs are
    * excluded — standard Theil–Sen). The median is the value at rank
    * ⌈m/2⌉ of the slope order (LOWER median — an exact integer, never
    * an average of two), picked by row_number; ties at the cut value
    * make the PICKED VALUE deterministic regardless of peer order.
    *
    * Shape: ONE group-keyed self-equi-join (pairs never cross groups)
    * then one group exchange for the count + rank windows. Per-group
    * cost is O(g²) — the declared bounded-group contract (per-user
    * event series, per-entity time series); for a pathological giant
    * group, sample the group to √budget rows upstream (Theil–Sen on a
    * subsample is still a consistent estimator) — documented, not
    * silently applied. Returns (key, n, n_pairs, slope_ppm) for groups
    * with ≥ `minN` rows and ≥ 1 distinct-x pair. */
  def theilSenSlope(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String,
      minN: Long = 3L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol).as("_k"),
        floor(col(xCol).cast("double") * lit(1000000.0d)).cast("long").as("_x"),
        floor(col(yCol).cast("double") * lit(1000000.0d)).cast("long").as("_y"))
    val n = b.groupBy(col("_k")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minN)
    val pairs = b.as("l")
      .join(b.as("r"), col("l._k") === col("r._k") && col("l._x") < col("r._x"))
      .select(col("l._k").as("_k"),
        (col("r._y") - col("l._y")).as("_dy"),
        (col("r._x") - col("l._x")).as("_dx"))
      .select(col("_k"),
        (when(col("_dy") >= 0, lit(1L)).otherwise(lit(-1L)) *
          expr("CAST(abs(_dy) * CAST(1000000 AS BIGINT) div _dx AS BIGINT)"))
          .as("_s"))
    val wCnt = Window.partitionBy(col("_k"))
    val wRank = Window.partitionBy(col("_k")).orderBy(col("_s"))
    pairs
      .withColumn("_m", count(lit(1)).over(wCnt))
      .withColumn("_rn", row_number().over(wRank))
      .where(col("_rn") === expr("CAST((_m + 1) div 2 AS INT)"))
      .join(n, Seq("_k"))
      .select(col("_k").as(keyCol), col("n"), col("_m").as("n_pairs"),
        col("_s").as("slope_ppm"))
  }

  /** KENDALL τ-b via the BOUNDED JOINT CONTINGENCY table — the ordinal
    * concordance test, exact including the tie corrections, computed
    * without ever forming row pairs: ONE partial agg collapses the
    * corpus to (x, y, count) cells, and concordant/discordant mass is a
    * cells×cells broadcast comparison (the declared bounded-side
    * broadcast-NL scorer shape, |X|·|Y| cells — discounts × quantities,
    * not rows). A corpus-cardinality x or y does not fit this operator;
    * quantize to buckets upstream first.
    *
    * All pair counts are exact DECIMAL(38,0): C and D count unordered
    * row pairs with x strictly ordered (each such pair hits exactly one
    * ordered cell pair under the x2 > x1 restriction); tie terms n1/n2
    * are Σ t(t−1)/2 over the marginal counts; τ-b =
    * (C−D)/√((n0−n1)(n0−n2)) with float entering only at the final
    * division, round-6, +0.0. Returns ONE row
    * (n, concordant, discordant, tau_b). */
  def kendallTau(
      df: DataFrame,
      xCol: String,
      yCol: String): DataFrame = {
    val d = DecimalType(38, 0)
    def q(c: String): Column =
      floor(col(c).cast("double") * lit(1000000.0d)).cast("long")
    val cells = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(q(xCol).as("_x"), q(yCol).as("_y"))
      .agg(count(lit(1)).as("_c"))
    val a = cells.select(col("_x").as("_x1"), col("_y").as("_y1"),
      col("_c").as("_c1"))
    val b = cells.select(col("_x").as("_x2"), col("_y").as("_y2"),
      col("_c").as("_c2"))
    val cd = a.join(broadcast(b), col("_x2") > col("_x1"))
      .agg(
        sum(when(col("_y2") > col("_y1"),
          col("_c1").cast(d) * col("_c2").cast(d)).otherwise(lit(0).cast(d)))
          .as("_conc"),
        sum(when(col("_y2") < col("_y1"),
          col("_c1").cast(d) * col("_c2").cast(d)).otherwise(lit(0).cast(d)))
          .as("_disc"))
    val nRow = cells.agg(sum(col("_c")).as("_n"))
    val tx = cells.groupBy(col("_x")).agg(sum(col("_c")).as("_t"))
      .agg(sum(col("_t").cast(d) * (col("_t") - 1).cast(d)).as("_n1x2"))
    val ty = cells.groupBy(col("_y")).agg(sum(col("_c")).as("_t"))
      .agg(sum(col("_t").cast(d) * (col("_t") - 1).cast(d)).as("_n2x2"))
    cd.crossJoin(nRow).crossJoin(tx).crossJoin(ty)
      .select(
        col("_n").cast("long").as("n"),
        col("_conc").cast("long").as("concordant"),
        col("_disc").cast("long").as("discordant"),
        {
          val n = col("_n").cast(d)
          // doubled pair counts: n0·2 = n(n−1), tie terms already ×2
          val n0x2 = n * (n - 1)
          val denom = (n0x2 - col("_n1x2")) * (n0x2 - col("_n2x2"))
          when(denom <= 0, lit(null).cast("double"))
            .otherwise(round(
              (col("_conc") - col("_disc")).cast("double") * lit(2.0d) /
                sqrt(denom.cast("double")), 6) + lit(0.0d))
            .as("tau_b")
        })
  }

  /** NEAREST-NEIGHBOR MATCHING with replacement + caliper — the
    * matching estimator behind ATT readouts (Rosenbaum & Rubin's
    * propensity matching, or any 1-D covariate index): every TREATED
    * unit is paired with the closest CONTROL on a pre-quantized
    * integer score, provided the gap is within `caliperMicro`;
    * controls may be reused (with-replacement matching — the
    * deterministic, embarrassingly-parallel variant; without
    * replacement is inherently sequential and deliberately out).
    * ATT = avg(dy_micro) over the returned table; treated units with
    * no in-caliper control are simply absent (report them by anti-join
    * on the result).
    *
    * INTEGER-EXACT and deterministic: scores and outcomes arrive as
    * BIGINT micro (callers quantize with the p59 floor recipe or an
    * integral mean); the best control is `min(struct(|Δ|, control
    * id))` — total order, no RNG, no floats anywhere.
    *
    * Scale shape: candidates come ONLY from a banded equi-join on
    * `score div caliperMicro` blocks (each treated probes its block
    * ±1, which provably covers every |Δ| ≤ caliper) — never
    * all-pairs; the fold is one partial agg on the treated id. A
    * mass of controls at one popular score is a hot block — the
    * [[graft.ops.SkewJoin]] salting case, same knob as every banded
    * join here.
    *
    * Returns (treated_id, control_id, dist_micro, y_treated_micro,
    * y_control_micro, dy_micro). */
  def nnMatchAtt(
      units: DataFrame,
      idCol: String,
      treatCol: String,
      scoreMicroCol: String,
      yMicroCol: String,
      caliperMicro: Long = 100000L): DataFrame = {
    require(caliperMicro >= 1, s"nnMatchAtt: need caliperMicro >= 1, got $caliperMicro")
    val base = units.select(col(idCol).as("_id"),
      col(treatCol).cast("boolean").as("_t"),
      col(scoreMicroCol).cast("long").as("_s"),
      col(yMicroCol).cast("long").as("_y"))
      .where(col("_s").isNotNull)
    val treated = base.where(col("_t"))
      .select(col("_id").as("treated_id"), col("_s").as("_st"), col("_y").as("_yt"))
      .withColumn("_blk", explode(array(
        expr(s"_st div ${caliperMicro}L - 1"),
        expr(s"_st div ${caliperMicro}L"),
        expr(s"_st div ${caliperMicro}L + 1"))))
    val controls = base.where(!col("_t"))
      .select(col("_id").as("_cid"), col("_s").as("_sc"), col("_y").as("_yc"),
        expr(s"_s div ${caliperMicro}L").as("_blk"))
    treated.join(controls, Seq("_blk"))
      .withColumn("_dist", abs(col("_st") - col("_sc")))
      .where(col("_dist") <= caliperMicro)
      .groupBy(col("treated_id"))
      .agg(max(col("_yt")).as("y_treated_micro"),
        min(struct(col("_dist"), col("_cid"), col("_yc"))).as("_best"))
      .select(col("treated_id"), col("_best._cid").as("control_id"),
        col("_best._dist").as("dist_micro"),
        col("y_treated_micro"), col("_best._yc").as("y_control_micro"),
        (col("y_treated_micro") - col("_best._yc")).as("dy_micro"))
  }

  /** MANN–WHITNEY U (Wilcoxon rank-sum) two-sample test — the standard
    * nonparametric A/B decision for a non-normal metric (latency, spend),
    * tie-corrected, INTEGER-EXACT end to end. Mann & Whitney 1947;
    * normal approximation with the standard tie correction
    * σ² = (n₁n₂/12)·[(n+1) − Σ(t³−t)/(n(n−1))].
    *
    * Exactness without a sort of the corpus: values collapse to a
    * DISTINCT-VALUE-bounded (value → per-group count) table (the
    * [[graft.ops.RankLadder]] shape), the running count over that
    * bounded table gives every tie block's midrank DOUBLED
    * (2·midrank = 2·cum_before + t + 1 — an odd integer, so rank sums
    * stay integral), and the final z² and its α = 0.05 decision come
    * from the `mw_z2` native kernel (arbitrary-precision BigInt — the
    * interior is ~n⁶, past any fixed DECIMAL) by the exact
    * cross-multiplication against χ²₁ = 3.841459 (the
    * [[Governance.mcnemar]] convention; a boundary tie is NOT
    * significant). z2_ppm is the floored ppm statistic.
    *
    * Contract: EXACTLY two distinct non-null groups among rows with a
    * non-null value — anything else raises in-plan (never a silent
    * one-sided answer); `group_a` is the lexicographically smaller
    * label. Empty input → empty output. Doubled statistics (`u_a_x2`,
    * `u_b_x2`) keep everything integer: u_a_x2 + u_b_x2 = 2·n_a·n_b
    * by construction.
    *
    * Returns ONE row (group_a, group_b, n_a, n_b, u_a_x2, u_b_x2,
    * sum_ties, z2_ppm, significant_05). */
  /** The ONE Mann–Whitney tied-rank ladder, shared by [[mannWhitney]]
    * (p281's integer-exact z² surface) and [[graft.ops.EventsOps
    * .mannWhitneyU]] (p171's caller-keyed U + float-z surface — the two
    * surfaces are intentional API: different output contracts on the
    * same statistic, one rank kernel underneath). Input: a
    * DISTINCT-VALUE count table with `_v` (any orderable type) and the
    * two sides' counts `_c1`/`_c2` (plus any passthrough columns);
    * appends the tie-block total `_ct` and the DOUBLED midrank
    * `_mr2 = 2·cum_before + ct + 1` (min rank + max rank of the tied
    * run — an odd integer, so rank sums stay integral). The global
    * window rides only the value-cardinality-bounded table. */
  private[ops] def mwTiedRankLadder(byV: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byV.withColumn("_ct", col("_c1") + col("_c2"))
      .withColumn("_mr2",
        lit(2L) * coalesce(sum(col("_ct")).over(wPrev), lit(0L)) +
          col("_ct") + lit(1L))
  }

  def mannWhitney(
      df: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val rows = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("_g"),
        col(valueCol).cast("double").as("_v"))
    val perVG = rows.groupBy(col("_v"), col("_g")).agg(count(lit(1)).as("_c"))
    // 1-row group frame: smallest label = group_a; the distinct-group
    // count rides along so the 2-group contract can raise in-plan
    val gAgg = perVG.agg(min(col("_g")).as("_gaN"), max(col("_g")).as("_gbN"),
      countDistinct(col("_g")).as("_ng"))
    val byV = perVG.crossJoin(broadcast(gAgg))
      .groupBy(col("_v"))
      .agg(
        sum(when(col("_g") === col("_gaN"), col("_c")).otherwise(0L)).as("_c1"),
        sum(when(col("_g") =!= col("_gaN"), col("_c")).otherwise(0L)).as("_c2"),
        max(col("_ng")).as("_ng"),
        max(col("_gaN")).as("_ga"), max(col("_gbN")).as("_gb"))
    // the shared ladder's global window rides the distinct-value-
    // bounded table only
    val ranked = mwTiedRankLadder(byV)
    val d38 = DecimalType(38, 0)
    val stats = ranked
      // grouping on the (constant) group labels keeps empty-in → empty-out
      .groupBy(col("_ga"), col("_gb"))
      .agg(
        max(col("_ng")).as("_ng"),
        sum(col("_c1")).as("_n1"),
        sum(col("_c2")).as("_n2"),
        sum((col("_c1").cast(d38) * col("_mr2")).cast(d38)).cast(d38).as("_twoR1"),
        sum((col("_ct").cast(d38) * col("_ct") * col("_ct") - col("_ct")).cast(d38))
          .cast(d38).as("_sumT"))
    val twoU1 = (col("_twoR1") - col("_n1").cast(d38) * (col("_n1") + lit(1L))).cast(d38)
    val dStat = (twoU1 - col("_n1").cast(d38) * col("_n2")).cast(d38)
    val kernel = graft.functions.GraftFunctions.mw_z2(
      dStat, col("_n1").cast(d38), col("_n2").cast(d38), col("_sumT"))
    stats
      .select(
        when(col("_ng") =!= 2, raise_error(concat(
          lit("mannWhitney: need exactly 2 groups with non-null values, got "),
          col("_ng").cast("string")))).otherwise(col("_ga")).as("group_a"),
        col("_gb").as("group_b"),
        col("_n1").as("n_a"), col("_n2").as("n_b"),
        twoU1.cast("long").as("u_a_x2"),
        (lit(2L).cast(d38) * col("_n1") * col("_n2") - twoU1).cast("long").as("u_b_x2"),
        col("_sumT").cast("long").as("sum_ties"),
        kernel.getField("z2_ppm").cast("long").as("z2_ppm"),
        kernel.getField("significant_05").as("significant_05"))
  }

  /** COHEN'S D standardized effect size (+ the Hedges g small-sample
    * correction) between two groups — the number a significance test
    * deliberately is not: [[mannWhitney]] says whether arms differ,
    * this says by HOW MUCH in pooled-standard-deviation units (Cohen
    * 1988; Hedges 1981), the scale meta-analyses and power planning
    * run on. d = (m̄_a − m̄_b)/s_pooled with s²_pooled =
    * ((n_a−1)s²_a + (n_b−1)s²_b)/(n_a+n_b−2);
    * g = d·(1 − 3/(4(n_a+n_b)−9)).
    *
    * Float policy (the [[msprt]] moment contract): per-arm counts,
    * micro sums and micro² sums of squares are EXACT DECIMAL(38,0)
    * partials; every scalar is ONE round-6 division of exact integer
    * moments in pinned operand order, in NATURAL units (means
    * ÷ n·10⁶, variances ÷ n(n−1)·10¹²); pooled variance, d and g are
    * round-6 folds of already-rounded scalars. An arm with < 2
    * observations or a zero pooled variance yields NULL d/g — never a
    * division blow-up. Exactly two groups required — raises in-plan
    * (the [[mannWhitney]] contract; `group_a` is the lexicographically
    * smaller label and d is a-minus-b).
    *
    * Shape: ONE conditional scalar aggregate over the corpus —
    * map-side partials, a 1-row fold, nothing driver-side. Empty
    * input → empty output.
    *
    * Returns ONE row (group_a, group_b, n_a, n_b, mean_a, mean_b,
    * sd_pooled, cohens_d, hedges_g). */
  def cohensD(
      df: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val d38 = DecimalType(38, 0)
    val rows = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("_g"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long")
          .as("_v"))
    val gAgg = rows.agg(min(col("_g")).as("_gaN"), max(col("_g")).as("_gbN"),
      countDistinct(col("_g")).as("_ng"))
    val m = rows.crossJoin(broadcast(gAgg))
      .groupBy(col("_gaN").as("_ga"), col("_gbN").as("_gb"))
      .agg(
        max(col("_ng")).as("_ngx"),
        sum(when(col("_g") === col("_gaN"), 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_g") =!= col("_gaN"), 1L).otherwise(0L)).as("_cb"),
        sum(when(col("_g") === col("_gaN"), col("_v").cast(d38))
          .otherwise(lit(0).cast(d38)).cast(d38)).cast(d38).as("_sa"),
        sum(when(col("_g") =!= col("_gaN"), col("_v").cast(d38))
          .otherwise(lit(0).cast(d38)).cast(d38)).cast(d38).as("_sb"),
        sum(when(col("_g") === col("_gaN"),
          col("_v").cast(d38) * col("_v")).otherwise(lit(0).cast(d38))
          .cast(d38)).cast(d38).as("_qa"),
        sum(when(col("_g") =!= col("_gaN"),
          col("_v").cast(d38) * col("_v")).otherwise(lit(0).cast(d38))
          .cast(d38)).cast(d38).as("_qb"))
    val scal = m
      .withColumn("mean_a",
        round(expr("CAST(_sa AS DOUBLE)") /
          (col("_ca").cast("double") * lit(1.0e6d)), 6) + lit(0.0d))
      .withColumn("mean_b",
        round(expr("CAST(_sb AS DOUBLE)") /
          (col("_cb").cast("double") * lit(1.0e6d)), 6) + lit(0.0d))
      .withColumn("_va",
        when(col("_ca") < 2L, lit(null).cast("double")).otherwise(
          round(expr("CAST(_qa * _ca - _sa * _sa AS DOUBLE)") /
            (col("_ca").cast("double") * (col("_ca") - 1L) *
              lit(1.0e12d)), 6) + lit(0.0d)))
      .withColumn("_vb",
        when(col("_cb") < 2L, lit(null).cast("double")).otherwise(
          round(expr("CAST(_qb * _cb - _sb * _sb AS DOUBLE)") /
            (col("_cb").cast("double") * (col("_cb") - 1L) *
              lit(1.0e12d)), 6) + lit(0.0d)))
      .withColumn("_vp",
        when(col("_va").isNull || col("_vb").isNull,
          lit(null).cast("double")).otherwise(
          round(((col("_ca") - 1L).cast("double") * col("_va") +
            (col("_cb") - 1L).cast("double") * col("_vb")) /
            (col("_ca") + col("_cb") - 2L).cast("double"), 6) + lit(0.0d)))
      .withColumn("sd_pooled",
        when(col("_vp").isNull, lit(null).cast("double"))
          .otherwise(round(sqrt(col("_vp")), 6) + lit(0.0d)))
      .withColumn("cohens_d",
        when(col("sd_pooled").isNull || col("sd_pooled") <= 0.0d,
          lit(null).cast("double")).otherwise(
          round((col("mean_a") - col("mean_b")) / col("sd_pooled"), 6)
            + lit(0.0d)))
      .withColumn("hedges_g",
        when(col("cohens_d").isNull, lit(null).cast("double")).otherwise(
          round(col("cohens_d") * (lit(1.0d) - lit(3.0d) /
            (lit(4.0d) * (col("_ca") + col("_cb")).cast("double")
              - lit(9.0d))), 6) + lit(0.0d)))
    scal.select(
      when(col("_ngx") =!= 2, raise_error(concat(
        lit("cohensD: need exactly 2 groups with non-null values, got "),
        col("_ngx").cast("string")))).otherwise(col("_ga")).as("group_a"),
      col("_gb").as("group_b"),
      col("_ca").as("n_a"), col("_cb").as("n_b"),
      col("mean_a"), col("mean_b"), col("sd_pooled"),
      col("cohens_d"), col("hedges_g"))
  }

  /** TWO-SAMPLE ANDERSON–DARLING test — the distribution-equality test
    * with TAIL sensitivity (Pettitt 1976; the tie-aware A²_akN form of
    * Scholz & Stephens 1987 eq. 7 with midrank cumulatives): KS sees
    * the biggest CDF gap, Cramér–von Mises the average, AD weights the
    * tails by 1/(F(1−F)) — the test that catches "same median,
    * different extremes", which is exactly where value distributions
    * drift first. Completes the in-engine KS (p135) / CvM (p242) /
    * AD trio on THE SAME [[mwTiedRankLadder]] kernel.
    *
    * Arithmetic: the ladder's doubled midrank cumulatives keep every
    * B/M quantity integer (2B = 2·cumℓ − ℓ, 2Mᵢ = 2·cumᵢ − cᵢ); each
    * distinct value contributes per-sample round-6 terms
    * ℓ·(N·2Mᵢ − nᵢ·2B)²/4 ÷ (N·nᵢ·(2B(2N−2B) − Nℓ)/4) computed as
    * ONE division of exact DECIMAL integer products cast to double in
    * pinned order; A² is round-6 of (N−1)/N times the round-6 term
    * sum. `significant_05` compares round-6 A² against the asymptotic
    * upper-5% point 2.492 (Pettitt 1976, table 1 — the two-sample A²
    * shares the one-sample limit law). A degenerate pooled sample
    * (single distinct value) yields A² = 0. Exactly two groups
    * required — raises in-plan.
    *
    * Shape: ONE (value, group) partial agg collapses the corpus; the
    * ladder and term fold ride the distinct-value-bounded table.
    * Empty input → empty output. Returns ONE row (group_a, group_b,
    * n_a, n_b, a2, significant_05). */
  def andersonDarling(
      df: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val rows = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("_g"),
        col(valueCol).cast("double").as("_v"))
    val perVG = rows.groupBy(col("_v"), col("_g")).agg(count(lit(1)).as("_c"))
    val gAgg = perVG.agg(min(col("_g")).as("_gaN"), max(col("_g")).as("_gbN"),
      countDistinct(col("_g")).as("_ng"))
    val byV = perVG.crossJoin(broadcast(gAgg))
      .groupBy(col("_v"))
      .agg(
        sum(when(col("_g") === col("_gaN"), col("_c")).otherwise(0L)).as("_c1"),
        sum(when(col("_g") =!= col("_gaN"), col("_c")).otherwise(0L)).as("_c2"),
        max(col("_ng")).as("_ng"),
        max(col("_gaN")).as("_ga"), max(col("_gbN")).as("_gb"))
    // distinct-value-bounded ladder (the mwTiedRankLadder contract)
    val wRun = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val laddered = mwTiedRankLadder(byV)
      .withColumn("_cum1", sum(col("_c1")).over(wRun))
      .withColumn("_cumT", sum(col("_ct")).over(wRun))
      .withColumn("_n1", sum(col("_c1")).over(wAll))
      .withColumn("_n2", sum(col("_c2")).over(wAll))
      .withColumn("_nn", col("_n1") + col("_n2"))
      // doubled midrank cumulatives: integers by construction
      .withColumn("_b2", (lit(2L) * col("_cumT") - col("_ct")).cast(d38))
      .withColumn("_m21", (lit(2L) * col("_cum1") - col("_c1")).cast(d38))
      .withColumn("_m22", (lit(2L) * (col("_cumT") - col("_cum1")) -
        (col("_ct") - col("_c1"))).cast(d38))
      // 4·(B(N−B) − Nℓ/4), exact DECIMAL
      .withColumn("_den4", (col("_b2") * (lit(2L) * col("_nn") - col("_b2")) -
        col("_nn") * col("_ct")).cast(d38))
    def term(m2: Column, ni: Column): Column = {
      val num = (col("_nn").cast(d38) * m2 - ni.cast(d38) * col("_b2")).cast(d38)
      when(col("_den4") <= 0L || ni === 0L, lit(0.0d)).otherwise(
        round((col("_ct").cast("double") * num.cast("double") *
          num.cast("double")) /
          (col("_nn").cast("double") * ni.cast("double") *
            col("_den4").cast("double")), 6) + lit(0.0d))
    }
    val terms = laddered
      .withColumn("_t", term(col("_m21"), col("_n1")) +
        term(col("_m22"), col("_n2")))
    val agg = terms.groupBy(col("_ga"), col("_gb"))
      .agg(max(col("_ng")).as("_ngx"),
        max(col("_n1")).as("n_a"), max(col("_n2")).as("n_b"),
        max(col("_nn")).as("_nt"),
        (round(sum(col("_t")), 6) + lit(0.0d)).as("_s"))
    agg.select(
      when(col("_ngx") =!= 2, raise_error(concat(
        lit("andersonDarling: need exactly 2 groups with non-null " +
          "values, got "), col("_ngx").cast("string"))))
        .otherwise(col("_ga")).as("group_a"),
      col("_gb").as("group_b"), col("n_a"), col("n_b"),
      (round((col("_nt") - 1L).cast("double") / col("_nt") * col("_s"), 6)
        + lit(0.0d)).as("a2"))
      .withColumn("significant_05", col("a2") > lit(2.492d))
  }

  /** KRUSKAL–WALLIS rank test across K groups — [[mannWhitney]]'s
    * k-group generalization (Kruskal & Wallis 1952), the nonparametric
    * one-way "do these k sources/segments draw from the same value
    * distribution" answer. Built on THE SAME [[mwTiedRankLadder]]
    * kernel: the two-sided ladder runs with all mass on one side
    * (`_c1 = ct, _c2 = 0`), the doubled midranks join back to the
    * per-(group, value) count table for exact integer doubled rank
    * sums, and the tie-corrected H evaluates in the [[graft.functions
    * .GraftFunctions.kw_h]] BigInt kernel (pinned floor-micro
    * composition — see its Scaladoc; the interior is ~N⁴, past any
    * fixed DECIMAL).
    *
    * At least 2 groups required — raises in-plan. No significance
    * column: the χ² critical value depends on df = k−1, so the
    * decision belongs to the caller against their pinned cut. Empty
    * input → empty output.
    *
    * Shape: ONE (value, group) partial agg collapses the corpus; the
    * ladder, the per-group fold and the ≤ |groups| arrays ride bounded
    * tables. Returns ONE row (n_groups, n_total, sum_ties, h_ppm, df). */
  def kruskalWallis(
      df: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val d38 = DecimalType(38, 0)
    val rows = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("_g"),
        col(valueCol).cast("double").as("_v"))
    val perVG = rows.groupBy(col("_v"), col("_g")).agg(count(lit(1)).as("_c"))
    val byV = perVG.groupBy(col("_v"))
      .agg(sum(col("_c")).as("_c1"))
      .withColumn("_c2", lit(0L))
    val ranked = mwTiedRankLadder(byV).select(col("_v"), col("_ct"), col("_mr2"))
    val perG = perVG.join(ranked, Seq("_v"))
      .groupBy(col("_g"))
      .agg(sum(col("_c")).as("_ng"),
        sum((col("_c").cast(d38) * col("_mr2")).cast(d38)).cast(d38).as("_r2"))
    val ties = ranked.agg(
      coalesce(sum((col("_ct").cast(d38) * col("_ct") * col("_ct") -
        col("_ct")).cast(d38)), lit(0).cast(d38)).cast(d38).as("_sumT"))
    val gathered = perG
      .groupBy(lit(1).as("_one"))
      .agg(count(lit(1)).cast("int").as("n_groups"),
        sum(col("_ng")).as("n_total"),
        expr("transform(sort_array(collect_list(struct(_g, _r2, _ng))), " +
          "x -> CAST(x._r2 AS DECIMAL(38,0)))").as("_r2s"),
        expr("transform(sort_array(collect_list(struct(_g, _r2, _ng))), " +
          "x -> CAST(x._ng AS DECIMAL(38,0)))").as("_ns"))
      .crossJoin(broadcast(ties))
    val kernel = graft.functions.GraftFunctions.kw_h(
      col("_r2s"), col("_ns"), col("_sumT"))
    gathered.select(
      when(col("n_groups") < 2, raise_error(concat(
        lit("kruskalWallis: need at least 2 groups with non-null values, " +
          "got "), col("n_groups").cast("string"))))
        .otherwise(col("n_groups")).as("n_groups"),
      col("n_total"),
      col("_sumT").cast("long").as("sum_ties"),
      kernel.getField("h_ppm").cast("long").as("h_ppm"),
      kernel.getField("df").as("df"))
  }

  /** FRIEDMAN TEST for k treatments over n blocks (Friedman 1937;
    * Conover 1999's tie-corrected T1) — the repeated-measures
    * complement to [[kruskalWallis]]: KW compares INDEPENDENT groups,
    * Friedman ranks treatments WITHIN each subject so between-subject
    * variation never pollutes the comparison (per-user variant
    * rankings, per-document scorer comparisons). With within-block
    * average-rank ties,
    *
    *   T1 = (k−1)·Σⱼ(Rⱼ − n(k+1)/2)² / (Σᵢⱼ r²ᵢⱼ − nk(k+1)²/4)
    *
    * which in DOUBLED ranks (2·avgrank = 2·minrank + t − 1, an
    * integer) clears to the pure integer rational
    * (k−1)·ΣD²ⱼ / (Σ r2² − nk(k+1)²) with Dⱼ = R2ⱼ − n(k+1) — exact
    * DECIMAL end to end (interior ≤ ~4n²k³, inside DECIMAL(38,0) for
    * any real corpus since k ≤ maxTreatments), `t1_ppm` the floored
    * ppm statistic. No significance column: the χ² cut depends on
    * df = k−1 (the [[kruskalWallis]] convention).
    *
    * Contract: complete blocks only — subjects missing any treatment
    * are LISTWISE-DROPPED (the Friedman requirement; densify upstream
    * if absence means zero), duplicate (subject, treatment) rows raise
    * in-plan, ≥ 2 treatments required, > `maxTreatments` raises.
    * All-tied blocks everywhere → NULL (zero denominator). Empty
    * input → empty output.
    *
    * Shape: ranks ride windows PARTITIONED BY SUBJECT (each partition
    * is one k-bounded block — millions of tiny partitions, the
    * scalable shape); everything after is treatment-bounded. Returns
    * ONE row (n_subjects, k_treatments, t1_ppm, df). */
  def friedman(
      df: DataFrame,
      subjectCol: String,
      treatmentCol: String,
      valueCol: String,
      maxTreatments: Int = 64): DataFrame = {
    require(maxTreatments >= 2 && maxTreatments <= 1024,
      s"friedman: maxTreatments must be in [2, 1024], got $maxTreatments")
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val cells = df
      .where(col(valueCol).isNotNull && col(treatmentCol).isNotNull &&
        col(subjectCol).isNotNull)
      .groupBy(col(subjectCol).cast("string").as("_u"),
        col(treatmentCol).cast("string").as("_j"))
      .agg(count(lit(1)).as("_dup"), max(col(valueCol).cast("double")).as("_v"))
      .select(col("_u"), col("_j"),
        when(col("_dup") > 1L, raise_error(
          lit("friedman: duplicate (subject, treatment) rows")))
          .otherwise(col("_v")).as("_v"))
    val k1 = cells.agg(countDistinct(col("_j")).as("_k"))
    val complete = cells
      .withColumn("_nu", count(lit(1)).over(Window.partitionBy(col("_u"))))
      .crossJoin(broadcast(k1))
      .where(col("_nu") === col("_k"))
      .withColumn("_k",
        when(col("_k") > maxTreatments, raise_error(concat(
          lit(s"friedman: more than $maxTreatments treatments: "),
          col("_k").cast("string")))).otherwise(col("_k")))
    // doubled average rank within the block: 2·minrank + ties − 1
    val wBlk = Window.partitionBy(col("_u")).orderBy(col("_v"))
    val wTie = Window.partitionBy(col("_u"), col("_v"))
    val ranked = complete
      .withColumn("_r2",
        lit(2L) * rank().over(wBlk) + count(lit(1)).over(wTie) - lit(1L))
    val perJ = ranked.groupBy(col("_j"))
      .agg(sum(col("_r2")).cast(d38).as("_R2"),
        count(lit(1)).as("_n"),
        sum((col("_r2").cast(d38) * col("_r2")).cast(d38)).cast(d38)
          .as("_sq"),
        max(col("_k")).as("_kk"))
    perJ
      .groupBy(lit(1).as("_one"))
      .agg(max(col("_n")).as("n_subjects"),
        count(lit(1)).cast("int").as("k_treatments"),
        max(col("_kk")).as("_k"),
        sum(col("_sq")).cast(d38).as("_sumsq"),
        sum(((col("_R2") - col("_n").cast(d38) * (col("_kk") + 1L)) *
          (col("_R2") - col("_n").cast(d38) * (col("_kk") + 1L))).cast(d38))
          .cast(d38).as("_sumD2"))
      .select(
        col("n_subjects"),
        when(col("k_treatments") < 2, raise_error(concat(
          lit("friedman: need at least 2 treatments, got "),
          col("k_treatments").cast("string"))))
          .otherwise(col("k_treatments")).as("k_treatments"),
        {
          val den = (col("_sumsq") -
            col("n_subjects").cast(d38) * col("_k") * (col("_k") + 1L) *
              (col("_k") + 1L)).cast(d38)
          when(den <= 0L, lit(null).cast("long")).otherwise(
            expr("CAST((1000000 * (k_treatments - 1) * _sumD2) div " +
              "(_sumsq - CAST(n_subjects AS DECIMAL(38,0)) * _k * " +
              "(_k + 1) * (_k + 1)) AS BIGINT)"))
            .as("t1_ppm")
        },
        (col("k_treatments") - 1).as("df"))
  }

  /** COCHRAN–ARMITAGE trend test — "does the outcome rate RISE with
    * the dose" for an ordinal exposure and a binary outcome (Cochran
    * 1954; Armitage 1955): more powerful than the unordered χ² exactly
    * when the alternative is monotone (engagement tier → conversion,
    * exposure bucket → churn). The statistic is
    * z² = N(NA − RB)²/(R(N−R)(NQ − B²)) over the five exact corpus
    * sums A = Σsy, B = Σs, R = Σy, N, Q = Σs² — evaluated in the
    * [[graft.functions.GraftFunctions.trend_z2]] BigInt kernel
    * (interior ~N⁴) with the exact cross-multiplied χ²₁ = 3.841459
    * decision. Degenerate outcome or dose (R = 0, R = N, zero score
    * variance) yields NULL, never a division blow-up.
    *
    * `scoreCol` must be an integer dose (raises in-plan on NULL or
    * negative — signed doses would work mathematically, but a negative
    * "dose" is almost always an upstream bug); `outcomeCol` ∈ {0, 1}.
    *
    * Shape: ONE scalar aggregate over the corpus — map-side partials,
    * a 1-row fold, the kernel on the single stats row. Empty input →
    * empty output. Returns ONE row (n, n_cases, z2_ppm,
    * significant_05). */
  def cochranArmitage(
      df: DataFrame,
      scoreCol: String,
      outcomeCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val rows = df.select(
      when(col(scoreCol).isNull || col(scoreCol).cast("long") < 0,
        raise_error(lit("cochranArmitage: dose score must be a " +
          "non-negative integer"))).otherwise(col(scoreCol).cast("long"))
        .as("_s"),
      when(col(outcomeCol).isNull || !col(outcomeCol).cast("int").isin(0, 1),
        raise_error(lit("cochranArmitage: outcome must be 0 or 1")))
        .otherwise(col(outcomeCol).cast("long")).as("_y"))
    val m = rows
      .groupBy(lit(1).as("_one"))
      .agg(
        count(lit(1)).cast(d38).as("_n"),
        sum(col("_y")).cast(d38).as("_r"),
        sum(col("_s")).cast(d38).as("_b"),
        sum((col("_s") * col("_y")).cast(d38)).cast(d38).as("_a"),
        sum((col("_s").cast(d38) * col("_s")).cast(d38)).cast(d38).as("_q"))
    val kernel = graft.functions.GraftFunctions.trend_z2(
      array(col("_a"), col("_b"), col("_r"), col("_n"), col("_q")))
    m.select(
      col("_n").cast("long").as("n"),
      col("_r").cast("long").as("n_cases"),
      kernel.getField("z2_ppm").cast("long").as("z2_ppm"),
      kernel.getField("significant_05").as("significant_05"))
  }

  /** CRONBACH'S ALPHA internal-consistency reliability (Cronbach 1951)
    * — "do these k item scores measure one construct": the per-rater /
    * per-metric reliability audit that complements [[graft.ops
    * .Governance.krippendorffAlpha]]'s agreement coefficient.
    * α = k/(k−1) · (1 − Σᵢvar(itemᵢ)/var(total)) over subjects'
    * complete k-item score vectors.
    *
    * The input is LONG format (subject, item, value); subjects missing
    * any item are EXCLUDED (listwise deletion — the textbook
    * convention; densify with zeros upstream if absence means zero).
    * Duplicate (subject, item) rows raise in-plan.
    *
    * Float policy (the [[msprt]] moment contract): per-item and
    * total-score micro moments are exact DECIMAL(38,0); each variance
    * is ONE round-6 division of exact integers in NATURAL units
    * (÷ n(n−1)·10¹²); Σᵢvarᵢ adds the ≤ k round-6 item variances and
    * is round-6 again; α is round-6 of the final fold. Fewer than 2
    * items, < 2 complete subjects, or zero total variance → NULL α.
    *
    * Shape: ONE (subject, item) partial agg is the only corpus-sized
    * stage; item moments ride the k-bounded table, subject totals one
    * subject-keyed agg. Empty input → empty output. Returns ONE row
    * (n_subjects, k_items, sum_item_var, var_total, cronbach_alpha). */
  def cronbachAlpha(
      df: DataFrame,
      subjectCol: String,
      itemCol: String,
      valueCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val cells = df
      .where(col(valueCol).isNotNull && col(itemCol).isNotNull &&
        col(subjectCol).isNotNull)
      .groupBy(col(subjectCol).cast("string").as("_u"),
        col(itemCol).cast("string").as("_i"))
      .agg(count(lit(1)).as("_dup"),
        sum(floor(col(valueCol).cast("double") * lit(1000000.0d))
          .cast("long")).as("_v"))
      .select(col("_u"), col("_i"),
        when(col("_dup") > 1L, raise_error(
          lit("cronbachAlpha: duplicate (subject, item) rows")))
          .otherwise(col("_v")).as("_v"))
    val k1 = cells.agg(countDistinct(col("_i")).as("_k"))
    // listwise deletion: keep subjects holding ALL k items
    val complete = cells
      .withColumn("_nu", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_u"))))
      .crossJoin(broadcast(k1))
      .where(col("_nu") === col("_k"))
    val itemVar = complete.groupBy(col("_i"))
      .agg(count(lit(1)).as("_c"),
        sum(col("_v").cast(d38)).cast(d38).as("_s"),
        sum((col("_v").cast(d38) * col("_v")).cast(d38)).cast(d38).as("_q"))
      .withColumn("_var",
        when(col("_c") < 2L, lit(null).cast("double")).otherwise(
          round(expr("CAST(_q * _c - _s * _s AS DOUBLE)") /
            (col("_c").cast("double") * (col("_c") - 1L) * lit(1.0e12d)), 6)
            + lit(0.0d)))
      // listwise deletion gives every item the SAME subject count, so
      // either all item variances are defined (n ≥ 2) or var_total is
      // NULL too — no per-item NULL handling needed here
      .agg(count(lit(1)).cast("int").as("k_items"),
        (round(sum(col("_var")), 6) + lit(0.0d)).as("sum_item_var"))
    val totals = complete.groupBy(col("_u"))
      .agg(sum(col("_v")).as("_t"))
      .agg(count(lit(1)).as("_ct"),
        sum(col("_t").cast(d38)).cast(d38).as("_st"),
        sum((col("_t").cast(d38) * col("_t")).cast(d38)).cast(d38).as("_qt"))
      .withColumn("var_total",
        when(col("_ct") < 2L, lit(null).cast("double")).otherwise(
          round(expr("CAST(_qt * _ct - _st * _st AS DOUBLE)") /
            (col("_ct").cast("double") * (col("_ct") - 1L) * lit(1.0e12d)), 6)
            + lit(0.0d)))
    itemVar.crossJoin(broadcast(totals))
      .where(col("_ct") > 0L) // empty input → empty output
      .select(col("_ct").as("n_subjects"), col("k_items"),
        col("sum_item_var"), col("var_total"),
        when(col("k_items") < 2 || col("var_total").isNull ||
            col("var_total") <= 0.0d || col("sum_item_var").isNull,
          lit(null).cast("double")).otherwise(
          round((col("k_items").cast("double") /
            (col("k_items") - 1).cast("double")) *
            (lit(1.0d) - col("sum_item_var") / col("var_total")), 6)
            + lit(0.0d)).as("cronbach_alpha"))
  }

  /** BENJAMINI–HOCHBERG step-up FDR control — the standard guard when a
    * pipeline fires MANY hypothesis tests at once (per-segment A/B
    * reads, per-feature drift screens, per-source quality deltas):
    * naive per-test α=0.05 at m tests expects m/20 false alarms;
    * BH bounds the FALSE DISCOVERY RATE at α instead (Benjamini &
    * Hochberg 1995, JRSS-B). Step-up rule: sort p ascending, find the
    * LARGEST rank k with p_(k) ≤ k·α/m, reject ranks 1..k (everything
    * below the largest passing rank is rejected even if its own
    * comparison fails — that is what "step-up" means and what a naive
    * per-row filter gets wrong). Also reports the BH q-value
    * q_(i) = min_{j≥i} p_(j)·m/j — the smallest FDR at which test i
    * would still be rejected — as the suffix-min over the ranked table.
    *
    * INTEGER-EXACT: p-values arrive in micro units (the engine's own
    * test ops emit integer statistics; callers mapping a double p
    * pin the rounding), every BH comparison is the cross-multiplied
    * `p_micro·m ≤ rank·alphaMicro` (no division), and q_micro is the
    * floored `p_micro·m div rank` suffix-min capped at 1e6. Products
    * stay in BIGINT for m up to ~9·10¹² tests.
    *
    * `dependence = true` applies the BENJAMINI–YEKUTIELI correction
    * (Benjamini & Yekutieli 2001) — FDR control under ARBITRARY test
    * dependence (overlapping segments, correlated metrics) at the cost
    * of dividing α by the harmonic number c(m) = Σ1/i. c(m) is pinned
    * as the PPM-CEILING sum Σ⌈10⁶/i⌉ over the ranked table — an exact
    * integer ≥ 10⁶·c(m), so the correction errs CONSERVATIVE (≤ m ppm
    * over) and the comparison stays a cross-multiplication (in
    * DECIMAL: the triple product passes BIGINT near 10⁶ tests).
    *
    * Scale shape: this op runs on the HYPOTHESIS table — one row per
    * test, emitted by corpus-sized upstream aggregates ([[mannWhitney]],
    * [[graft.ops.EventsOps.abTest]], [[graft.ops.Governance.mcnemar]]) —
    * so the windows ride a #tests-bounded table and the corpus never
    * enters. A null or out-of-range p raises in-plan (silently dropping
    * a test changes m and every threshold). Empty input → empty output.
    *
    * Returns (test_id, p_micro, rank, m_tests, q_micro, reject)
    * ordered by (rank). */
  def bhFdr(
      df: DataFrame,
      testCol: String = "test_id",
      pMicroCol: String = "p_micro",
      alphaMicro: Long = 50000L,
      dependence: Boolean = false): DataFrame = {
    require(alphaMicro > 0L && alphaMicro <= 1000000L,
      s"bhFdr: alphaMicro must be in (0, 1e6], got $alphaMicro")
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(
      col(testCol).cast("string").as("test_id"),
      when(col(pMicroCol).isNull ||
          col(pMicroCol) < 0L || col(pMicroCol) > 1000000L,
        raise_error(concat(lit("bhFdr: p_micro out of [0, 1e6] for test "),
          col(testCol).cast("string"))))
        .otherwise(col(pMicroCol).cast("long")).as("p_micro"))
    val wAll = Window.partitionBy()
    // |tests|-bounded ladders: one row per test id (the m of the
    // multiple-testing correction), never per corpus row
    val wRank = Window.orderBy(col("p_micro"), col("test_id"))
    // suffix min over ranks >= current: running min in DESCENDING rank order
    val wSuffix = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = rows
      .withColumn("m_tests", count(lit(1)).over(wAll))
      .withColumn("rank", row_number().over(wRank))
    val ranked =
      if (!dependence)
        base
          .withColumn("_qraw",
            least(expr("p_micro * m_tests div rank"), lit(1000000L)))
          .withColumn("_lhs", expr("CAST(p_micro * m_tests AS DECIMAL(38,0))"))
          .withColumn("_rhs", expr(s"CAST(rank * $alphaMicro AS DECIMAL(38,0))"))
      else
        base
          // ppm-ceiling harmonic number over the ranked table: exact,
          // >= 1e6·c(m), conservative by <= m ppm
          .withColumn("_cppm",
            sum(expr("(1000000 + rank - 1) div rank")).over(wAll))
          .withColumn("_qraw",
            least(expr("CAST(CAST(p_micro AS DECIMAL(38,0)) * m_tests * " +
              "_cppm div (CAST(rank AS DECIMAL(38,0)) * 1000000) AS BIGINT)"),
              lit(1000000L)))
          .withColumn("_lhs",
            expr("CAST(CAST(p_micro AS DECIMAL(38,0)) * m_tests * _cppm " +
              "AS DECIMAL(38,0))"))
          .withColumn("_rhs",
            expr(s"CAST(CAST(rank AS DECIMAL(38,0)) * $alphaMicro * 1000000 " +
              "AS DECIMAL(38,0))"))
    ranked
      .withColumn("q_micro", min(col("_qraw")).over(wSuffix))
      .withColumn("_k",
        max(when(col("_lhs") <= col("_rhs"), col("rank"))).over(wAll))
      .select(col("test_id"), col("p_micro"), col("rank"), col("m_tests"),
        col("q_micro"),
        (col("_k").isNotNull && col("rank") <= col("_k")).as("reject"))
      .orderBy("rank")
  }

  /** POISSON BOOTSTRAP confidence interval for a mean — THE bootstrap
    * that exists at 100 TB (Chamandy, Muralidharan, Najmi & Naidu 2012,
    * "Estimating Uncertainty for Massive Data Streams", Google):
    * classical resampling needs n draws WITH replacement per replicate —
    * a global shuffle per replicate — but for large n the per-row
    * resample count converges to independent Poisson(1), so every row
    * can draw its B replicate weights locally and the whole procedure
    * is ONE map + ONE B-bounded aggregate. Percentile CI off the ranked
    * replicate means.
    *
    * DETERMINISTIC AND ENGINE-PORTABLE, no RNG: row r's weight in
    * replicate b inverts the pinned cumulative-Poisson(1) table
    * (floor-micro literals 367879, 735758, 919698, 981011, 996340,
    * 999405, 999916, 999989, 999998; the ≥ 999998 tail collapses to 9)
    * at a uniform u derived from ONE portable md5 per ROW — not per
    * (row, replicate): at B = 200 the per-cell hash was 200 full md5
    * passes over the corpus and the suite's third-highest idle cost.
    * The row's 32-bit digest prefix seeds a per-replicate Lehmer
    * scramble, u_b = minstd(minstd((seed + b·1000003) mod p)) mod 1e6
    * with p = 2³¹−1 and the MINSTD multiplier 48271 (Park–Miller
    * 1988; Lemire 2017 reviews the constants) — pure BIGINT products
    * < 2⁴⁷, identical on every engine and every rerun
    * ([[graft.ops.Governance.partitionBalance]]'s hash for the seed,
    * integer arithmetic after). Values enter as floor-micro integers;
    * replicate means are re-signed integral divisions; Σw·v rides
    * DECIMAL(38,0) (9·|v|·n headroom).
    * CI ranks are exact ceil picks: lo = ⌈B_eff·(1−conf)/2⌉,
    * hi = ⌈B_eff·(1+conf)/2⌉ over the means ranked (mean, replicate) —
    * the [[graft.ops.EventsOps.slaPercentiles]] convention.
    *
    * A replicate whose weights all landed 0 (P ≈ e⁻ⁿ — only reachable
    * on toy fixtures) is dropped and `n_replicates` reports the
    * survivors. Null values are excluded up front. Empty input → empty
    * output.
    *
    * Returns ONE row (n_rows, n_replicates, mean_micro, ci_lo_micro,
    * ci_hi_micro). */
  def poissonBootstrap(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      replicates: Int = 200,
      confMicro: Long = 950000L): DataFrame = {
    require(replicates >= 10 && replicates <= 10000,
      s"poissonBootstrap: replicates must be in [10, 10000], got $replicates")
    require(confMicro > 0L && confMicro < 1000000L,
      s"poissonBootstrap: confMicro must be in (0, 1e6), got $confMicro")
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val base = df.where(col(valueCol).isNotNull)
      .select(col(idCol).cast("string").as("_id"),
        floor(col(valueCol).cast("double") * lit(1000000.0d))
          .cast("long").as("_v"))
    // 1-row total: the point estimate never re-scans via the replicates
    val tot = base.agg(count(lit(1)).as("n_rows"),
      sum(col("_v").cast(d38)).cast(d38).as("_sv"))
    val rep = base
      .withColumn("_seed", expr(
        "CAST(conv(substring(md5(_id), 1, 8), 16, 10) AS BIGINT) % 2147483647"))
      .select(col("_v"), col("_seed"),
        explode(sequence(lit(0), lit(replicates - 1))).as("_b"))
      .withColumn("_u", expr(
        "((((_seed + _b * 1000003) % 2147483647) * 48271 % 2147483647) " +
          "* 48271 % 2147483647) % 1000000"))
      .withColumn("_w",
        when(col("_u") < 367879L, 0L).when(col("_u") < 735758L, 1L)
          .when(col("_u") < 919698L, 2L).when(col("_u") < 981011L, 3L)
          .when(col("_u") < 996340L, 4L).when(col("_u") < 999405L, 5L)
          .when(col("_u") < 999916L, 6L).when(col("_u") < 999989L, 7L)
          .when(col("_u") < 999998L, 8L).otherwise(9L))
    val means = rep.groupBy(col("_b"))
      .agg(sum(col("_w")).as("_sw"),
        sum((col("_w").cast(d38) * col("_v")).cast(d38)).cast(d38).as("_swv"))
      .where(col("_sw") > 0L)
      .select(col("_b"), expr("CAST(CASE WHEN _swv >= 0 THEN _swv div _sw " +
        "ELSE -((-_swv) div _sw) END AS BIGINT)").as("_m"))
    val ranked = means
      .withColumn("_rank", // B-bounded ladder (replicates ≤ 10⁴ by require)
        row_number().over(Window.orderBy(col("_m"), col("_b"))).cast("long"))
      .withColumn("_beff", count(lit(1)).over(Window.partitionBy()))
    val loRank = greatest(lit(1L),
      expr(s"(_beff * ${1000000L - confMicro} + 1999999) div 2000000"))
    val hiRank = least(col("_beff"),
      expr(s"(_beff * ${1000000L + confMicro} + 1999999) div 2000000"))
    ranked
      .groupBy(lit(1).as("_one"))
      .agg(max(col("_beff")).as("n_replicates"),
        min(when(col("_rank") === loRank, col("_m"))).as("ci_lo_micro"),
        min(when(col("_rank") === hiRank, col("_m"))).as("ci_hi_micro"))
      .crossJoin(broadcast(tot))
      .select(col("n_rows"), col("n_replicates"),
        expr("CAST(CASE WHEN _sv >= 0 THEN _sv div n_rows " +
          "ELSE -((-_sv) div n_rows) END AS BIGINT)").as("mean_micro"),
        col("ci_lo_micro"), col("ci_hi_micro"))
  }

  /** PAIRED PERMUTATION TEST for a mean difference — the exact-logic
    * nonparametric companion to [[poissonBootstrap]] (Fisher 1935; the
    * randomization test Good 2000 ch. 3 standardizes): under H₀ each
    * pair's difference is symmetric around 0, so every sign assignment
    * is equally likely; the p-value is the fraction of sign-flipped
    * replicates whose |ΣT| reaches the observed |ΣT|, with the
    * standard +1 guard p = (#{|T_b| ≥ |T_obs|} + 1)/(B+1) so p is
    * never an impossible 0.
    *
    * THE permutation test that exists at 100 TB: a classical
    * permutation shuffles labels globally — a shuffle per replicate —
    * but sign flips are per-ROW decisions, so all B replicates ride
    * ONE local map (the [[poissonBootstrap]] draw recipe: one portable
    * md5 per row seeds the Lehmer/MINSTD chain, replicate b's sign is
    * u_b ≥ 5·10⁵) and ONE B-bounded aggregate. No RNG, deterministic
    * on every engine and rerun.
    *
    * INTEGER-EXACT: each side quantizes to micro — EXACTLY (DECIMAL
    * ×10⁶) for integral columns, the [[ipwAte]] passthrough, so a
    * caller handing in already-micro sums never rides a double past
    * 2⁵³ — and the difference, T_obs and every T_b ride DECIMAL(38,0);
    * the comparison is |T_b| ≥ |T_obs| on exact decimals and p_micro
    * the floored integer (10⁶·(n_extreme+1)) div (B+1). Rows with
    * either side NULL are excluded up front. Empty input → empty
    * output.
    *
    * UNIT NOTE: `t_obs_micro` is Σ(a−b) scaled ×10⁶ relative to the
    * INPUT units. For double inputs that is micro-units of the raw
    * value; for integral inputs (the already-quantized passthrough,
    * e.g. micro sums) it is input-units ×10⁶ — divide by 10⁶ before
    * comparing against other micro quantities. The factor is common to
    * T_obs and every T_b, so n_extreme, p_micro and significant_05 are
    * unaffected by which path quantized the sides.
    *
    * Returns ONE row (n_pairs, n_replicates, t_obs_micro, n_extreme,
    * p_micro, significant_05). */
  def pairedPermutationTest(
      df: DataFrame,
      idCol: String,
      valueACol: String,
      valueBCol: String,
      replicates: Int = 200): DataFrame = {
    require(replicates >= 10 && replicates <= 10000,
      s"pairedPermutationTest: replicates must be in [10, 10000], got $replicates")
    val d38 = DecimalType(38, 0)
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    def sideMicro(c: String) = df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (col(c).cast(d38) * lit(1000000L)).cast(d38)
      case _ =>
        floor(col(c).cast("double") * lit(1000000.0d)).cast("long").cast(d38)
    }
    val base = df
      .where(col(valueACol).isNotNull && col(valueBCol).isNotNull)
      .select(col(idCol).cast("string").as("_id"),
        (sideMicro(valueACol) - sideMicro(valueBCol)).cast(d38).as("_dd"))
    val tot = base.agg(count(lit(1)).as("n_pairs"),
      sum(col("_dd").cast(d38)).cast(d38).as("_tobs"))
    val reps = base
      .withColumn("_seed", expr(
        "CAST(conv(substring(md5(_id), 1, 8), 16, 10) AS BIGINT) % 2147483647"))
      .select(col("_dd"), col("_seed"),
        explode(sequence(lit(0), lit(replicates - 1))).as("_b"))
      .withColumn("_u", expr(
        "((((_seed + _b * 1000003) % 2147483647) * 48271 % 2147483647) " +
          "* 48271 % 2147483647) % 1000000"))
      .withColumn("_sd",
        when(col("_u") >= 500000L, col("_dd")).otherwise(-col("_dd")))
      .groupBy(col("_b"))
      .agg(sum(col("_sd").cast(d38)).cast(d38).as("_tb"))
    reps
      .crossJoin(broadcast(tot))
      .groupBy(col("n_pairs"), col("_tobs"))
      .agg(count(lit(1)).as("n_replicates"),
        sum(when(abs(col("_tb")) >= abs(col("_tobs")), 1L).otherwise(0L))
          .as("n_extreme"))
      .select(col("n_pairs"),
        col("n_replicates"),
        col("_tobs").cast("long").as("t_obs_micro"),
        col("n_extreme"),
        expr("(1000000 * (n_extreme + 1)) div (n_replicates + 1)")
          .as("p_micro"))
      .withColumn("significant_05", col("p_micro") <= 50000L)
  }

  /** KAPLAN–MEIER survival estimator WITH right-censoring — the
    * estimator [[graft.ops.EventsOps.survivalTable]] deliberately is
    * not: that curve assumes every lifetime is fully observed, which a
    * live product never grants (users active at the observation cutoff
    * have not churned YET — counting them as dead biases every
    * retention number down). KM (Kaplan & Meier 1958) handles it by
    * product-limit: at each distinct duration t with d deaths among n
    * still at risk, survival multiplies by (n−d)/n; censored subjects
    * leave the risk set without contributing a death.
    *
    * Float policy (the [[graft.ops.CorpusOps.jsDivergence]] ln
    * contract): each death time contributes one round-6
    * `ln((n−d)/n)` with the INTEGER ratio inside the ln (operands cast
    * to double in fixed order); the running sum adds ROUNDED terms in
    * ascending-duration order; `km_survival` is round-6 of `exp` of the
    * round-6 running sum. Once a time kills its whole risk set the
    * curve is pinned to exactly 0.0 from there on (no ln(0) reaches the
    * arithmetic). Censor-only times contribute a zero term — the curve
    * is flat there but the row still reports the risk-set drop.
    *
    * Shape: ONE duration-keyed partial agg is the only corpus-sized
    * stage; the at-risk suffix counts and the running product ride the
    * |distinct durations|-bounded table (the value-cardinality-bounded
    * window contract — durations are floor-days, bounded by the
    * observation window). Empty input → empty output.
    *
    * Returns (duration, n_at_risk, n_events, n_censored, km_survival)
    * ordered by duration. `eventCol`: 1 = event observed (churned),
    * 0 = right-censored (still alive at cutoff); anything else raises
    * in-plan. */
  def kaplanMeier(
      df: DataFrame,
      durationCol: String = "duration",
      eventCol: String = "event"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(
      when(col(durationCol).isNull || col(durationCol) < 0 ||
          col(durationCol) =!= floor(col(durationCol)),
        raise_error(lit("kaplanMeier: duration must be a non-negative " +
          "integer"))).otherwise(col(durationCol).cast("long")).as("_d"),
      when(col(eventCol).isNull || !col(eventCol).cast("int").isin(0, 1),
        raise_error(lit("kaplanMeier: event must be 0 (censored) or 1 " +
          "(observed)"))).otherwise(col(eventCol).cast("int")).as("_e"))
    val perT = rows.groupBy(col("_d"))
      .agg(sum(when(col("_e") === 1, 1L).otherwise(0L)).as("n_events"),
        sum(when(col("_e") === 0, 1L).otherwise(0L)).as("n_censored"),
        count(lit(1)).as("_nt"))
    val wAll = Window.partitionBy()
    // unpartitioned ladders bounded by |distinct floor-day durations|
    // inside the observation window (the winsorize doc-contract bound)
    val wPrev = Window.orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT
      .withColumn("n_at_risk", sum(col("_nt")).over(wAll) -
        coalesce(sum(col("_nt")).over(wPrev), lit(0L)))
      .withColumn("_term",
        when(col("n_events") === 0L || col("n_events") === col("n_at_risk"),
          lit(0.0d))
          .otherwise(round(log((col("n_at_risk") - col("n_events"))
            .cast("double") / col("n_at_risk")), 6) + lit(0.0d)))
      .withColumn("_dead",
        max(when(col("n_events") === col("n_at_risk"), 1).otherwise(0))
          .over(wRun))
      .withColumn("km_survival",
        when(col("_dead") === 1, lit(0.0d)).otherwise(
          round(exp(round(sum(col("_term")).over(wRun), 6) + lit(0.0d)), 6)
            + lit(0.0d)))
      .select(col("_d").as("duration"), col("n_at_risk"), col("n_events"),
        col("n_censored"), col("km_survival"))
      .orderBy("duration")
  }

  /** GROUPED KAPLAN–MEIER — one [[kaplanMeier]] curve per slice of
    * `groupCol` in a single pass: the table behind every "retention by
    * cohort / churn by plan" comparison plot, and the curves the
    * [[logRank]] χ² summarizes into one number. Identical arithmetic
    * to the ungrouped op (round-6 ln terms, running product as exp of
    * the rounded running sum, full-kill pins exact 0.0) with every
    * window additionally partitioned by group — so the working set per
    * window partition is that group's |distinct durations|, and groups
    * parallelize instead of queueing.
    *
    * Shape: ONE (group, duration) partial agg is the only corpus-sized
    * stage. NULL groups are dropped (a curve for "unknown cohort" is a
    * modeling decision, not a default). Empty input → empty output.
    *
    * Returns (group, duration, n_at_risk, n_events, n_censored,
    * km_survival) ordered by (group, duration). */
  def kaplanMeierByGroup(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.where(col(groupCol).isNotNull).select(
      col(groupCol).cast("string").as("group"),
      when(col(durationCol).isNull || col(durationCol) < 0 ||
          col(durationCol) =!= floor(col(durationCol)),
        raise_error(lit("kaplanMeierByGroup: duration must be a " +
          "non-negative integer")))
        .otherwise(col(durationCol).cast("long")).as("_d"),
      when(col(eventCol).isNull || !col(eventCol).cast("int").isin(0, 1),
        raise_error(lit("kaplanMeierByGroup: event must be 0 (censored) " +
          "or 1 (observed)"))).otherwise(col(eventCol).cast("int")).as("_e"))
    val perT = rows.groupBy(col("group"), col("_d"))
      .agg(sum(when(col("_e") === 1, 1L).otherwise(0L)).as("n_events"),
        sum(when(col("_e") === 0, 1L).otherwise(0L)).as("n_censored"),
        count(lit(1)).as("_nt"))
    val wG = Window.partitionBy(col("group"))
    val wPrev = Window.partitionBy(col("group")).orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("group")).orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT
      .withColumn("n_at_risk", sum(col("_nt")).over(wG) -
        coalesce(sum(col("_nt")).over(wPrev), lit(0L)))
      .withColumn("_term",
        when(col("n_events") === 0L || col("n_events") === col("n_at_risk"),
          lit(0.0d))
          .otherwise(round(log((col("n_at_risk") - col("n_events"))
            .cast("double") / col("n_at_risk")), 6) + lit(0.0d)))
      .withColumn("_dead",
        max(when(col("n_events") === col("n_at_risk"), 1).otherwise(0))
          .over(wRun))
      .withColumn("km_survival",
        when(col("_dead") === 1, lit(0.0d)).otherwise(
          round(exp(round(sum(col("_term")).over(wRun), 6) + lit(0.0d)), 6)
            + lit(0.0d)))
      .select(col("group"), col("_d").as("duration"), col("n_at_risk"),
        col("n_events"), col("n_censored"), col("km_survival"))
      .orderBy("group", "duration")
  }

  /** NELSON–AALEN cumulative hazard — the nonparametric hazard-scale
    * companion to [[kaplanMeier]]'s survival curve (Nelson 1972; Aalen
    * 1978): H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ over event times, plus the
    * Fleming–Harrington survival transform S̃(t) = e^{−H(t)} — the
    * estimator of choice when hazard RATES are the readout (is churn
    * risk accelerating?) and the better-behaved small-risk-set
    * alternative to KM: a time that kills its whole risk set
    * contributes hazard exactly 1.0, never a −∞ log.
    *
    * Float policy (the [[kaplanMeier]] contract): each duration
    * contributes one round-6 dᵢ/nᵢ with the INTEGER ratio inside
    * (operands cast to double in pinned order); `na_cum_hazard` adds
    * ROUNDED terms in ascending-duration order and is round-6 again;
    * `na_survival` is round-6 of exp(−cum).
    *
    * Shape: identical to [[kaplanMeier]] — ONE duration-keyed partial
    * agg is the only corpus-sized stage; risk sets and the running sum
    * ride the |distinct durations|-bounded table. Empty input → empty
    * output.
    *
    * Returns (duration, n_at_risk, n_events, n_censored,
    * na_cum_hazard, na_survival) ordered by duration. */
  def nelsonAalen(
      df: DataFrame,
      durationCol: String = "duration",
      eventCol: String = "event"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(
      when(col(durationCol).isNull || col(durationCol) < 0 ||
          col(durationCol) =!= floor(col(durationCol)),
        raise_error(lit("nelsonAalen: duration must be a non-negative " +
          "integer"))).otherwise(col(durationCol).cast("long")).as("_d"),
      when(col(eventCol).isNull || !col(eventCol).cast("int").isin(0, 1),
        raise_error(lit("nelsonAalen: event must be 0 (censored) or 1 " +
          "(observed)"))).otherwise(col(eventCol).cast("int")).as("_e"))
    val perT = rows.groupBy(col("_d"))
      .agg(sum(when(col("_e") === 1, 1L).otherwise(0L)).as("n_events"),
        sum(when(col("_e") === 0, 1L).otherwise(0L)).as("n_censored"),
        count(lit(1)).as("_nt"))
    val wAll = Window.partitionBy()
    // unpartitioned ladders bounded by |distinct floor-day durations|
    // inside the observation window (the winsorize doc-contract bound)
    val wPrev = Window.orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT
      .withColumn("n_at_risk", sum(col("_nt")).over(wAll) -
        coalesce(sum(col("_nt")).over(wPrev), lit(0L)))
      .withColumn("_term",
        when(col("n_events") === 0L, lit(0.0d))
          .otherwise(round(col("n_events").cast("double") /
            col("n_at_risk"), 6) + lit(0.0d)))
      .withColumn("na_cum_hazard",
        round(sum(col("_term")).over(wRun), 6) + lit(0.0d))
      .withColumn("na_survival",
        round(exp(-col("na_cum_hazard")), 6) + lit(0.0d))
      .select(col("_d").as("duration"), col("n_at_risk"), col("n_events"),
        col("n_censored"), col("na_cum_hazard"), col("na_survival"))
      .orderBy("duration")
  }

  /** KAPLAN–MEIER with the GREENWOOD variance band — [[kaplanMeier]]'s
    * curve plus the standard error and normal-approximation confidence
    * interval every survival PLOT draws (Greenwood 1926):
    * Var(Ŝ(t)) = Ŝ(t)² · Σ_{tᵢ≤t} dᵢ/(nᵢ(nᵢ−dᵢ)), CI = Ŝ ± z·se
    * clamped to [0, 1]. A curve without its band invites reading noise
    * as signal exactly where censoring has thinned the risk set.
    *
    * Float policy: each Greenwood term is round-6 of the integer ratio
    * dᵢ/(nᵢ·(nᵢ−dᵢ)) with the product formed in DOUBLE (nᵢ² would
    * overflow BIGINT near 10¹⁰ subjects; the double product of two
    * exact integers is identical on every engine); the running sum
    * adds ROUNDED terms ascending; se = round-6(Ŝ·√cum); the margin is
    * round-6(z·se) off the pinned z literal (zMicro/10⁶, default
    * 1.959964), and the clamped bounds are round-6 of Ŝ ∓ margin. A
    * full-kill time pins survival, se and both bounds to exactly 0.0
    * from there on.
    *
    * Shape: [[kaplanMeier]]'s — one duration-keyed partial agg, ladder
    * on the bounded table. Empty input → empty output.
    *
    * Returns (duration, n_at_risk, n_events, n_censored, km_survival,
    * km_se, km_lo, km_hi) ordered by duration. */
  def kaplanMeierCi(
      df: DataFrame,
      durationCol: String = "duration",
      eventCol: String = "event",
      zMicro: Long = 1959964L): DataFrame = {
    require(zMicro > 0L && zMicro <= 10000000L,
      s"kaplanMeierCi: zMicro must be in (0, 1e7], got $zMicro")
    import org.apache.spark.sql.expressions.Window
    val z = zMicro / 1e6
    val rows = df.select(
      when(col(durationCol).isNull || col(durationCol) < 0 ||
          col(durationCol) =!= floor(col(durationCol)),
        raise_error(lit("kaplanMeierCi: duration must be a non-negative " +
          "integer"))).otherwise(col(durationCol).cast("long")).as("_d"),
      when(col(eventCol).isNull || !col(eventCol).cast("int").isin(0, 1),
        raise_error(lit("kaplanMeierCi: event must be 0 (censored) or 1 " +
          "(observed)"))).otherwise(col(eventCol).cast("int")).as("_e"))
    val perT = rows.groupBy(col("_d"))
      .agg(sum(when(col("_e") === 1, 1L).otherwise(0L)).as("n_events"),
        sum(when(col("_e") === 0, 1L).otherwise(0L)).as("n_censored"),
        count(lit(1)).as("_nt"))
    val wAll = Window.partitionBy()
    // unpartitioned ladders bounded by |distinct floor-day durations|
    // inside the observation window (the winsorize doc-contract bound)
    val wPrev = Window.orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val laddered = perT
      .withColumn("n_at_risk", sum(col("_nt")).over(wAll) -
        coalesce(sum(col("_nt")).over(wPrev), lit(0L)))
      .withColumn("_term",
        when(col("n_events") === 0L || col("n_events") === col("n_at_risk"),
          lit(0.0d))
          .otherwise(round(log((col("n_at_risk") - col("n_events"))
            .cast("double") / col("n_at_risk")), 6) + lit(0.0d)))
      .withColumn("_gterm",
        when(col("n_events") === 0L || col("n_events") === col("n_at_risk"),
          lit(0.0d))
          .otherwise(round(col("n_events").cast("double") /
            (col("n_at_risk").cast("double") *
              (col("n_at_risk") - col("n_events")).cast("double")), 6)
            + lit(0.0d)))
      .withColumn("_dead",
        max(when(col("n_events") === col("n_at_risk"), 1).otherwise(0))
          .over(wRun))
      .withColumn("km_survival",
        when(col("_dead") === 1, lit(0.0d)).otherwise(
          round(exp(round(sum(col("_term")).over(wRun), 6) + lit(0.0d)), 6)
            + lit(0.0d)))
      .withColumn("_gcum",
        round(sum(col("_gterm")).over(wRun), 6) + lit(0.0d))
      .withColumn("km_se",
        when(col("_dead") === 1, lit(0.0d)).otherwise(
          round(col("km_survival") * sqrt(col("_gcum")), 6) + lit(0.0d)))
      .withColumn("_m", round(lit(z) * col("km_se"), 6) + lit(0.0d))
    laddered
      .select(col("_d").as("duration"), col("n_at_risk"), col("n_events"),
        col("n_censored"), col("km_survival"), col("km_se"),
        (round(greatest(lit(0.0d), col("km_survival") - col("_m")), 6)
          + lit(0.0d)).as("km_lo"),
        (round(least(lit(1.0d), col("km_survival") + col("_m")), 6)
          + lit(0.0d)).as("km_hi"))
      .orderBy("duration")
  }

  /** COMPETING-RISKS cumulative incidence (Aalen–Johansen 1978; the
    * estimator Gooley et al. 1999 insist on): when subjects can exit
    * by MORE than one cause (churn-to-competitor vs churn-to-inactive;
    * conversion vs deletion), "1 − KM per cause" over-counts — a
    * subject taken by cause A was never available to cause B. The CIF
    * fixes it: CIF_k(t) = Σ_{tᵢ≤t} Ŝ(tᵢ₋₁)·d_{k,i}/nᵢ with Ŝ the
    * ALL-CAUSE KM survival, so Σ_k CIF_k + S = 1 up to rounding.
    *
    * `eventCol`: 0 = censored, 1..K = cause of the observed event
    * (anything else raises in-plan; K ≤ `maxCauses` raises in-plan on
    * breach — the dense duration×cause grid is the working set).
    *
    * Float policy: the all-cause Ŝ is [[kaplanMeier]]'s round-6 ln/exp
    * ladder verbatim (full-kill pins 0.0); each CIF term is round-6 of
    * (lagged round-6 Ŝ)·d_k/n in pinned operand order; each cause's
    * running sum adds ROUNDED terms ascending and is round-6 again.
    *
    * Shape: ONE duration-keyed and ONE (duration, cause)-keyed partial
    * agg are the corpus-sized stages; the ladder and the dense grid
    * (durations × causes, both bounded) ride broadcast joins. Empty
    * input → empty output.
    *
    * Returns one row per (cause, duration) — dense: censor-only times
    * appear with n_events 0 and a flat CIF — as (duration, cause,
    * n_at_risk, n_events, cif) ordered by (cause, duration). */
  def competingRisks(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      maxCauses: Int = 16): DataFrame = {
    require(maxCauses >= 1 && maxCauses <= 64,
      s"competingRisks: maxCauses must be in [1, 64], got $maxCauses")
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(
      when(col(durationCol).isNull || col(durationCol) < 0 ||
          col(durationCol) =!= floor(col(durationCol)),
        raise_error(lit("competingRisks: duration must be a non-negative " +
          "integer"))).otherwise(col(durationCol).cast("long")).as("_d"),
      when(col(eventCol).isNull || col(eventCol).cast("int") < 0,
        raise_error(lit("competingRisks: event must be 0 (censored) or a " +
          "positive cause id"))).otherwise(col(eventCol).cast("int")).as("_e"))
    val perT = rows.groupBy(col("_d"))
      .agg(sum(when(col("_e") > 0, 1L).otherwise(0L)).as("_dt"),
        count(lit(1)).as("_nt"))
    val wAll = Window.partitionBy()
    // unpartitioned ladders bounded by |distinct floor-day durations|
    // inside the observation window (the winsorize doc-contract bound)
    val wPrev = Window.orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val km = perT
      .withColumn("n_at_risk", sum(col("_nt")).over(wAll) -
        coalesce(sum(col("_nt")).over(wPrev), lit(0L)))
      .withColumn("_term",
        when(col("_dt") === 0L || col("_dt") === col("n_at_risk"), lit(0.0d))
          .otherwise(round(log((col("n_at_risk") - col("_dt"))
            .cast("double") / col("n_at_risk")), 6) + lit(0.0d)))
      .withColumn("_dead",
        max(when(col("_dt") === col("n_at_risk"), 1).otherwise(0)).over(wRun))
      .withColumn("_sv",
        when(col("_dead") === 1, lit(0.0d)).otherwise(
          round(exp(round(sum(col("_term")).over(wRun), 6) + lit(0.0d)), 6)
            + lit(0.0d)))
      .withColumn("_sprev",
        coalesce(lag(col("_sv"), 1).over(Window.orderBy(col("_d"))),
          lit(1.0d)))
      .select(col("_d"), col("n_at_risk"), col("_sprev"))
    val causes = rows.where(col("_e") > 0).select(col("_e").as("cause"))
      .distinct()
    val nCauses = broadcast(causes.agg(count(lit(1)).as("_nc")))
    val dk = rows.where(col("_e") > 0)
      .groupBy(col("_d"), col("_e").as("cause"))
      .agg(count(lit(1)).as("_dc"))
    val grid = km
      .crossJoin(broadcast(causes))
      .join(dk, Seq("_d", "cause"), "left")
      .withColumn("_dc", coalesce(col("_dc"), lit(0L)))
      .crossJoin(nCauses)
      .withColumn("cause",
        when(col("_nc") > maxCauses, raise_error(concat(
          lit(s"competingRisks: more than $maxCauses causes: "),
          col("_nc").cast("string")))).otherwise(col("cause")))
    val wCause = Window.partitionBy(col("cause")).orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("_t2",
        when(col("_dc") === 0L, lit(0.0d))
          .otherwise(round(col("_sprev") * col("_dc").cast("double") /
            col("n_at_risk"), 6) + lit(0.0d)))
      .withColumn("cif", round(sum(col("_t2")).over(wCause), 6) + lit(0.0d))
      .select(col("_d").as("duration"), col("cause"), col("n_at_risk"),
        col("_dc").as("n_events"), col("cif"))
      .orderBy("cause", "duration")
  }

  /** RESTRICTED MEAN SURVIVAL TIME — the area under the [[kaplanMeier]]
    * curve up to a horizon τ (Royston & Parmar 2013): "expected days
    * survived in the first τ days", the single-number survival summary
    * that stays defined under heavy censoring where the median does
    * not, and the standard effect scale when proportional hazards is
    * not worth defending. RMST(τ) = Σ S(t_{i-1})·(min(t_i,τ) −
    * min(t_{i-1},τ)) over the KM step intervals plus the
    * S(t_last)·(τ − t_last) tail.
    *
    * Float policy: interval widths are exact integers; each term is
    * round-6 of (round-6 KM survival) × width in pinned order; the
    * total adds ROUNDED terms and is round-6 again. Pre-first-event
    * survival is exactly 1.0.
    *
    * Shape: [[kaplanMeier]]'s one corpus-sized partial agg, then a lag
    * and a scalar fold over the |distinct durations|-bounded curve.
    * Empty input → empty output.
    *
    * Returns ONE row (tau, n_subjects, rmst) — rmst in the duration
    * column's own units. */
  def rmst(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      tau: Long): DataFrame = {
    require(tau > 0L, s"rmst: tau must be positive, got $tau")
    import org.apache.spark.sql.expressions.Window
    val km = kaplanMeier(df, durationCol, eventCol)
    // duration-bounded ladder (KM output rows, not corpus rows)
    val wAsc = Window.orderBy(col("duration"))
    val cut = least(col("duration"), lit(tau))
    // coalesce INSIDE the least: least() skips NULL operands (Spark and
    // DuckDB alike), so least(lag(...), τ) on the first row would yield
    // τ, not NULL — the outer coalesce would never fire
    val prevCut = least(
      coalesce(lag(col("duration"), 1).over(wAsc), lit(0L)), lit(tau))
    val prevS = coalesce(lag(col("km_survival"), 1).over(wAsc), lit(1.0d))
    km
      .withColumn("_n0", col("n_at_risk"))
      .withColumn("_term",
        round(prevS * (cut - prevCut).cast("double"), 6) + lit(0.0d))
      .withColumn("_tail",
        when(col("duration") === max(col("duration")).over(
          Window.partitionBy()),
          round(col("km_survival") *
            (lit(tau) - cut).cast("double"), 6) + lit(0.0d))
          .otherwise(lit(0.0d)))
      .groupBy(lit(tau).as("tau"))
      .agg(max(col("_n0")).as("n_subjects"),
        (round(sum(col("_term") + col("_tail")), 6) + lit(0.0d)).as("rmst"))
  }

  /** RMST DIFFERENCE — the censoring-robust effect size on the
    * survival scale: ΔRMST(τ) = RMST_B(τ) − RMST_A(τ), "expected days
    * survived in the first τ, gained by being in cohort B" (Royston &
    * Parmar 2013; the estimand regulators ask for when proportional
    * hazards is doubtful — [[logRank]] answers IS there a difference,
    * this answers HOW MUCH in days). Same per-group product-limit and
    * trapezoid arithmetic as [[kaplanMeierByGroup]] + [[rmst]], with
    * every window group-partitioned; the difference subtracts two
    * round-6 values (grid-safe — near the .0 boundary of digit 7,
    * never the .5).
    *
    * Exactly two groups required — raises in-plan (the [[mannWhitney]]
    * contract). Shape: one (group, duration) partial agg, then lags
    * and folds over the two duration-bounded curves. Empty input →
    * empty output.
    *
    * Returns ONE row (tau, group_a, group_b, n_a, n_b, rmst_a, rmst_b,
    * rmst_diff) — group_a is the lexicographically smaller label,
    * rmst_diff = rmst_b − rmst_a. */
  def rmstDiff(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      groupCol: String,
      tau: Long): DataFrame = {
    require(tau > 0L, s"rmstDiff: tau must be positive, got $tau")
    import org.apache.spark.sql.expressions.Window
    val km = kaplanMeierByGroup(df, durationCol, eventCol, groupCol)
    val wAsc = Window.partitionBy(col("group")).orderBy(col("duration"))
    val wG = Window.partitionBy(col("group"))
    val cut = least(col("duration"), lit(tau))
    val prevCut = least(
      coalesce(lag(col("duration"), 1).over(wAsc), lit(0L)), lit(tau))
    val prevS = coalesce(lag(col("km_survival"), 1).over(wAsc), lit(1.0d))
    val perG = km
      .withColumn("_term",
        round(prevS * (cut - prevCut).cast("double"), 6) + lit(0.0d))
      .withColumn("_tail",
        when(col("duration") === max(col("duration")).over(wG),
          round(col("km_survival") * (lit(tau) - cut).cast("double"), 6)
            + lit(0.0d))
          .otherwise(lit(0.0d)))
      .groupBy(col("group"))
      .agg(max(col("n_at_risk")).as("_n"),
        (round(sum(col("_term") + col("_tail")), 6) + lit(0.0d)).as("_rmst"))
    val gAgg = perG.agg(min(col("group")).as("_gaN"),
      max(col("group")).as("_gbN"), count(lit(1)).as("_ng"))
    perG.crossJoin(broadcast(gAgg))
      .groupBy(lit(tau).as("tau"))
      .agg(
        max(col("_ng")).as("_ngx"),
        max(col("_gaN")).as("_ga"), max(col("_gbN")).as("_gb"),
        max(when(col("group") === col("_gaN"), col("_n"))).as("n_a"),
        max(when(col("group") =!= col("_gaN"), col("_n"))).as("n_b"),
        max(when(col("group") === col("_gaN"), col("_rmst"))).as("rmst_a"),
        max(when(col("group") =!= col("_gaN"), col("_rmst"))).as("rmst_b"))
      .select(
        when(col("_ngx") =!= 2, raise_error(concat(
          lit("rmstDiff: need exactly 2 groups with rows, got "),
          col("_ngx").cast("string")))).otherwise(col("tau")).as("tau"),
        col("_ga").as("group_a"), col("_gb").as("group_b"),
        col("n_a"), col("n_b"), col("rmst_a"), col("rmst_b"),
        (round(col("rmst_b") - col("rmst_a"), 6) + lit(0.0d))
          .as("rmst_diff"))
  }

  /** LOG-RANK TEST (Mantel 1966) — "are these two survival curves the
    * same?", the censoring-aware companion to [[kaplanMeier]] and the
    * standard A/B read on churn: at each death time the observed deaths
    * in group A are compared with the expectation under the null
    * (deaths distributed proportionally to the at-risk split), and the
    * standardized sum is χ²(1 df).
    *
    * Per death time t: E_A = n_A·d/n and hypergeometric variance
    * V = n_A·n_B·d·(n−d) / (n²·(n−1)), both as round-6 doubles off
    * integer operands in pinned order; O_A, ΣE_A, ΣV sum ROUNDED terms;
    * `chi2` is round-6 of (O_A−E_A)²/ΣV off the rounded sums, NULL when
    * ΣV = 0 (no death time mixes the groups — a χ² of 0/0 is "no
    * evidence", not "no difference"); `significant_05` compares the
    * rounded χ² with the pinned 1-df critical value 3.841459.
    *
    * Exactly two groups with rows required — raises in-plan otherwise
    * (the [[mannWhitney]] contract). Shape: one duration-keyed partial
    * agg (corpus-sized), then suffix counts and sums over the
    * |distinct durations|-bounded table. Empty input → empty output.
    *
    * Returns ONE row (group_a, group_b, n_a, n_b, events_a, events_b,
    * expected_a, chi2, significant_05) — group_a is the
    * lexicographically smaller label. */
  def logRank(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.where(col(groupCol).isNotNull).select(
      when(col(durationCol).isNull || col(durationCol) < 0 ||
          col(durationCol) =!= floor(col(durationCol)),
        raise_error(lit("logRank: duration must be a non-negative " +
          "integer"))).otherwise(col(durationCol).cast("long")).as("_d"),
      when(col(eventCol).isNull || !col(eventCol).cast("int").isin(0, 1),
        raise_error(lit("logRank: event must be 0 (censored) or 1 " +
          "(observed)"))).otherwise(col(eventCol).cast("int")).as("_e"),
      col(groupCol).cast("string").as("_g"))
    val gAgg = rows.agg(min(col("_g")).as("_gaN"), max(col("_g")).as("_gbN"),
      countDistinct(col("_g")).as("_ng"))
    val perT = rows.crossJoin(broadcast(gAgg)).groupBy(col("_d"))
      .agg(
        sum(when(col("_g") === col("_gaN"), 1L).otherwise(0L)).as("_r1"),
        sum(when(col("_g") =!= col("_gaN"), 1L).otherwise(0L)).as("_r2"),
        sum(when(col("_g") === col("_gaN") && col("_e") === 1, 1L)
          .otherwise(0L)).as("_d1"),
        sum(when(col("_g") =!= col("_gaN") && col("_e") === 1, 1L)
          .otherwise(0L)).as("_d2"),
        max(col("_ng")).as("_ng"), max(col("_gaN")).as("_ga"),
        max(col("_gbN")).as("_gb"))
    val wAll = Window.partitionBy()
    // unpartitioned ladders bounded by |distinct floor-day durations|
    // inside the observation window (the winsorize doc-contract bound)
    val wPrev = Window.orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cells = perT
      .withColumn("_n1", sum(col("_r1")).over(wAll) -
        coalesce(sum(col("_r1")).over(wPrev), lit(0L)))
      .withColumn("_n2", sum(col("_r2")).over(wAll) -
        coalesce(sum(col("_r2")).over(wPrev), lit(0L)))
      .withColumn("_n", col("_n1") + col("_n2"))
      .withColumn("_dt", col("_d1") + col("_d2"))
      .withColumn("_e1",
        when(col("_dt") === 0L, lit(0.0d)).otherwise(
          round(col("_n1").cast("double") * col("_dt") / col("_n"), 6)
            + lit(0.0d)))
      .withColumn("_v",
        when(col("_dt") === 0L || col("_n") <= 1L, lit(0.0d)).otherwise(
          round(col("_n1").cast("double") * col("_n2") * col("_dt") *
            (col("_n") - col("_dt")) /
            (col("_n").cast("double") * col("_n") * (col("_n") - 1L)), 6)
            + lit(0.0d)))
    val agg = cells.groupBy(col("_ga"), col("_gb"))
      .agg(max(col("_ng")).as("_ngx"),
        sum(col("_r1")).as("n_a"), sum(col("_r2")).as("n_b"),
        sum(col("_d1")).as("events_a"), sum(col("_d2")).as("events_b"),
        (round(sum(col("_e1")), 6) + lit(0.0d)).as("expected_a"),
        (round(sum(col("_v")), 6) + lit(0.0d)).as("_V"))
    val oMinusE = col("events_a").cast("double") - col("expected_a")
    agg.select(
      when(col("_ngx") =!= 2, raise_error(concat(
        lit("logRank: need exactly 2 groups with rows, got "),
        col("_ngx").cast("string")))).otherwise(col("_ga")).as("group_a"),
      col("_gb").as("group_b"), col("n_a"), col("n_b"),
      col("events_a"), col("events_b"), col("expected_a"),
      when(col("_V") === 0.0d, lit(null).cast("double")).otherwise(
        round(oMinusE * oMinusE / col("_V"), 6) + lit(0.0d)).as("chi2"),
      coalesce(
        when(col("_V") === 0.0d, lit(null).cast("double")).otherwise(
          round(oMinusE * oMinusE / col("_V"), 6) + lit(0.0d))
          > lit(3.841459d),
        lit(false)).as("significant_05"))
  }

  /** QUANTILE TREATMENT EFFECTS — the distributional companion to
    * [[ipwAte]]'s single mean: QTE(p) = q_T(p) − q_C(p) per requested
    * percentile (Doksum 1974; the standard first look at WHERE in the
    * distribution an effect lives — a mean shift from whales looks
    * nothing like a median shift, and the mean alone cannot tell them
    * apart).
    *
    * INTEGER-EXACT: values floor to micro; each group quantile is the
    * exact order statistic at rank ⌈p·n/100⌉ (the
    * [[graft.ops.EventsOps.slaPercentiles]] ceil-rank convention) and
    * the QTE is their exact difference. No interpolation — two engines
    * can disagree on an interpolated quantile, never on an order
    * statistic.
    *
    * Shape: ONE (group, value) partial agg collapses the corpus to the
    * distinct-value-bounded count table (the [[mannWhitney]] recipe —
    * never a per-row rank); cumulative ranks over that table use the
    * BLOCKED two-pass form ([[graft.ops.CorpusOps.curriculumOrder]]'s
    * recipe): value-range blocks (`_v div blockMicro` — monotone, so
    * blocks partition each group's sort order) run their prefix sums in
    * parallel, and only the (group × block)-bounded summary table sees
    * a per-group ordered window — WITHOUT the blocks, a truly
    * continuous measure puts each arm's ~n/2 distinct values through
    * ONE window task, and the 2-group contract makes that the plan's
    * parallelism ceiling. The |pcts|-fold explode multiplies only the
    * bounded table. Exactly two groups required — raises in-plan.
    * Empty input → empty output.
    *
    * Returns one row per requested percentile (pct, n_a, n_b,
    * q_a_micro, q_b_micro, qte_micro) ordered by pct — group_a is the
    * lexicographically smaller label and qte = q_b − q_a (treatment
    * minus control when control sorts first). */
  def quantileTreatmentEffect(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pcts: Seq[Int] = Seq(25, 50, 75, 90),
      blockMicro: Long = 1048576L): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"quantileTreatmentEffect: pcts must be in [1, 100], got $pcts")
    require(blockMicro >= 1L,
      s"quantileTreatmentEffect: blockMicro must be >= 1, got $blockMicro")
    import org.apache.spark.sql.expressions.Window
    val rows = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("_g"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long")
          .as("_v"))
    val perVG = rows.groupBy(col("_g"), col("_v")).agg(count(lit(1)).as("_c"))
    val gAgg = perVG.agg(min(col("_g")).as("_gaN"), max(col("_g")).as("_gbN"),
      countDistinct(col("_g")).as("_ng"))
    // blocked two-pass cumulative count: `div` truncates toward zero,
    // which still yields contiguous blocks ordered by _v (block 0 just
    // spans (−blockMicro, blockMicro)) — within-block prefix sums run
    // (groups × blocks)-parallel, the per-(group, block) carry rides
    // the value-range-bounded summary window
    val pv = perVG.withColumn("_blk", expr(s"_v div ${blockMicro}L"))
    val wIn = Window.partitionBy(col("_g"), col("_blk")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCarry = Window.partitionBy(col("_g")).orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGn = Window.partitionBy(col("_g"))
    val carry = pv.groupBy(col("_g"), col("_blk"))
      .agg(sum(col("_c")).as("_bc"))
      .withColumn("_base", coalesce(sum(col("_bc")).over(wCarry), lit(0L)))
      .withColumn("_n", sum(col("_bc")).over(wGn))
      .select(col("_g"), col("_blk"), col("_base"), col("_n"))
    val cum = pv
      .withColumn("_wcum", sum(col("_c")).over(wIn))
      .join(carry, Seq("_g", "_blk"))
      .withColumn("_cum", col("_base") + col("_wcum"))
      .crossJoin(broadcast(gAgg))
    val picks = cum
      .select(col("_g"), col("_v"), col("_cum"), col("_n"),
        col("_gaN"), col("_gbN"), col("_ng"),
        explode(array(pcts.distinct.sorted.map(p => lit(p)): _*)).as("pct"))
      .withColumn("_rank", expr("(pct * _n + 99) div 100"))
    picks
      .groupBy(col("pct"))
      .agg(
        max(col("_ng")).as("_ngx"),
        max(when(col("_g") === col("_gaN"), col("_n"))).as("n_a"),
        max(when(col("_g") =!= col("_gaN"), col("_n"))).as("n_b"),
        min(when(col("_g") === col("_gaN") && col("_cum") >= col("_rank"),
          col("_v"))).as("q_a_micro"),
        min(when(col("_g") =!= col("_gaN") && col("_cum") >= col("_rank"),
          col("_v"))).as("q_b_micro"))
      .select(
        when(col("_ngx") =!= 2, raise_error(concat(
          lit("quantileTreatmentEffect: need exactly 2 groups with " +
            "non-null values, got "), col("_ngx").cast("string"))))
          .otherwise(col("pct")).as("pct"),
        col("n_a"), col("n_b"), col("q_a_micro"), col("q_b_micro"),
        (col("q_b_micro") - col("q_a_micro")).as("qte_micro"))
      .orderBy("pct")
  }

  /** mSPRT — mixture sequential probability ratio test (Johari,
    * Koomen, Pekelis & Walsh 2017, "Peeking at A/B Tests"): the
    * ALWAYS-VALID p-value that an experimenter may read every day and
    * stop on, without the peeking inflation a fixed-horizon t-test
    * suffers. Against a N(0, τ²) mixture alternative the likelihood
    * ratio at day n is ln Λ = ½·ln(V/(V+τ²)) + θ̂²τ²/(2V(V+τ²)) with
    * θ̂ the mean difference and V the summed per-arm variance-of-mean;
    * p_n = min over days so far of min(1, e^{−ln Λ}) is valid at every
    * stopping time.
    *
    * Float policy: daily per-arm counts, micro sums and micro² sums of
    * squares are EXACT (DECIMAL(38,0)); every scalar is ONE division
    * of exact integer moments in pinned operand order — θ̂ =
    * (s_a·c_b − s_b·c_a)/(c_a·c_b·10⁶), per-arm variance-of-mean
    * (ss·c − s²)/(c²·(c−1)·10¹²) — each round-6 in NATURAL units (the
    * micro²-scale intermediate a naive formula would round is ~10¹²,
    * where round-6 sits below the double ulp and absorbs nothing);
    * ln Λ sums two round-6 terms; the p term is round-6 of
    * min(1, exp(−ln Λ)) and `p_always` its running min. Days where
    * either arm has < 2 observations (or V ≤ 0) contribute the
    * conservative p term 1.0 — no evidence, never NULL-poisoned.
    *
    * Exactly two groups required — raises in-plan (the [[mannWhitney]]
    * contract). Shape: one (day, arm) partial agg is the only
    * corpus-sized stage; cumulative moments, Λ and the running min
    * ride the |days|-bounded pivot. Empty input → empty output.
    *
    * Returns one row per day (day, n_a, n_b, theta, v, ln_lambda,
    * p_always, reject) ordered by day — `reject` is
    * p_always ≤ alphaMicro/10⁶. */
  def msprt(
      ev: DataFrame,
      tsCol: String,
      groupCol: String,
      valueCol: String,
      tauMicro: Long = 500000L,
      alphaMicro: Long = 50000L): DataFrame = {
    require(tauMicro > 0L, s"msprt: tauMicro must be positive, got $tauMicro")
    require(alphaMicro > 0L && alphaMicro < 1000000L,
      s"msprt: alphaMicro must be in (0, 1e6), got $alphaMicro")
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val tau2 = tauMicro.toDouble * tauMicro / 1.0e12
    val alpha = alphaMicro.toDouble / 1.0e6
    val rows = ev
      .where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(
        expr(s"CAST(floor(unix_micros(CAST(`$tsCol` AS TIMESTAMP)) / " +
          "1000000.0d) AS BIGINT) div 86400").as("_day"),
        col(groupCol).cast("string").as("_g"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long")
          .as("_v"))
    val gAgg = rows.agg(min(col("_g")).as("_gaN"), max(col("_g")).as("_gbN"),
      countDistinct(col("_g")).as("_ng"))
    val daily = rows.crossJoin(broadcast(gAgg)).groupBy(col("_day"))
      .agg(
        sum(when(col("_g") === col("_gaN"), 1L).otherwise(0L)).as("_dca"),
        sum(when(col("_g") =!= col("_gaN"), 1L).otherwise(0L)).as("_dcb"),
        sum(when(col("_g") === col("_gaN"), col("_v")).otherwise(0L)
          .cast(d38)).cast(d38).as("_dsa"),
        sum(when(col("_g") =!= col("_gaN"), col("_v")).otherwise(0L)
          .cast(d38)).cast(d38).as("_dsb"),
        sum(when(col("_g") === col("_gaN"),
          col("_v").cast(d38) * col("_v")).otherwise(lit(0).cast(d38))
          .cast(d38)).cast(d38).as("_dqa"),
        sum(when(col("_g") =!= col("_gaN"),
          col("_v").cast(d38) * col("_v")).otherwise(lit(0).cast(d38))
          .cast(d38)).cast(d38).as("_dqb"),
        max(col("_ng")).as("_ng"))
    // day-bounded ladder (observation window in days, not corpus rows)
    val wRun = Window.orderBy(col("_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("_ca", sum(col("_dca")).over(wRun))
      .withColumn("_cb", sum(col("_dcb")).over(wRun))
      .withColumn("_sa", sum(col("_dsa")).over(wRun).cast(d38))
      .withColumn("_sb", sum(col("_dsb")).over(wRun).cast(d38))
      .withColumn("_qa", sum(col("_dqa")).over(wRun).cast(d38))
      .withColumn("_qb", sum(col("_dqb")).over(wRun).cast(d38))
    // every scalar: ONE division of exact integer moments, round-6 in
    // natural units, fixed operand order
    val scal = cum
      .withColumn("_theta",
        when(col("_ca") === 0L || col("_cb") === 0L,
          lit(null).cast("double")).otherwise(
          round(expr("CAST(_sa * _cb - _sb * _ca AS DOUBLE)") /
            (col("_ca").cast("double") * col("_cb") * lit(1.0e6d)), 6)
            + lit(0.0d)))
      .withColumn("_va",
        when(col("_ca") < 2L, lit(null).cast("double")).otherwise(
          round(expr("CAST(_qa * _ca - _sa * _sa AS DOUBLE)") /
            (col("_ca").cast("double") * col("_ca") * (col("_ca") - 1L) *
              lit(1.0e12d)), 6) + lit(0.0d)))
      .withColumn("_vb",
        when(col("_cb") < 2L, lit(null).cast("double")).otherwise(
          round(expr("CAST(_qb * _cb - _sb * _sb AS DOUBLE)") /
            (col("_cb").cast("double") * col("_cb") * (col("_cb") - 1L) *
              lit(1.0e12d)), 6) + lit(0.0d)))
      .withColumn("_vv",
        when(col("_va").isNull || col("_vb").isNull,
          lit(null).cast("double"))
          .otherwise(round(col("_va") + col("_vb"), 6) + lit(0.0d)))
      .withColumn("_lnl",
        when(col("_vv").isNull || col("_vv") <= 0.0d,
          lit(null).cast("double"))
          .otherwise(round(
            (round(lit(0.5d) * log(col("_vv") / (col("_vv") + lit(tau2))),
              6) + lit(0.0d)) +
              (round(col("_theta") * col("_theta") * lit(tau2) /
                (lit(2.0d) * col("_vv") * (col("_vv") + lit(tau2))), 6)
                + lit(0.0d)), 6) + lit(0.0d)))
      .withColumn("_pterm",
        when(col("_lnl").isNull, lit(1.0d)).otherwise(
          round(least(lit(1.0d), exp(-col("_lnl"))), 6) + lit(0.0d)))
      .withColumn("p_always", min(col("_pterm")).over(wRun))
    scal.select(
      when(col("_ng") =!= 2, raise_error(concat(
        lit("msprt: need exactly 2 groups with non-null values, got "),
        col("_ng").cast("string")))).otherwise(col("_day")).as("day"),
      col("_ca").as("n_a"), col("_cb").as("n_b"),
      col("_theta").as("theta"), col("_vv").as("v"),
      col("_lnl").as("ln_lambda"), col("p_always"),
      (col("p_always") <= lit(alpha)).as("reject"))
      .orderBy("day")
  }

  /** COCHRAN–MANTEL–HAENSZEL stratified 2×2 test + Mantel–Haenszel
    * common odds ratio (Mantel & Haenszel 1959; Cochran 1954) — "does
    * treatment associate with outcome AFTER controlling for the
    * stratifying confounder?", the contingency-table companion to
    * [[ipwAte]]: same stratum structure, but a test instead of an
    * effect estimate, and no propensity model at all. Per stratum k
    * with treated/control sizes n1/n2, successes m1 and treated
    * successes a: E(a) = n1·m1/n, V = n1·n2·m1·(n−m1)/(n²(n−1));
    * CMH χ²(1) = (Σa − ΣE)²/ΣV (no continuity correction — the
    * uncorrected form is what converges to the χ² reference). The MH
    * pooled odds ratio is Σ(a·d/n) / Σ(b·c/n).
    *
    * Float policy (the [[logRank]] contract): E, V and the two OR
    * terms are round-6 doubles off integer cells in pinned operand
    * order; sums add ROUNDED terms; χ² and the OR are round-6 off the
    * rounded sums. ΣV = 0 → NULL χ² and false significance (no
    * mixed-stratum evidence ≠ no association); a zero OR denominator →
    * NULL odds ratio. `significant_05` compares against the pinned
    * χ²(1) critical value 3.841459. Treatment/outcome outside {0, 1}
    * raise in-plan.
    *
    * Shape: ONE stratum-keyed conditional partial agg is the only
    * corpus-sized stage; everything after folds the #strata-bounded
    * cell table. Empty input → empty output.
    *
    * Returns ONE row (n_strata, n_total, sum_a, expected_a, chi2,
    * or_mh, significant_05). */
  def cmhTest(
      df: DataFrame,
      stratumCol: String,
      treatCol: String,
      outcomeCol: String): DataFrame = {
    val rows = df.where(col(stratumCol).isNotNull).select(
      col(stratumCol).cast("string").as("_s"),
      when(col(treatCol).isNull || !col(treatCol).cast("int").isin(0, 1),
        raise_error(lit("cmhTest: treatment must be 0 or 1")))
        .otherwise(col(treatCol).cast("int")).as("_t"),
      when(col(outcomeCol).isNull || !col(outcomeCol).cast("int").isin(0, 1),
        raise_error(lit("cmhTest: outcome must be 0 or 1")))
        .otherwise(col(outcomeCol).cast("int")).as("_y"))
    val cells = rows.groupBy(col("_s")).agg(
      sum(when(col("_t") === 1 && col("_y") === 1, 1L).otherwise(0L)).as("_a"),
      sum(when(col("_t") === 1 && col("_y") === 0, 1L).otherwise(0L)).as("_b"),
      sum(when(col("_t") === 0 && col("_y") === 1, 1L).otherwise(0L)).as("_c"),
      sum(when(col("_t") === 0 && col("_y") === 0, 1L).otherwise(0L)).as("_d"))
      .withColumn("_n1", col("_a") + col("_b"))
      .withColumn("_n2", col("_c") + col("_d"))
      .withColumn("_m1", col("_a") + col("_c"))
      .withColumn("_n", col("_n1") + col("_n2"))
    val terms = cells
      .withColumn("_e",
        when(col("_n") === 0L, lit(0.0d)).otherwise(
          round(col("_n1").cast("double") * col("_m1") / col("_n"), 6)
            + lit(0.0d)))
      .withColumn("_v",
        when(col("_n") <= 1L, lit(0.0d)).otherwise(
          round(col("_n1").cast("double") * col("_n2") * col("_m1") *
            (col("_n") - col("_m1")) /
            (col("_n").cast("double") * col("_n") * (col("_n") - 1L)), 6)
            + lit(0.0d)))
      .withColumn("_rnum",
        when(col("_n") === 0L, lit(0.0d)).otherwise(
          round(col("_a").cast("double") * col("_d") / col("_n"), 6)
            + lit(0.0d)))
      .withColumn("_rden",
        when(col("_n") === 0L, lit(0.0d)).otherwise(
          round(col("_b").cast("double") * col("_c") / col("_n"), 6)
            + lit(0.0d)))
    val agg = terms.groupBy(lit(1).as("_one")).agg(
      count(lit(1)).as("n_strata"),
      sum(col("_n")).as("n_total"),
      sum(col("_a")).as("sum_a"),
      (round(sum(col("_e")), 6) + lit(0.0d)).as("expected_a"),
      (round(sum(col("_v")), 6) + lit(0.0d)).as("_V"),
      (round(sum(col("_rnum")), 6) + lit(0.0d)).as("_SN"),
      (round(sum(col("_rden")), 6) + lit(0.0d)).as("_SD"))
    val dev = col("sum_a").cast("double") - col("expected_a")
    agg.select(
      col("n_strata"), col("n_total"), col("sum_a"), col("expected_a"),
      when(col("_V") === 0.0d, lit(null).cast("double"))
        .otherwise(round(dev * dev / col("_V"), 6) + lit(0.0d)).as("chi2"),
      when(col("_SD") === 0.0d, lit(null).cast("double"))
        .otherwise(round(col("_SN") / col("_SD"), 6) + lit(0.0d))
        .as("or_mh"),
      coalesce(
        when(col("_V") === 0.0d, lit(null).cast("double")).otherwise(
          round(dev * dev / col("_V"), 6) + lit(0.0d)) > lit(3.841459d),
        lit(false)).as("significant_05"))
  }

  /** INVERSE-PROPENSITY-WEIGHTED average treatment effect (Hájek /
    * self-normalized IPW — Horvitz & Thompson 1952; Hirano, Imbens &
    * Ridder 2003): each treated subject weighs 1/e, each control
    * 1/(1−e), and the ATE is the difference of the two weighted means.
    * The observational companion to [[nnMatchAtt]]: matching picks
    * comparable units, IPW re-weights all of them — same propensity
    * input, one aggregate instead of a join.
    *
    * INTEGER-EXACT end to end: propensity arrives in micro units
    * (e.g. exact stratum shares `treated·10⁶ div n`), is clipped to
    * [clipMicro, 10⁶−clipMicro] (the standard overlap trim — a
    * propensity of 1 ppm would hand one subject a 10⁶× weight), and the
    * weight is the floored integer `10¹² div e_micro` (resp. the
    * 1−e side). Outcomes floor to micro — EXACTLY for integral outcome
    * columns (a DECIMAL ×10⁶, never through a double: an already-micro
    * BIGINT outcome past 2⁵³/10⁶ would silently lose ulps on the
    * float path, reachable at scaled-study corpus sizes); doubles take
    * the usual floor(×10⁶) quantization. Σw·y rides DECIMAL(38,0)
    * (weights ≤ 10¹², y_micro ~ 10¹², corpus 10¹⁰ rows → ~10³⁴ < 10³⁸);
    * the two means are re-signed integral divisions and the ATE their
    * exact difference. One arm empty raises in-plan — a one-armed "ATE"
    * silently reading as a mean would be worse than failing.
    *
    * Shape: ONE scalar conditional aggregate over the subject table —
    * map-side partials, no shuffle beyond the 1-row fold, nothing
    * driver-side. Empty input → empty output.
    *
    * Returns ONE row (n_treated, n_control, mean_treated_micro,
    * mean_control_micro, ate_micro). */
  def ipwAte(
      df: DataFrame,
      treatCol: String,
      outcomeCol: String,
      propensityMicroCol: String,
      clipMicro: Long = 10000L): DataFrame = {
    require(clipMicro >= 0L && clipMicro < 500000L,
      s"ipwAte: clipMicro must be in [0, 5e5), got $clipMicro")
    val d38 = DecimalType(38, 0)
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val yMicro = df.schema(outcomeCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (col(outcomeCol).cast(d38) * lit(1000000L)).cast(d38)
      case _ =>
        floor(col(outcomeCol).cast("double") * lit(1000000.0d)).cast("long")
          .cast(d38)
    }
    val base = df.where(col(outcomeCol).isNotNull).select(
      when(col(treatCol).isNull || !col(treatCol).cast("int").isin(0, 1),
        raise_error(lit("ipwAte: treatment must be 0 or 1")))
        .otherwise(col(treatCol).cast("int")).as("_t"),
      yMicro.as("_y"),
      when(col(propensityMicroCol).isNull || col(propensityMicroCol) <= 0 ||
          col(propensityMicroCol) >= 1000000,
        raise_error(lit("ipwAte: propensity_micro must be in (0, 1e6)")))
        .otherwise(col(propensityMicroCol).cast("long")).as("_e"))
      .withColumn("_ec", least(greatest(col("_e"), lit(clipMicro)),
        lit(1000000L - clipMicro)))
      .withColumn("_w", when(col("_t") === 1,
        expr("1000000000000 div _ec"))
        .otherwise(expr("1000000000000 div (1000000 - _ec)")))
    base
      .groupBy(lit(1).as("_one"))
      .agg(
        sum(when(col("_t") === 1, 1L).otherwise(0L)).as("n_treated"),
        sum(when(col("_t") === 0, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("_t") === 1, col("_w")).otherwise(0L).cast(d38))
          .cast(d38).as("_swt"),
        sum(when(col("_t") === 0, col("_w")).otherwise(0L).cast(d38))
          .cast(d38).as("_swc"),
        sum(when(col("_t") === 1, col("_w").cast(d38) * col("_y"))
          .otherwise(lit(0).cast(d38)).cast(d38)).cast(d38).as("_swyt"),
        sum(when(col("_t") === 0, col("_w").cast(d38) * col("_y"))
          .otherwise(lit(0).cast(d38)).cast(d38)).cast(d38).as("_swyc"))
      .select(
        when(col("n_treated") === 0L || col("n_control") === 0L,
          raise_error(lit("ipwAte: both arms need at least one subject")))
          .otherwise(col("n_treated")).as("n_treated"),
        col("n_control"),
        expr("CAST(CASE WHEN _swyt >= 0 THEN _swyt div _swt " +
          "ELSE -((-_swyt) div _swt) END AS BIGINT)")
          .as("mean_treated_micro"),
        expr("CAST(CASE WHEN _swyc >= 0 THEN _swyc div _swc " +
          "ELSE -((-_swyc) div _swc) END AS BIGINT)")
          .as("mean_control_micro"))
      .withColumn("ate_micro",
        col("mean_treated_micro") - col("mean_control_micro"))
  }

  /** BRADLEY–TERRY strengths from pairwise preferences (Bradley &
    * Terry 1952) via the Hunter (2004) MM iteration — the model behind
    * reward-model preference data: given "i beat j" counts, strength
    * π_i satisfies P(i beats j) = π_i/(π_i+π_j), and the MM update
    * π_i ← W_i / Σ_j n_ij/(π_i+π_j) climbs the likelihood
    * monotonically. Statically unrolled `iterations` rounds — the
    * [[graft.ops.Graph.pageRank]] fixed-point idiom; the output is the
    * pinned K-round iterate, bit-identical on any engine, not a
    * convergence claim (K=12 is well past 1e-6 drift on
    * gate-scale fixtures).
    *
    * INTEGER-EXACT, no floats anywhere: strengths live in micro units
    * (mean 10⁶ after each round's renormalization — mean, not sum, so
    * round-off never starves small strengths), each denominator term is
    * the floored BigInt `n_ij·10¹² / (π_i+π_j)`, the update
    * `W_i·10¹² / D_i`, and renormalization `π·m·10⁶ / Σπ`. An item
    * that never won any comparison has the MLE at the boundary
    * (π → 0): it lands on exactly 0 and stays — documented, not a bug.
    * The `max(·, 1)` pin keeps a 0+0 denominator impossible in the
    * same way on every engine.
    *
    * Shape: ONE [[graft.functions.BradleyTerryAgg]] exchange — each
    * partition map-side-combines its rows into a ≤ items² win-count
    * map, partials merge by addition, and the MM rounds run once in
    * the kernel's exact BigInt arithmetic. (The first formulation
    * unrolled the rounds as DataFrame joins: 12 rounds × ~5 exchanges
    * of pure stage overhead on a 5-item table cost 14 s where the
    * kernel costs one aggregate — an iterative fixed point over a
    * BOUNDED model belongs in a mergeable kernel, not in the plan.)
    * `maxItems` raises loudly on breach — items² is the working-set
    * contract. Empty input → empty output.
    *
    * Returns (item, wins, comparisons, strength_micro) ordered by
    * (strength_micro desc, item). */
  def bradleyTerry(
      df: DataFrame,
      winnerCol: String,
      loserCol: String,
      iterations: Int = 12,
      maxItems: Int = 1000): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"bradleyTerry: iterations must be in [1, 50], got $iterations")
    require(maxItems >= 2 && maxItems <= 10000,
      s"bradleyTerry: maxItems must be in [2, 10000], got $maxItems")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val wl = df.select(col(winnerCol).cast("string").as("_w"),
        col(loserCol).cast("string").as("_l"))
      .where(col("_w").isNotNull && col("_l").isNotNull &&
        col("_w") =!= col("_l"))
    wl
      .agg(toCol(graft.functions.BradleyTerryAgg(
        toExpr(col("_w")), toExpr(col("_l")), iterations, maxItems)
        .toAggregateExpression()).as("_bt"))
      .select(explode(col("_bt")).as("_r"))
      .select(col("_r.item").as("item"), col("_r.wins").as("wins"),
        col("_r.comparisons").as("comparisons"),
        col("_r.strength_micro").as("strength_micro"))
      .orderBy(col("strength_micro").desc, col("item"))
  }

}
