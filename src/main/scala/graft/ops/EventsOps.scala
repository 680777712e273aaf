package graft.ops


import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DecimalType, LongType, StructField, StructType}

/** Event-log ETL operators: semi-structured payload extraction and
  * robust (exact-arithmetic) outlier statistics. */
object EventsOps {

  /** Epoch seconds as `floor(unix_micros/1e6)` — the floor(double) idiom
    * every op here shares so results match the DuckDB oracles'
    * `floor(epoch_us/1e6)` for pre-1970 timestamps too (a truncating
    * `div` rounds toward zero, off by one second for negative epochs).
    * Exact: |unix_micros| < 2⁵³ for ±285 years around 1970. */
  private def epochSec(tsCol: String): org.apache.spark.sql.Column =
    floor(unix_micros(col(tsCol)).cast("double") / lit(1000000.0d)).cast("long")

  /** Extract typed fields from the semi-structured `props` JSON column
    * with a declared schema (`from_json` is codegen'd and map-only — at
    * 100 TB the parse cost is the scan itself; never regex a JSON blob).
    * Unparseable or missing fields come out NULL, never fail the task. */
  def parseProps(ev: DataFrame, propsCol: String = "props"): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    ev.withColumn("_p", from_json(col(propsCol), schema))
      .withColumn("prop_k", col("_p.k"))
      .drop("_p")
  }

  /** Per-key rolling statistics over a bounded ROWS frame (the `frame−1`
    * preceding rows + current), ordered by (orderCol, tieCol) — the tie
    * column makes the order TOTAL, so the frame contents are unique and
    * the result reproducible on any engine and any physical row order.
    * The measure is quantized to BIGINT micro-units (`floor(v·1e6)` —
    * double multiply + floor are identical IEEE ops on every engine)
    * BEFORE the window: integer frame sums are exact and, unlike
    * DECIMAL window sums, carry no engine-dependent result precision
    * (Spark widens SUM(DECIMAL(18,6)) to DECIMAL(28,6), DuckDB to
    * DECIMAL(38,6) — rendering of the two can diverge downstream).
    * One shuffle on the partition key; frames never cross partitions,
    * so parallelism at 100 TB = #keys and the per-row frame update is
    * O(1) (Spark's sliding-ROWS WindowExec adds/removes one row at a
    * time — never re-sums the frame).
    * Returns (tieCol, keyCol, roll_n, roll_sum, roll_min, roll_max)
    * with the roll_* measures in micro-units. */
  def rollingStats(
      ev: DataFrame,
      frame: Int = 5,
      keyCol: String = "user_id",
      orderCol: String = "ts",
      tieCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    require(frame > 0, s"frame must be positive, got $frame")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
      .rowsBetween(-(frame - 1), 0)
    ev.select(col(keyCol), col(orderCol), col(tieCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .select(col(tieCol), col(keyCol),
        count(lit(1)).over(w).as("roll_n"),
        sum(col("_v")).over(w).as("roll_sum"),
        min(col("_v")).over(w).as("roll_min"),
        max(col("_v")).over(w).as("roll_max"))
  }

  /** Per-key TIME-RANGE rolling statistics: for every event, the
    * count/sum/min/max of the key's events inside `[t − windowSeconds,
    * t]` — the wall-clock sibling of [[rollingStats]]' row-count frame,
    * and a different window class entirely (a RANGE frame's membership
    * is defined by the ORDER value, so same-timestamp events all see
    * each other and no tie-break is needed for frame CONTENTS; the
    * output is keyed by event id, so no output-order hazard either).
    * Times are integer epoch seconds and the measure is BIGINT
    * micro-units — frame membership and sums are exact integer
    * arithmetic on any engine. One shuffle on the key; Spark's
    * WindowExec advances both frame edges monotonically per partition
    * (O(1) amortized per row), so the shape holds at 100 TB exactly
    * like the ROWS variant.
    * Returns (tieCol, keyCol, win_n, win_sum, win_min, win_max). */
  def rollingRange(
      ev: DataFrame,
      windowSeconds: Long = 3600L,
      keyCol: String = "user_id",
      orderCol: String = "ts",
      tieCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    require(windowSeconds >= 0, s"windowSeconds must be non-negative, got $windowSeconds")
    val tSec = floor(unix_micros(col(orderCol)).cast("double") / lit(1000000.0d)).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_t"))
      .rangeBetween(-windowSeconds, 0)
    ev.select(col(keyCol), col(tieCol), tSec.as("_t"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .select(col(tieCol), col(keyCol),
        count(lit(1)).over(w).as("win_n"),
        sum(col("_v")).over(w).as("win_sum"),
        min(col("_v")).over(w).as("win_min"),
        max(col("_v")).over(w).as("win_max"))
  }

  /** Temporal train/eval split with a leakage gap — the time-series
    * analogue of the content split: rows at or before the cutoff are
    * `train`, rows after `cutoff + gap` are `eval`, and rows inside the
    * gap are `dropped` (they could leak near-future information into
    * training). The cutoff is the exact `trainFrac` percentile of epoch
    * SECONDS (integer comparisons thereafter — no float boundary
    * hazard), computed WITHOUT the `percentile` aggregate's per-group
    * value buffer (the 100 TB OOM class): epoch seconds collapse to a
    * time-span-bounded (second → count) table, ranks come from a
    * running sum over that bounded table, and the two bracketing order
    * statistics fall out of conditional-min folds — the
    * [[slaPercentiles]] rank recipe with [[rankInterpolatedPercentile]]
    * reproducing Spark's interpolation bit-for-bit. The 1-row cut stays
    * IN-PLAN via `crossJoin(broadcast(...))` (the [[conversionLatency]]
    * idiom) — no Spark job fires at DataFrame construction.
    * STATICALLY-empty inputs (a LocalRelation the optimizer can prove
    * empty, e.g. `where(lit(false))` on an in-memory frame) yield an
    * empty output; otherwise an input with no usable timestamp — all
    * NULL `ts`, INCLUDING a genuinely empty distributed scan such as an
    * empty parquet directory, whose emptiness is a runtime fact — raises
    * lazily via `raise_error` instead of silently labeling against a
    * NULL cut (same behavior as the `require` it replaced). */
  def temporalSplit(
      ev: DataFrame,
      tsCol: String = "ts",
      trainFrac: Double = 0.8,
      gapSeconds: Long = 3600L): DataFrame = {
    require(trainFrac > 0 && trainFrac < 1, "temporalSplit: need 0 < trainFrac < 1")
    require(gapSeconds >= 0, "temporalSplit: gap must be non-negative")
    import org.apache.spark.sql.expressions.Window
    val tSec = floor(unix_micros(col(tsCol)).cast("double") / lit(1000000.0d)).cast("long")
    // (second → count) partial agg: the corpus never sorts globally;
    // the window runs over the time-span-bounded count table only.
    val counts = ev.select(tSec.as("_t")).where(col("_t").isNotNull)
      .groupBy(col("_t")).agg(count(lit(1)).as("_c"))
    val ranked = counts // distinct-second-bounded ladder (observation window)
      .withColumn("_cum", sum(col("_c")).over(Window.orderBy(col("_t"))))
      .withColumn("_n", sum(col("_c")).over(
        Window.orderBy(col("_t"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // multiset rank r lives at the first distinct value whose running
    // count reaches r, so `min(_t | _cum >= r)` selects order statistics
    val pos = (col("_n") - lit(1L)).cast("double") * lit(trainFrac)
    val rLo = floor(pos) + lit(1L)
    val rHi = ceil(pos) + lit(1L)
    val cutTbl = ranked.agg(
        min(when(col("_cum") >= rLo, col("_t"))).as("_vlo"),
        min(when(col("_cum") >= rHi, col("_t"))).as("_vhi"),
        max(pos).as("_pos"), max(floor(pos)).as("_lo"), max(ceil(pos)).as("_hi"))
      .select(floor(
        when(col("_hi") === col("_lo"), col("_vlo").cast("double"))
          .when(col("_vhi") === col("_vlo"), col("_vlo").cast("double"))
          .otherwise((col("_hi").cast("double") - col("_pos")) * col("_vlo").cast("double")
            + (col("_pos") - col("_lo").cast("double")) * col("_vhi").cast("double")))
        .cast("long").as("_cutRaw"))
      // guard lives on the 1-row cut itself: rows-but-no-timestamps is
      // refused when the broadcast side builds, never silently labeled
      .select(coalesce(col("_cutRaw"),
        expr("CAST(raise_error('temporalSplit: empty input — no usable timestamps') AS LONG)"))
        .as("_cut"))
    ev.crossJoin(broadcast(cutTbl))
      .withColumn("split",
        when(tSec <= col("_cut"), "train")
          .when(tSec > col("_cut") + gapSeconds, "eval")
          .otherwise("dropped"))
      .drop("_cut")
  }

  /** Per-group winsorization (outlier capping): clamp each value into
    * its group's [lo, hi] exact-percentile envelope — the standard
    * robust-preprocessing step before training-statistics aggregation.
    * The bounds are EXACT linear-interpolation percentiles computed
    * WITHOUT the `percentile` aggregate's per-group value buffer (the
    * 100 TB OOM class): the shared [[RankLadder]] recipe — values
    * collapse to a per-group (value → count) partial agg FIRST, ranks
    * come from a running sum over that distinct-value-bounded table,
    * and the conditional-min folds + blend reproduce Spark's
    * `Percentile` interpolation bit-for-bit. Bounds collapse to
    * |groups| rows, broadcast back for the map-only clamp; output in
    * floor micro-units so the gate hashes integers (original values
    * pass through exactly).
    *
    * Parallelism note: the ranking window sorts each group's DISTINCT
    * values through one task — on fixed-decimal money or integer
    * latencies that is a tiny fraction of the rows, but a truly
    * continuous measure in a key-poor corpus degenerates to
    * #groups-bounded parallelism (spill-safe — a memory-unbounded
    * buffer never comes back; wall clock is bounded by the largest
    * group's distinct-value sort). */
  def winsorize(
      ev: DataFrame,
      groupCol: String = "event_type",
      idCol: String = "event_id",
      valueCol: String = "value",
      lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "winsorize: need 0 <= lo < hi <= 1")
    import org.apache.spark.sql.expressions.Window
    // equal values interpolate identically, so rank ties need no
    // tie-break — the (rank → value) map is deterministic regardless
    val counts = ev.where(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("_v"))
      .groupBy(col(groupCol), col("_v")).agg(count(lit(1)).as("_c"))
    val ranked = counts
      .withColumn("_cum", sum(col("_c")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("_v"))))
      .withColumn("_n", sum(col("_c")).over(
        Window.partitionBy(col(groupCol))))
    val aggCols = RankLadder.cumFolds(lo, "L") ++ RankLadder.cumFolds(hi, "H")
    val bounds = ranked.groupBy(col(groupCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col(groupCol),
        RankLadder.blend("L").as("_plo"), RankLadder.blend("H").as("_phi"))
    // left join: a group whose values are all NULL has no bounds row —
    // its rows clamp to NULL v_w, exactly as a NULL percentile would
    ev.join(broadcast(bounds), Seq(groupCol), "left")
      .select(col(idCol), col(groupCol),
        floor(least(greatest(col(valueCol), col("_plo")), col("_phi")) * lit(1000000.0d))
          .cast("long").as("v_w"))
  }

  /** Linear interpolation of NULL gaps per key — the time-series
    * feature-pipeline companion to forward fill: a missing value
    * between known neighbors (vₚ @ tₚ, vₙ @ tₙ) becomes
    * `vₚ + ⌊(vₙ−vₚ)·(t−tₚ) / (tₙ−tₚ)⌋` in integer micro-units.
    * INTEGER-EXACT cross-engine: values quantize to micro-units
    * (⌊v·10⁶⌋), time weights are whole seconds, and the one division is
    * IEEE-double-then-floor over products bounded far under 2^53
    * (requires |v| ≤ ~10⁶ and gap spans ≤ ~250 years — raise-checked
    * cheaply by the magnitude guard on the product). Leading/trailing
    * NULLs (no neighbor on one side) stay NULL.
    *
    * One shuffle: both neighbor windows ride the same (key, order)
    * partitioning. Returns (key, tieCol, v_interp) with v_interp in
    * micro-units. */
  def interpolateLinear(
      ev: DataFrame,
      keyCol: String = "user_id",
      orderCol: String = "ts",
      tieCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Window.partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
    val before = base.rowsBetween(Window.unboundedPreceding, -1)
    val after = base.rowsBetween(1, Window.unboundedFollowing)
    val vq = floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long")
    val tSec = floor(unix_micros(col(orderCol)).cast("double") / lit(1000000.0d)).cast("long")
    val known = struct(vq.as("v"), tSec.as("t"))
    val withNbrs = ev.select(col(keyCol), col(orderCol), col(tieCol),
        vq.as("_v"), tSec.as("_t"),
        when(col(valueCol).isNotNull, known).as("_k"))
      .withColumn("_p", last(col("_k"), ignoreNulls = true).over(before))
      .withColumn("_n", first(col("_k"), ignoreNulls = true).over(after))
    val dv = col("_n")("v") - col("_p")("v")
    val dt = col("_n")("t") - col("_p")("t")
    val dte = col("_t") - col("_p")("t")
    // DECIMAL(38,0) holds ANY long×long product exactly (|prod| < 2^126
    // ≈ 8.5e37 < 10^38), so the magnitude guard below sees the true
    // value — a LongType product would wrap past 2^63 and could land
    // back UNDER the 2^53 check, silently corrupting v_interp
    val prod = dv.cast(DecimalType(19, 0)) * dte.cast(DecimalType(19, 0))
    val interp = when(dt === 0, col("_p")("v")) // same-second neighbors
      .otherwise(
        when(abs(prod) >= lit(1L << 53),
          raise_error(lit("interpolateLinear: |dv*dt| exceeds exact double range")))
          .otherwise(col("_p")("v") + floor(prod.cast("double") / dt.cast("double")).cast("long")))
    withNbrs.select(col(keyCol), col(tieCol),
      when(col("_v").isNotNull, col("_v"))
        .when(col("_p").isNotNull && col("_n").isNotNull, interp)
        .as("v_interp"))
  }

  /** Per-group 3-sigma outlier counts over a double measure, computed in
    * EXACT integer arithmetic so the result is reproducible on any
    * engine and any aggregation order (float sums are order-dependent; a
    * distributed re-run could otherwise flip a boundary row). The
    * measure is fixed to 6 decimal places (exact for the source data),
    * then everything is integer:
    *
    *   outlier  ⇔  (x−μ)² > 9σ²
    *            ⇔  (x·n − s)² · (n−1)  >  9 · n · (n·q − s²)     [·n²(n−1)]
    *            ⇔  |x·n − s|  ≥  T,   T = ceil(√(⌊9n(nq−s²)/(n−1)⌋ + 1))
    *
    * with s = Σx, q = Σx² in 1e-6-unit integers. The threshold form is
    * what makes this safe at scale: the naive per-row inequality has
    * both sides ~n³·max(x)², which blows past DECIMAL(38,0) around
    * n^1.5·max|x|·1e6 ≳ 5e18 and (non-ANSI) silently NULLs — counting
    * boundary rows as "not outliers" while an exact engine errors. Here
    * T is computed ONCE PER GROUP inside the plan by the native
    * `outlier_threshold` expression (arbitrary-precision BigInt kernel
    * over the group's DECIMAL(38,0) moments — the interior 9n(nq−s²)
    * needs ~3×38 digits, which no fixed DECIMAL column holds), so the
    * threshold table never visits the driver and GROUP CARDINALITY IS
    * UNBOUNDED; the distributed per-row test |x·n − s| ≥ T
    * is only ~n·max|x|·1e6, exact through n·max|x| < 1e32. Every residual
    * overflow is LOUD, never a silent misclassification: the 1e-6
    * fixed-point cast (|x| ≥ 1e12), the s/q aggregation
    * (n·(max|x|·1e6)² ≥ 1e38), and the per-row product all raise.
    * Sample variance (n−1); groups with n < 2 report 0 outliers; NULL
    * measures count toward n but are never outliers. Two shuffles: the
    * stats partial-agg and the broadcast join of the per-group
    * thresholds back onto the rows. */
  def valueOutliers(
      ev: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    // 1e-6-unit integer value: DOUBLE → DECIMAL(18,6) is an exact
    // half-up rounding of the binary value on both Spark and DuckDB
    // (binary doubles are never exact ties at 6 decimals)
    val v6 = (col(valueCol).cast("decimal(18,6)") * lit(1000000L))
      .cast("decimal(38,0)")
    val rows = ev.select(col(groupCol).as("g"),
      when(col(valueCol).isNotNull && v6.isNull,
        raise_error(lit("valueOutliers: |value| >= 1e12 overflows the " +
          "exact DECIMAL(18,6) fixed-point domain"))).otherwise(v6).as("v"))
    val stats = rows.groupBy("g").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      count(col("v")).as("nv"),
      sum(col("v")).cast("decimal(38,0)").as("s"),
      sum((col("v") * col("v")).cast("decimal(38,0)")).cast("decimal(38,0)").as("q"))
    // Exact per-group threshold IN-PLAN: the native outlier_threshold
    // expression holds the >38-digit interior in BigInt, returns NULL
    // for n < 2 / all-NULL groups, and raises on a threshold past the
    // exact per-row comparison domain. The s/q aggregation's own
    // (non-ANSI, silent) DECIMAL overflow is surfaced loudly first.
    val aggOverflow = col("nv") > lit(0L) && (col("s").isNull || col("q").isNull)
    val thrDf = stats.select(
      col("g"), col("n"), col("s").as("bs"),
      when(aggOverflow,
        raise_error(concat(
          lit("valueOutliers: DECIMAL(38,0) overflow aggregating group '"),
          col("g").cast("string"),
          lit("': n·(max|value|·1e6)² exceeds 1e38")))
          .cast(DecimalType(38, 0)))
        .otherwise(graft.functions.GraftFunctions.outlier_threshold(
          col("n"), col("s"), col("q")))
        .as("bt"))
    val d = col("v") * col("n") - col("bs")
    val out = when(col("bt").isNull || col("v").isNull, lit(false))
      .when(col("v").isNotNull && d.isNull,
        raise_error(lit("valueOutliers: DECIMAL(38,0) overflow in the " +
          "per-row test — n·|value|·1e6 exceeds 1e38")).cast(BooleanType))
      .otherwise(abs(d) >= col("bt"))
    rows.join(broadcast(thrDf), Seq("g"))
      .withColumn("_out", out)
      .groupBy("g")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_out"), 1L).otherwise(0L)).as("n_outliers"))
      .select(col("g").as(groupCol), col("n_rows"), col("n_outliers"))
  }

  /** Per-key exponentially-weighted moving average with decay ½,
    * truncated to the last `frame` rows — the smoothing sibling of
    * [[rollingStats]]' flat frame. Row at lag k (k = 0 newest) gets
    * weight 2^(m−1−k) over the m = min(rows-so-far, frame) frame rows,
    * normalized by Σ = 2^m − 1 — i.e. pandas' `ewm(alpha=.5,
    * adjust=True)` on a bounded window, but in INTEGER arithmetic:
    * values quantize to micro-units, the weighted sum is a sum of
    * integer·power-of-two products, and the single normalizing division
    * is IEEE-double-then-floor guarded to the exact range (|num| <
    * 2^52 keeps the quotient's ulp below the minimum distance, 1/Σ,
    * from any representable quotient to an integer boundary — floor
    * cannot straddle, on any engine).
    *
    * The frame is expressed as `frame` LAG columns over ONE window
    * partitioning (no collect_list, no lambda fold) — a single shuffle
    * on the key, O(frame) state per row, engine-portable because lag /
    * row_number / CASE exist everywhere SQL does. Returns (tieCol,
    * keyCol, m, ewma_micro). */
  /** Per-day active-user counts with a trailing-window distinct (DAU +
    * WAU-style): for every day that has events, how many distinct users
    * were active that day, and how many were active in the trailing
    * `windowDays` (inclusive). COUNT DISTINCT over a sliding frame is
    * the classic scale trap — windowed `count_distinct` doesn't exist,
    * and a day×user self-join explodes. This uses the contribution-
    * interval identity instead: a user's activity on day p covers days
    * `[p, p + W − 1]` until their next active day — so each DISTINCT
    * (user, day) pair expands to AT MOST W contribution rows (lead()
    * caps the interval, preventing double counting), and the trailing
    * distinct count is a plain SUM per day.
    *
    * Shape at 100 TB: one partial-agg distinct on (user, day) — the
    * only corpus-sized shuffle; the lead() window rides the same hash
    * partitioning (user key); the ≤W-fold expansion happens AFTER
    * dedup, on the slim pair list; final groupBy(day) aggregates
    * ≤W·|pairs| rows down to |days|. Days are integer epoch-days —
    * exact everywhere. Only days with events are reported (a zero-event
    * day inside someone's window is a calendar join away, kept out of
    * the operator).
    * Returns (day, dau, wau), ordered by nothing — callers sort. */
  def rollingActiveUsers(
      ev: DataFrame,
      windowDays: Int = 7,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(windowDays >= 1, s"rollingActiveUsers: need windowDays >= 1, got $windowDays")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("day"))
    val pairs = ev
      .select(col(userCol),
        // floor at both stages (the oracle's `//`), not truncating div —
        // pre-1970 parity, same as every other epoch derivation here
        floor(epochSec(tsCol).cast("double") / lit(86400.0d)).cast("long").as("day"))
      .distinct()
    val contrib = pairs
      .withColumn("_nxt", lead(col("day"), 1).over(w))
      .select(col(userCol),
        explode(sequence(col("day"),
          least(col("day") + lit(windowDays - 1),
            coalesce(col("_nxt") - 1, col("day") + lit(windowDays - 1))))).as("_d"))
    val wau = contrib.groupBy(col("_d").as("day"))
      .agg(count(lit(1)).as("wau"))
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    // contribution days with no events (inside someone's trailing window
    // only) drop out here — the report covers observed days exactly
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"))
  }

  def ewmaSmooth(
      ev: DataFrame,
      frame: Int = 8,
      keyCol: String = "user_id",
      orderCol: String = "ts",
      tieCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    require(frame >= 1 && frame <= 16, s"ewmaSmooth: need 1 <= frame <= 16, got $frame")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
    val base = ev.select(col(keyCol), col(orderCol), col(tieCol),
      floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
    val m = least(row_number().over(w), lit(frame))
    // Σ_{k<m} v_{t−k}·2^(m−1−k): every term is lag·2^e with e ≤ 15 —
    // DECIMAL(38,0) so a large value cannot wrap the long product
    // before the range guard sees it (same rule as interpolateLinear)
    val num = (0 until frame).map { k =>
      when(lit(k) < m,
        lag(col("_v"), k).over(w).cast(DecimalType(38, 0)) *
          pow(lit(2.0d), (m - 1 - lit(k)).cast("double")).cast(DecimalType(38, 0)))
        .otherwise(lit(0).cast(DecimalType(38, 0)))
    }.reduce(_ + _)
    val denom = pow(lit(2.0d), m.cast("double")).cast("long") - lit(1L)
    base.select(col(tieCol), col(keyCol), m.as("m"), num.as("_num"), denom.as("_den"))
      .select(col(tieCol), col(keyCol), col("m"),
        when(abs(col("_num")) >= lit(1L << 52).cast(DecimalType(38, 0)),
          raise_error(lit("ewmaSmooth: |weighted sum| exceeds exact double range")))
          .otherwise(
            floor(col("_num").cast("double") / col("_den").cast("double")).cast("long"))
          .as("ewma_micro"))
  }

  /** SESSION JOURNEY MOTIFS: the most common opening event-type paths
    * ("view>click>purchase") across gap-delimited sessions — the
    * session-level sibling of [[transitionMotifs]]' single transitions,
    * and the table a funnel designer reads first.
    *
    * Sessions are gap-based (a new session starts after `gapSeconds`
    * of silence — the batch twin of session_window), the path is the
    * first `pathLen` event types in (t, id) order joined with '>', and
    * paths count globally into a TakeOrdered top-k (path tie-break).
    * Everything rides ONE key shuffle (session cumsum, in-session rank)
    * + a |paths|-bounded partial agg; collect_list order is repaired by
    * array_sort on the rank-keyed structs, so the path string is
    * deterministic on any engine.
    *
    * Returns (path, n_sessions). */
  def journeyMotifs(
      ev: DataFrame,
      gapSeconds: Long = 1800L,
      pathLen: Int = 3,
      topK: Int = 20,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(pathLen >= 1 && topK >= 1,
      s"journeyMotifs: need pathLen/topK >= 1, got $pathLen/$topK")
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_t"), col(tieCol))
    val base = ev.select(col(keyCol), col(tieCol), col(typeCol).as("_et"),
        epochSec(tsCol).as("_t"))
      .withColumn("_new",
        when(lag(col("_t"), 1).over(wu).isNull ||
          col("_t") - lag(col("_t"), 1).over(wu) > gapSeconds, 1L).otherwise(0L))
      .withColumn("_sess", sum(col("_new")).over(
        wu.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("_sess")).orderBy(col("_t"), col(tieCol))
    base.withColumn("_rn", row_number().over(ws))
      .where(col("_rn") <= pathLen)
      .groupBy(col(keyCol), col("_sess"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(_rn, _et))), x -> x._et), '>')")
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topK)
  }

  /** COHORT RETENTION MATRIX — the product-analytics staple p38's
    * day-over-day counts don't give you: users grouped by their signup
    * WEEK (first `signupType` event), tracked by weeks-since-signup.
    * Cell (cohort_week, age_weeks) counts distinct users of that cohort
    * active in that week; `retained_ppm` normalizes by the cohort's
    * age-0 size (which always exists — the signup event itself is
    * week-0 activity).
    *
    * Slim by construction: the distinct (user, week) projection is the
    * only corpus-sized shuffle; the matrix is |cohorts|·|ages| rows and
    * its age-0 normalizer joins back broadcast. All-integer week/age
    * arithmetic (epoch days div 7).
    *
    * Returns (cohort_week, age_weeks, n_users, retained_ppm). */
  def cohortMatrix(
      ev: DataFrame,
      signupType: String = "signup",
      keyCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    // floor division at every stage (epoch sec → day → week), mirroring
    // the oracle's `//`; `div` would truncate toward zero pre-1970
    val wk = floor(floor(epochSec(tsCol).cast("double") / lit(86400.0d)) / lit(7.0d))
      .cast("long")
    val weeks = ev.select(col(keyCol), col(typeCol), wk.as("_wk"))
    val cohorts = weeks.where(col(typeCol) === signupType)
      .groupBy(keyCol).agg(min(col("_wk")).as("_cw"))
    val matrix = weeks.join(cohorts, Seq(keyCol))
      .where(col("_wk") >= col("_cw"))
      .select(col(keyCol), col("_cw"), col("_wk")).distinct()
      .groupBy(col("_cw").as("cohort_week"), (col("_wk") - col("_cw")).as("age_weeks"))
      .agg(count(lit(1)).as("n_users"))
    val base = matrix.where(col("age_weeks") === 0)
      .select(col("cohort_week"), col("n_users").as("_size"))
    matrix.join(broadcast(base), Seq("cohort_week"))
      .selectExpr("cohort_week", "age_weeks", "n_users",
        "CAST(n_users * 1000000 div _size AS BIGINT) AS retained_ppm")
  }

  /** Per-user CONVERSION LATENCY with decile bucketing: seconds from
    * the user's first `fromType` event to their first `toType` event
    * at-or-after it (users without that ordered pair drop out), plus
    * the exact-percentile decile of each latency — the funnel gate
    * (p41) counts WHO converts; this measures HOW FAST.
    *
    * One shuffle: the first-`fromType` timestamp rides a key window,
    * the qualifying `toType` minimum reuses the same partitioning, and
    * the decile cuts are EXACT interpolated percentiles computed
    * WITHOUT the `percentile` aggregate's value buffer (the 100 TB OOM
    * class): latencies collapse to a latency-span-bounded
    * (second → count) table, ranks come from a running sum over that
    * bounded table only, and the bracketing order statistics fall out
    * of conditional-min folds — the [[RankLadder]] recipe, reproducing
    * Spark's `Percentile` interpolation bit-for-bit. Fully LAZY — no
    * driver action at construction time; the 1-row cut array stays
    * in-plan via `crossJoin(broadcast)`, and AQE reuses the latency
    * aggregate's exchange rather than recomputing it. Latencies are
    * integer epoch-second deltas.
    *
    * Returns (keyCol, latency_s, decile 1..buckets). */
  def conversionLatency(
      ev: DataFrame,
      fromType: String = "view",
      toType: String = "purchase",
      buckets: Int = 10,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(buckets >= 2, s"conversionLatency: need >= 2 buckets, got $buckets")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val lat = ev
      .select(col(keyCol), col(typeCol),
        epochSec(tsCol).as("_t"))
      .withColumn("_fv",
        min(when(col(typeCol) === fromType, col("_t"))).over(wAll))
      .where(col(typeCol) === toType && col("_fv").isNotNull &&
        col("_t") >= col("_fv"))
      .groupBy(keyCol)
      .agg((min(col("_t")) - first(col("_fv")).cast("long")).as("latency_s"))
    val qs = (1 until buckets).map(_.toDouble / buckets)
    // 1-row cut list stays IN the plan (no .first() at construction) and
    // broadcast-cross-joins back — zero converters: lat is empty, so the
    // cross join is empty too. The global window rides the
    // latency-span-bounded count table, never the corpus.
    import org.apache.spark.sql.expressions.Window
    val counts = lat
      .select(col("latency_s").cast("double").as("_v"))
      .where(col("_v").isNotNull)
      .groupBy(col("_v")).agg(count(lit(1)).as("_c"))
    val ranked = counts // distinct-micro-value-bounded ladder (winsorize contract)
      .withColumn("_cum", sum(col("_c")).over(Window.orderBy(col("_v"))))
      .withColumn("_n", sum(col("_c")).over(
        Window.orderBy(col("_v"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val aggCols = qs.zipWithIndex.flatMap { case (p, i) => RankLadder.cumFolds(p, s"q$i") }
    val cuts = ranked.agg(aggCols.head, aggCols.tail: _*)
      .select(array(qs.indices.map(i => RankLadder.blend(s"q$i")): _*).as("_cuts"))
    lat.crossJoin(broadcast(cuts))
      .select(col(keyCol), col("latency_s"),
        (lit(1) + size(filter(col("_cuts"),
          c => c <= col("latency_s").cast("double")))).as("decile"))
  }

  /** Global top-k behavioral MOTIFS: the most frequent consecutive
    * event-type transitions across all keys' (t, id)-ordered streams —
    * the first diagnostic you run on a clickstream ("what do users do
    * right after X?") and the input to Markov-chain session models.
    *
    * Shape: one key-partitioned lag window emits each transition
    * (map-ish — the only shuffle moves (key, type) pairs, never
    * payloads), then a partial-agg count on the (from, to) pair —
    * |types|²-bounded output — and a TakeOrdered top-k. Ties break on
    * the pair for determinism. Transitions never cross keys. */
  def transitionMotifs(
      ev: DataFrame,
      topK: Int = 20,
      keyCol: String = "user_id",
      orderCol: String = "ts",
      tieCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(topK > 0, s"transitionMotifs: need topK > 0, got $topK")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
    ev.select(col(keyCol), col(orderCol), col(tieCol), col(typeCol))
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .where(col("_prev").isNotNull)
      .groupBy(col("_prev").as("etype_from"), col(typeCol).as("etype_to"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("etype_from").asc, col("etype_to").asc)
      .limit(topK)
  }

  /** Per-key CHANGE-POINT localization via the CUSUM split statistic —
    * [[groupTrend]] says a key drifts; this says WHERE it broke. For
    * the key's (t, id)-ordered series the statistic at position i is
    * `S_i = n·Σ_{j≤i} y_j − i·Σy` (the classic cumulative deviation
    * from the key mean, scaled by n to stay in INTEGER arithmetic —
    * no rational mean ever materializes); the reported change point is
    * the position maximizing |S_i|, earliest position on ties.
    *
    * Both passes (running cumsum, then argmax selection) ride the same
    * key partitioning — one shuffle, a second per-partition sort only.
    * Envelope: |S| ≤ n²·max|y| ≤ 1e23 at 1e7 rows/key with values to
    * 1e3 — inside DECIMAL(38,0)/HUGEINT; the reported magnitude is
    * `|S| div n ≤ n·max|y|` which fits BIGINT (and is the mean-scaled
    * statistic you'd threshold anyway).
    *
    * Returns (keyCol, n, cp_index 1-based, cp_<tieCol>, cusum_div_n). */
  def changePoint(
      ev: DataFrame,
      keyCol: String = "user_id",
      orderCol: String = "ts",
      tieCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    val d = DecimalType(38, 0)
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val base = ev.where(col(valueCol).isNotNull)
      .select(col(keyCol), col(orderCol), col(tieCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_y"))
      .select(col(keyCol), col(tieCol),
        row_number().over(wRun).as("_i"),
        sum(col("_y")).over(wRun).as("_cum"),
        count(lit(1)).over(wAll).as("n"),
        sum(col("_y")).over(wAll).as("_tot"))
      .withColumn("_sab",
        abs(col("_cum").cast(d) * col("n").cast(DecimalType(10, 0)) -
          col("_i").cast(DecimalType(10, 0)) * col("_tot").cast(d)))
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_sab").desc, col("_i").asc)
    base.withColumn("_rk", row_number().over(wPick))
      .where(col("_rk") === 1)
      .selectExpr(s"`$keyCol`", "n", "_i AS cp_index",
        s"`$tieCol` AS cp_$tieCol", "CAST(_sab div n AS BIGINT) AS cusum_div_n")
  }

  /** Per-group ROBUST outliers via median absolute deviation — the
    * heavy-tail-safe sibling of [[valueOutliers]] (whose mean/σ test a
    * single extreme value can mask). Flags rows with
    * `|v − median| > k · MAD` in integer micro-units.
    *
    * Both medians are the LOWER median — the value at rank
    * `(n+1) div 2` of the (v, id)-sorted group — selected by rank, not
    * averaged, so the statistic is an integer an engine either matches
    * exactly or not at all (no even-count interpolation hazard). Rank
    * ties share a value, so the SELECTED VALUE is order-independent.
    * `MAD = 0` (over half the group at the median) degenerates to
    * flagging every `dev > 0` row — the standard modified-z caveat,
    * kept deterministic rather than special-cased.
    *
    * Shape: two window passes + a small per-group join, all on the
    * group key (one shuffle, exchange reused). Parallelism = #groups —
    * like winsorize, for few massive groups at 100 TB swap the exact
    * rank selection for percentile_approx and keep the flag rule.
    *
    * Returns flagged rows (idCol, groupCol, v_micro, med, mad, dev). */
  def madOutliers(
      ev: DataFrame,
      groupCol: String = "event_type",
      idCol: String = "event_id",
      valueCol: String = "value",
      k: Int = 3): DataFrame = {
    require(k >= 1, s"madOutliers: need k >= 1, got $k")
    val byG = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    def lowerMedian(df: DataFrame, vc: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col(vc), col("id"))
      df.select(col("g"), col(vc),
          row_number().over(w).as("_rn"), count(lit(1)).over(byG).as("_n"))
        .where(col("_rn") === expr("(_n + 1) div 2"))
        .select(col("g"), col(vc).as("_m"))
    }
    val rows = ev.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(idCol).as("id"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("v"))
    val med = lowerMedian(rows, "v").withColumnRenamed("_m", "med")
    val withDev = rows.join(med, Seq("g"))
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = lowerMedian(
      withDev.select(col("g"), col("id"), col("dev")), "dev")
      .withColumnRenamed("_m", "mad")
    withDev.join(mad, Seq("g"))
      .where(col("dev") > lit(k.toLong) * col("mad"))
      .select(col("id").as(idCol), col("g").as(groupCol),
        col("v").as("v_micro"), col("med"), col("mad"), col("dev"))
  }

  /** Per-key least-squares trend (drift detection over a metric stream):
    * OLS slope of `value` against time, INTEGER-EXACT cross-engine.
    *
    * `slope = (n·Σty − Σt·Σy) / (n·Σt² − (Σt)²)` over t = epoch seconds
    * and y = micro-units. Numerator and denominator are computed in
    * DECIMAL(38,0) (DuckDB: HUGEINT) — integer arithmetic has no
    * catastrophic cancellation, so no mean-centering pass is needed and
    * the whole op is ONE aggregate, one shuffle, no window. Magnitude
    * envelope (documented, raise-free): |n·Σty| ≤ 1e30 at 1e7 rows/key
    * with |y| ≤ 1e9 micro — far inside both engines' 38-digit integers.
    *
    * The reported slope is micro-units PER DAY, reduced by integral
    * division forced to truncate TOWARD ZERO on both engines (Spark
    * `div` truncates; DuckDB `//` floors — so both sides divide
    * non-negative magnitudes and re-sign, making the results
    * bit-identical for negative slopes too). Keys whose denominator is
    * zero (single sample or all samples in one second) report NULL.
    *
    * Returns (keyCol, n, t_span_seconds, slope_day_micro). */
  def groupTrend(
      ev: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val d = DecimalType(38, 0)
    val base = ev.where(col(valueCol).isNotNull)
      .select(col(keyCol),
        epochSec(tsCol).as("_t"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_y"))
    val agg = base.groupBy(keyCol).agg(
      count(lit(1)).as("n"),
      (max(col("_t")) - min(col("_t"))).as("t_span_seconds"),
      sum(col("_t").cast(DecimalType(12, 0))).cast(d).as("_st"),
      sum(col("_y").cast(DecimalType(20, 0))).cast(d).as("_sy"),
      sum(col("_t").cast(DecimalType(12, 0)) * col("_y").cast(DecimalType(20, 0)))
        .cast(d).as("_sty"),
      sum(col("_t").cast(DecimalType(12, 0)) * col("_t").cast(DecimalType(12, 0)))
        .cast(d).as("_stt"))
    val n = col("n").cast(DecimalType(10, 0))
    val num = n * col("_sty") - col("_st") * col("_sy")
    val den = n * col("_stt") - col("_st") * col("_st")
    agg.select(col(keyCol), col("n"), col("t_span_seconds"),
        num.as("_num"), den.as("_den"),
        (abs(num) * lit(86400).cast(DecimalType(6, 0))).as("_numday"))
      .selectExpr(s"`$keyCol`", "n", "t_span_seconds",
        "CASE WHEN _den = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(CASE WHEN _num >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(_numday div _den AS BIGINT) END AS slope_day_micro")
  }

  /** Per-key UNION length of TTL intervals — each event opens the
    * interval `[t, t+ttl)` in epoch seconds and overlaps must not
    * double-count (true "active seconds" per user under a session TTL,
    * versus [[rollingActiveUsers]]' distinct-user counting and
    * sessionize's gap-splitting).
    *
    * Classic sweep-line, but expressed as ONE window + ONE aggregate on
    * the same key (the exchange is reused — a single shuffle end to
    * end): with events sorted by t, each row's novel contribution is
    * `max(0, (t+ttl) − max(pmax, t))` where `pmax` is the running max
    * end over all STRICTLY EARLIER rows; summing contributions gives the
    * union length exactly. Duplicate timestamps need no pre-dedup: among
    * tied rows one contributes and the rest see `pmax ≥ t+ttl` → 0, and
    * the SUM is invariant to which engine breaks the tie — only
    * aggregated outputs are exposed, so the result is deterministic
    * cross-engine even though per-row contributions are not.
    *
    * All arithmetic is integer seconds (BIGINT) — no float boundary.
    * At 100 TB: parallelism = #keys, per-row frame update O(1), and no
    * interval explosion (contrast the generate_series contribution
    * trick, which is bounded by windowDays — this one is O(n) for any
    * ttl).
    *
    * Returns (keyCol, n_events, covered_seconds, span_seconds). */
  def intervalCoverage(
      ev: DataFrame,
      ttlSeconds: Long = 300L,
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(ttlSeconds > 0, s"intervalCoverage: need ttlSeconds > 0, got $ttlSeconds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    ev.select(col(keyCol),
        epochSec(tsCol).as("_t"))
      .withColumn("_pmax", max(col("_t") + lit(ttlSeconds)).over(w))
      .withColumn("_add",
        when(col("_pmax").isNull, lit(ttlSeconds))
          .otherwise(greatest(lit(0L),
            col("_t") + lit(ttlSeconds) - greatest(col("_pmax"), col("_t")))))
      .groupBy(keyCol)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("_add")).as("covered_seconds"),
        (max(col("_t")) + lit(ttlSeconds) - min(col("_t"))).as("span_seconds"))
  }

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV drift statistic, integer-exact —
    * the nonparametric sibling of [[graft.ops.Governance.psiDrift]]:
    * PSI needs author-chosen bucket edges and reports a smoothed
    * divergence; KS is binless and its statistic here is an exact
    * rational, so the gate can't wobble in a float mantissa.
    *
    * `D = max_v |F_a(v) − F_b(v)|` over the MERGED distinct quantized
    * values (micro-units): per-side count tables, a full outer join on
    * the value, running cumulative counts, and the max of the
    * cross-multiplied difference `|cumA·n_b − cumB·n_a|` — all in
    * DECIMAL(38,0), division last. `ks_ppm = D_num·10⁶ div (n_a·n_b)`.
    *
    * Shape: two partial-agg count shuffles (corpus-sized input, value-
    * bounded output) + ONE unpartitioned window over the merged
    * DISTINCT-value table — bounded by value cardinality, not row
    * count. For a continuous measure at 100 TB, quantize coarser
    * first (the micro-unit floor is already a quantization; widen it)
    * or run the blocked two-pass prefix-sum (the ffillBlocked carry
    * recipe) — the statistic is unchanged for any quantization both
    * sides share.
    *
    * Returns ONE row: (n_a, n_b, n_values, ks_ppm). Empty side →
    * ks_ppm NULL (undefined, never a fake 0). */
  def ksDrift(
      a: DataFrame,
      b: DataFrame,
      valueCol: String = "value"): DataFrame = {
    val d = DecimalType(38, 0)
    def side(df: DataFrame, cn: String): DataFrame = df
      .where(col(valueCol).isNotNull)
      .select(floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .groupBy("_v").agg(count(lit(1)).as(cn))
    val merged = side(a, "_ca").join(side(b, "_cb"), Seq("_v"), "full_outer")
      .select(col("_v"),
        coalesce(col("_ca"), lit(0L)).as("_ca"),
        coalesce(col("_cb"), lit(0L)).as("_cb"))
    // distinct-micro-value-bounded ladder (winsorize doc contract)
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    merged
      .select(
        sum(col("_ca")).over(wCum).as("_cumA"),
        sum(col("_cb")).over(wCum).as("_cumB"),
        sum(col("_ca")).over(wAll).as("_na"),
        sum(col("_cb")).over(wAll).as("_nb"))
      .select(col("_na"), col("_nb"),
        abs(col("_cumA").cast(d) * col("_nb").cast(d) -
          col("_cumB").cast(d) * col("_na").cast(d)).as("_dn"))
      .groupBy(col("_na").as("n_a"), col("_nb").as("n_b"))
      .agg(count(lit(1)).as("n_values"), max(col("_dn")).as("_dmax"))
      .select(col("n_a"), col("n_b"), col("n_values"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast("long"))
          .otherwise(expr("CAST(_dmax * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
          .as("ks_ppm"))
  }

  /** PER-GROUP CONCENTRATION REPORT — Gini coefficient and
    * Herfindahl–Hirschman index of how a measure distributes over
    * contributors (is purchase revenue a long tail or three whales?),
    * both as exact integer ppm. The fairness/selection-bias screen a
    * curation pipeline runs next to the PSI/KS drift tripwires.
    *
    * Contributors are (group, contributor) SUMS of the micro-quantized
    * measure (floor before sum — exact on any engine; negative
    * contributor totals are rejected, Gini is undefined there). With
    * per-group sorted contributions x_1 ≤ … ≤ x_n (value then
    * contributor id — ties don't affect either statistic),
    * `gini_ppm = (2·Σ i·x_i − (n+1)·S)·10⁶ div (n·S)` and
    * `hhi_ppm = (Σ x_i²)·10⁶ div S²`, both in DECIMAL(38,0) with the
    * division last; S = 0 → NULL (undefined, never fake-0).
    *
    * Shape: one (group, contributor) partial agg, then one group-key
    * window + final agg sharing the same exchange. Parallelism =
    * #groups; a group's contributor list sorts within its partition —
    * for few massive groups swap the exact rank for a quantile sketch
    * like the winsorize scaladoc prescribes.
    *
    * Returns (groupCol, n_contributors, total_micro, gini_ppm,
    * hhi_ppm). */
  def concentration(
      ev: DataFrame,
      groupCol: String = "event_type",
      contributorCol: String = "user_id",
      valueCol: String = "value"): DataFrame = {
    val d = DecimalType(38, 0)
    val sums = ev.where(col(valueCol).isNotNull)
      .select(col(groupCol), col(contributorCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_x"))
      .groupBy(col(groupCol), col(contributorCol))
      .agg(sum(col("_x")).as("_x"))
      .withColumn("_x",
        when(col("_x") < 0L, raise_error(concat(
          lit("concentration: negative contributor total for group "),
          col(groupCol).cast("string")))).otherwise(col("_x")))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_x"), col(contributorCol))
    sums
      .select(col(groupCol), col("_x"),
        row_number().over(wRank).cast("long").as("_i"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_contributors"),
        sum(col("_x")).as("total_micro"),
        sum(col("_i").cast(d) * col("_x").cast(d)).as("_w"),
        sum(col("_x").cast(d) * col("_x").cast(d)).as("_q"))
      .select(col(groupCol), col("n_contributors"), col("total_micro"),
        when(col("total_micro") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "CAST((2 * _w - (n_contributors + 1) * CAST(total_micro AS DECIMAL(38,0))) * 1000000 " +
              "div (CAST(n_contributors AS DECIMAL(38,0)) * total_micro) AS BIGINT)"))
          .as("gini_ppm"),
        when(col("total_micro") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "CAST(_q * 1000000 div (CAST(total_micro AS DECIMAL(38,0)) * total_micro) AS BIGINT)"))
          .as("hhi_ppm"))
  }

  /** INTER-ARRIVAL GAP DECILES per event type — the traffic-shape
    * fingerprint (bursty bot traffic vs organic Poisson-ish arrivals
    * separate cleanly in the gap distribution's tails). Gaps are
    * consecutive-event differences in the (t, tie) total order;
    * deciles are exact tie-broken `ntile(10)` over (gap, tie) — the
    * [[conversionLatency]] recipe — with per-decile count/min/max in
    * integer seconds.
    *
    * One type-key exchange shared by the lag and the decile windows;
    * the decile aggregate is a second partial agg on the same key.
    * Types with a single event emit nothing (no gaps exist).
    *
    * Returns (typeCol, decile 1–10, n, min_gap, max_gap) ordered by
    * (typeCol, decile). */
  def interArrivalDeciles(
      ev: DataFrame,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val wSeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col(typeCol)).orderBy(col("_t"), col(tieCol))
    val gaps = ev.select(col(typeCol), col(tieCol), epochSec(tsCol).as("_t"))
      .withColumn("_gap", col("_t") - lag(col("_t"), 1).over(wSeq))
      .where(col("_gap").isNotNull)
    val wTile = org.apache.spark.sql.expressions.Window
      .partitionBy(col(typeCol)).orderBy(col("_gap"), col(tieCol))
    gaps
      .withColumn("decile", ntile(10).over(wTile).cast("long"))
      .groupBy(col(typeCol), col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("_gap")).as("min_gap"),
        max(col("_gap")).as("max_gap"))
      .orderBy(typeCol, "decile")
  }

  /** PEAK CONCURRENCY per event type: the maximum number of
    * simultaneously-open TTL sessions (each event holds a session open
    * `ttlSeconds`) and the earliest second it is reached — the
    * capacity-planning number ([[intervalCoverage]] integrates the
    * same intervals; this takes their max overlap).
    *
    * Classic sweep line: ±1 boundary deltas, running sum in
    * (time, delta) order — closes sort BEFORE opens at the same second
    * (half-open [t, t+ttl) intervals), making the peak well-defined
    * under ties; the max and its earliest time come from a second
    * window pass on the same key exchange. Parallelism = #types; for
    * one global key at 100 TB, the blocked two-pass prefix-sum
    * (ffillBlocked's carry recipe) replaces the single-key window.
    *
    * Returns (typeCol, peak_concurrent, at_t) ordered by typeCol. */
  def peakConcurrency(
      ev: DataFrame,
      ttlSeconds: Long = 300L,
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(ttlSeconds > 0, s"peakConcurrency: need ttlSeconds > 0, got $ttlSeconds")
    val pts = ev.select(col(typeCol), epochSec(tsCol).as("_t"))
    val deltas = pts.select(col(typeCol), col("_t"), lit(1L).as("_d"))
      .union(pts.select(col(typeCol), (col("_t") + ttlSeconds).as("_t"),
        lit(-1L).as("_d")))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col(typeCol)).orderBy(col("_t"), col("_d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    deltas
      .withColumn("_run", sum(col("_d")).over(wRun))
      .withColumn("_pk", max(col("_run")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(typeCol))))
      .groupBy(col(typeCol))
      .agg(max(col("_run")).as("peak_concurrent"),
        min(when(col("_run") === col("_pk"), col("_t"))).as("at_t"))
      .orderBy(typeCol)
  }

  /** DUPLICATE-TRANSACTION SCREEN: rows where the SAME key repeats the
    * SAME quantized value within `windowSeconds` of its previous
    * occurrence — the double-charge / double-fire detector (retry
    * storms and at-least-once pipelines both produce it). Exact, not
    * fuzzy: the partition key is (key, value_micro), so only true
    * value repeats are candidates and the stream never self-joins.
    *
    * One (key, value) exchange; lag over the (t, tie) total order
    * gives the previous occurrence; the flag is a map-side filter.
    *
    * Returns flagged rows (keyCol, tieCol, prev_+tieCol, v_micro,
    * gap_seconds ≤ windowSeconds) ordered by (keyCol, tieCol). */
  def duplicateTransactions(
      ev: DataFrame,
      windowSeconds: Long = 60L,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    require(windowSeconds > 0,
      s"duplicateTransactions: need windowSeconds > 0, got $windowSeconds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("_v")).orderBy(col("_t"), col(tieCol))
    ev.where(col(valueCol).isNotNull)
      .select(col(keyCol), col(tieCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"),
        epochSec(tsCol).as("_t"))
      .withColumn("_pt", lag(col("_t"), 1).over(w))
      .withColumn("_pid", lag(col(tieCol), 1).over(w))
      .where(col("_pt").isNotNull && col("_t") - col("_pt") <= windowSeconds)
      .select(col(keyCol), col(tieCol), col("_pid").as(s"prev_$tieCol"),
        col("_v").as("v_micro"), (col("_t") - col("_pt")).as("gap_seconds"))
      .orderBy(keyCol, tieCol)
  }

  /** USER SURVIVAL TABLE (retention curve): for each observed lifetime
    * day d, how many users stayed active AT LEAST d days and what
    * fraction of the cohort that is — the curve behind "day-7 / day-30
    * retention", integer-exact (no Kaplan-Meier float products: with
    * full observation windows the survival function IS the descending
    * cumulative of the lifetime histogram).
    *
    * Lifetime = floor-days between a user's first and last event
    * (single-event users: lifetime 0 — everyone appears in the d = 0
    * row, so surviving_ppm starts at 10⁶ by construction). One
    * user-key partial agg (corpus-scale work), a lifetime-day
    * histogram, and a DESCENDING cumulative window over the
    * |distinct lifetimes|-bounded table.
    *
    * Returns (lifetime_days, n_users_exact, n_surviving,
    * surviving_ppm) ordered by lifetime_days — `n_users_exact` died on
    * exactly that day, `n_surviving` lived ≥ it. */
  def survivalTable(
      ev: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val life = ev.select(col(keyCol), epochSec(tsCol).as("_t"))
      .groupBy(col(keyCol))
      .agg(floor((max(col("_t")) - min(col("_t"))).cast("double") / lit(86400.0d))
        .cast("long").as("lifetime_days"))
    val hist = life.groupBy("lifetime_days").agg(count(lit(1)).as("n_users_exact"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("lifetime_days").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    hist
      .withColumn("n_surviving", sum(col("n_users_exact")).over(wDesc))
      .withColumn("surviving_ppm",
        expr("n_surviving * 1000000 div sum(n_users_exact) OVER ()"))
      .select("lifetime_days", "n_users_exact", "n_surviving", "surviving_ppm")
      .orderBy("lifetime_days")
  }

  /** AUDIENCE OVERLAP MATRIX: Jaccard similarity of the user sets
    * behind every pair of event types — "how much of the clicker
    * audience also purchases", the segmentation planner's first
    * table. Integer ppm; |∪| = |A| + |B| − |A∩B|, so one distinct
    * projection feeds everything.
    *
    * Shape: distinct (type, user) once (the only corpus-sized
    * shuffle), type totals by partial agg, pair intersections via a
    * USER-keyed self-join (per-user cost C(#types, 2) — type
    * cardinality is author-sized, so this is linear in users).
    *
    * Returns (type_a, type_b, n_a, n_b, n_both, jaccard_ppm) with
    * type_a < type_b, ordered by (jaccard_ppm desc, type_a, type_b). */
  def audienceOverlap(
      ev: DataFrame,
      typeCol: String = "event_type",
      keyCol: String = "user_id"): DataFrame = {
    val tu = ev.select(col(typeCol).as("_ty"), col(keyCol).as("_u")).distinct()
    val totals = tu.groupBy("_ty").agg(count(lit(1)).as("_n"))
    val inter = tu.as("x")
      .join(tu.as("y"), col("x._u") === col("y._u") && col("x._ty") < col("y._ty"))
      .groupBy(col("x._ty").as("type_a"), col("y._ty").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    inter
      .join(totals.select(col("_ty").as("type_a"), col("_n").as("n_a")), Seq("type_a"))
      .join(totals.select(col("_ty").as("type_b"), col("_n").as("n_b")), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
        expr("n_both * 1000000 div (n_a + n_b - n_both)").as("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("type_a"), col("type_b"))
  }

  /** 2×2 CHI-SQUARE A/B TEST, integer-exact — the experimentation
    * readout (did variant B convert better, and is the difference
    * real?) with the statistic as an exact rational, never a float:
    * `χ² = N·(ad−bc)² / (n_a·n_b·(a+c)·(b+d))` over the contingency
    * table (a,b = variant A successes/failures; c,d = B's). Emitted in
    * micro-points by DECIMAL(38,0) integral division, so the oracle
    * replays it bit-for-bit; the `significant` flag compares against
    * the p<0.05 critical value 3.841459 (χ², 1 df). Degenerate margins
    * (all success or all failure) → NULL statistic, never a fake 0.
    *
    * Exactly two variants are REQUIRED — a third (or a lone) variant
    * raises rather than silently picking two. Variant A is the
    * lexicographically smaller label, pinned in the output.
    *
    * Shape: one partial-agg count pass on the variant key (2-row
    * result), a 1-row bounds cross join, a scalar fold — corpus-scale
    * work is the first scan only. DECIMAL(38,0) headroom: the cross
    * term (ad−bc)² caps at N⁴ — exact through N ≈ 10⁹ units; beyond
    * that, test on a fixed-ratio subsample (the statistic scales
    * linearly in N, the DECISION is made long before 10⁹).
    *
    * Returns ONE row: (variant_a, variant_b, n_a, x_a, n_b, x_b,
    * conv_a_ppm, conv_b_ppm, chi2_micro, significant). */
  def abTestChi2(
      units: DataFrame,
      variantCol: String = "variant",
      successCol: String = "success"): DataFrame = {
    val d = DecimalType(38, 0)
    val counts = units
      .select(col(variantCol).cast("string").as("_g"),
        col(successCol).cast("boolean").as("_s"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col("_s"), 1L).otherwise(0L)).as("_x"))
    val bounds = counts.agg(
      count(lit(1)).as("_k"), min(col("_g")).as("_ga"), max(col("_g")).as("_gb"))
    counts.crossJoin(bounds)
      .groupBy(col("_k"), col("_ga"), col("_gb"))
      .agg(
        max(when(col("_g") === col("_ga"), col("_n"))).as("n_a"),
        max(when(col("_g") === col("_ga"), col("_x"))).as("x_a"),
        max(when(col("_g") === col("_gb"), col("_n"))).as("n_b"),
        max(when(col("_g") === col("_gb"), col("_x"))).as("x_b"))
      // the guard is folded into an OUTPUT column — a free-standing
      // guard column would be pruned unevaluated by the optimizer
      .select(
        when(col("_k") =!= 2L, raise_error(concat(
          lit("abTestChi2: need exactly 2 variants, got "), col("_k"))))
          .otherwise(col("_ga")).as("variant_a"),
        col("_gb").as("variant_b"),
        col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        expr("x_a * 1000000 div n_a").as("conv_a_ppm"),
        expr("x_b * 1000000 div n_b").as("conv_b_ppm"),
        expr(
          "CASE WHEN (x_a + x_b) = 0 OR (n_a - x_a + n_b - x_b) = 0 THEN CAST(NULL AS BIGINT) " +
            "ELSE CAST((CAST(n_a AS DECIMAL(38,0)) + n_b) * " +
            "(CAST(x_a AS DECIMAL(38,0)) * (n_b - x_b) - CAST(x_b AS DECIMAL(38,0)) * (n_a - x_a)) * " +
            "(CAST(x_a AS DECIMAL(38,0)) * (n_b - x_b) - CAST(x_b AS DECIMAL(38,0)) * (n_a - x_a)) * 1000000 " +
            "div (CAST(n_a AS DECIMAL(38,0)) * n_b * (x_a + x_b) * (n_a - x_a + n_b - x_b)) AS BIGINT) END")
          .as("chi2_micro"))
      .withColumn("significant",
        when(col("chi2_micro").isNull, lit(null).cast("boolean"))
          .otherwise(col("chi2_micro") >= 3841459L))
  }

  /** GAP-BASED SESSIONIZATION, the standalone session table: a new
    * session opens after `gapSeconds` of per-user silence — the batch
    * twin of Structured Streaming's session_window, exposed as its own
    * op (the [[journeyMotifs]] / [[conversionLatency]] family computes
    * sessions internally; downstream consumers — funnel tools, ad
    * billing, engagement dashboards — want the session table itself).
    *
    * Everything rides ONE user-key exchange: the gap flag (lag), the
    * session cumsum and the per-session aggregate all share the
    * (user, t, tie) sort. Session ids are 1-based per user in time
    * order — deterministic under the tie-broken total order, and
    * stable across engines (no global sequence — a global id would
    * serialize the job at 100 TB; (user, session_id) is the natural
    * composite key).
    *
    * Returns (keyCol, session_id, n_events, start_t, end_t,
    * duration_seconds) in epoch seconds. */
  def sessionize(
      ev: DataFrame,
      gapSeconds: Long = 1800L,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    require(gapSeconds > 0, s"sessionize: need gapSeconds > 0, got $gapSeconds")
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_t"), col(tieCol))
    ev.select(col(keyCol), col(tieCol), epochSec(tsCol).as("_t"))
      .withColumn("_new",
        when(lag(col("_t"), 1).over(wu).isNull ||
          col("_t") - lag(col("_t"), 1).over(wu) > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new")).over(
        wu.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("_t")).as("start_t"),
        max(col("_t")).as("end_t"),
        (max(col("_t")) - min(col("_t"))).as("duration_seconds"))
  }

  /** LAG-FEATURE FRAME — the per-event ML feature row: value lags 1–2
    * and the trailing-3 mean over the user's own history (the feature-
    * store primitive behind churn/propensity models; every feature is
    * strictly BACKWARD-looking, so the frame is leakage-free by
    * construction — pair with [[horizonLabels]] for the target).
    * Integer micro: lags exact, the trailing mean is the re-signed
    * integral div of the exact 3-row sum. ONE user exchange carries
    * all three windows. Returns (tieCol, keyCol, v_micro, lag1_micro,
    * lag2_micro, trail3_mean_micro) — lags NULL before enough
    * history. */
  def lagFeatures(
      ev: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_s"), col(tieCol))
    val f3 = w.rowsBetween(-2, 0)
    ev.where(col(valueCol).isNotNull)
      .select(col(tieCol), col(keyCol), epochSec(tsCol).as("_s"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("v_micro"))
      .withColumn("lag1_micro", lag(col("v_micro"), 1).over(w))
      .withColumn("lag2_micro", lag(col("v_micro"), 2).over(w))
      .withColumn("_s3", sum(col("v_micro")).over(f3))
      .withColumn("_n3", count(lit(1)).over(f3))
      .selectExpr(tieCol, keyCol, "v_micro", "lag1_micro", "lag2_micro",
        "CAST(CASE WHEN _s3 >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(abs(_s3) div _n3 AS BIGINT) AS trail3_mean_micro")
  }

  /** HORIZON LABELS — supervised-target generation: for every event,
    * did the user produce a `targetType` event within `horizonSeconds`
    * AFTER it (strictly later second)? The label every propensity /
    * churn model trains on, generated leakage-consciously: the label
    * looks only FORWARD, features ([[lagFeatures]]) only backward, and
    * events in the last horizon of the observation window are flagged
    * `censored` (their negative label is not trustworthy — the
    * standard right-censoring caveat).
    *
    * Shape: target times per user are collected as a per-user REVERSE
    * running MIN over the same (sec, tie) exchange — "the next target
    * second at-or-after me", then shifted to strictly-after by
    * excluding same-second self matches via the declared
    * second-granularity rule (a target in the SAME second does not
    * label — events within one second don't order). No self-join.
    * Returns (tieCol, keyCol, sec, label, censored). */
  def horizonLabels(
      ev: DataFrame,
      targetType: String = "purchase",
      horizonSeconds: Long = 86400L,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(horizonSeconds > 0,
      s"horizonLabels: need horizonSeconds > 0, got $horizonSeconds")
    import org.apache.spark.sql.expressions.Window
    val base = ev.select(col(tieCol), col(keyCol), col(typeCol).as("_et"),
      epochSec(tsCol).as("sec"))
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col("sec"), col(tieCol))
      .rowsBetween(1, Window.unboundedFollowing)
    val hwm = base.agg(max(col("sec")).as("_hwm"))
    base
      .withColumn("_nextT",
        min(when(col("_et") === targetType, col("sec"))).over(fwd))
      .crossJoin(broadcast(hwm))
      .select(col(tieCol), col(keyCol), col("sec"),
        (col("_nextT").isNotNull && col("_nextT") > col("sec") &&
          col("_nextT") - col("sec") <= horizonSeconds).as("label"),
        (col("_hwm") - col("sec") < horizonSeconds).as("censored"))
  }

  /** MARKOV STATIONARY DISTRIBUTION — where the event-type chain
    * settles: power iteration π' = πP over the per-user transition
    * counts ([[markovNext]] reports the argmax edge; this gives the
    * long-run occupancy that answers "what share of a session is spent
    * where, asymptotically"). EXACT integer arithmetic: π carries ppm
    * mass, each step's term is `(π_i · c_ij) div r_i` (count-weighted
    * integral division, truncation declared — mass may leak a few ppm
    * per step, it never invents any), `iters` fixed and unrolled.
    * Types without outgoing transitions keep their mass (self-loop
    * convention, declared).
    *
    * Shape: ONE corpus pass builds the types²-bounded transition
    * matrix (lead over the user window); every iteration is a join of
    * two ≤ types² tables. Returns (event_type, n_out, pi0_ppm,
    * stationary_ppm) ordered by type. */
  def markovStationary(
      ev: DataFrame,
      iters: Int = 3,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    require(iters >= 1, s"markovStationary: need iters >= 1, got $iters")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_s"), col(tieCol))
    val trans = ev.select(col(keyCol), col(typeCol).as("_from"),
        epochSec(tsCol).as("_s"), col(tieCol))
      .withColumn("_to", lead(col("_from"), 1).over(w))
      .where(col("_to").isNotNull)
      .groupBy(col("_from"), col("_to")).agg(count(lit(1)).as("_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = trans.groupBy(col("_from")).agg(sum(col("_c")).as("_r"))
    val states = ev.select(col(typeCol).as("state")).distinct()
      .join(rows.select(col("_from").as("state"), col("_r")), Seq("state"), "left")
    val nStates = Window.partitionBy()
    // every round references its predecessor TWICE (the moved-mass join
    // and the kept-mass projection), so without persist registration
    // the logical plan doubled per round — 1410 formatted-plan lines at
    // iters = 3, each analysis/AQE pass replaying the whole tree
    // (round-18; the round-17 boundary rule: statically-bounded rounds
    // take LAZY persist, no eager action — rounds here are `iters` by
    // construction). The π tables are ≤ |event types| rows; the
    // harness reaps between queries.
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pi0 = states
      .withColumn("_k", count(lit(1)).over(nStates))
      .selectExpr("state", "_r", "CAST(1000000 div _k AS BIGINT) AS pi")
      .persist(lvl)
    val stepped = (1 to iters).foldLeft(pi0) { (pi, _) =>
      val moved = pi.where(col("_r").isNotNull)
        .join(trans, col("state") === col("_from"))
        .select(col("_to").as("state"),
          expr("CAST(pi * _c div _r AS BIGINT)").as("_m"))
        .groupBy(col("state")).agg(sum(col("_m")).as("_moved"))
      val kept = pi.select(col("state"), col("_r"),
        when(col("_r").isNull, col("pi")).otherwise(lit(0L)).as("_kept"))
      kept.join(moved, Seq("state"), "left")
        .select(col("state"), col("_r"),
          (col("_kept") + coalesce(col("_moved"), lit(0L))).as("pi"))
        .persist(lvl)
    }
    pi0.select(col("state").as(typeCol), coalesce(col("_r"), lit(0L)).as("n_out"),
        col("pi").as("pi0_ppm"))
      .join(stepped.select(col("state").as(typeCol), col("pi").as("stationary_ppm")),
        Seq(typeCol))
      .orderBy(typeCol)
  }

  /** SPLIT-CONFORMAL INTERVAL per key — the distribution-free
    * prediction interval (Vovk; the modern uncertainty wrapper): with
    * the group mean as the point predictor, the interval is
    * mean ± q, where q is the ⌈(n+1)(1−α)⌉-th smallest absolute
    * residual — guaranteed ≥ 1−α coverage for a fresh draw with NO
    * distributional assumption (what a z-interval can't promise).
    * INTEGER-exact end to end: the mean is the declared floored micro
    * integer, residuals are integer distances from it, and the rank
    * cut is the [[slaPercentiles]] ladder — the CEILING rank
    * `least(n, ⌈(n+1)·(100−alphaPct)/100⌉)` =
    * `least(n, ((n+1)·(100−alphaPct) + 99) div 100)` (the floor rank
    * is one order statistic too low whenever 100 ∤ (n+1)(100−α) and
    * breaks the coverage guarantee — e.g. n=10, α=10%: rank 10, not 9).
    *
    * Shape: per-key mean fold broadcast back, one key-rank ladder, a
    * conditional-min fold — two passes, one key exchange each.
    * Returns (keyCol, n, mean_micro, q_micro, lo_micro, hi_micro). */
  def conformalInterval(
      ev: DataFrame,
      alphaPct: Int = 10,
      keyCol: String = "event_type",
      valueCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 50,
      s"conformalInterval: need alphaPct in [1, 50], got $alphaPct")
    import org.apache.spark.sql.expressions.Window
    val base = ev.where(col(valueCol).isNotNull)
      .select(col(keyCol), col(tieCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
    val means = base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_v").cast(DecimalType(38, 0))).as("_s"))
      .selectExpr(keyCol, "n",
        "CAST(CASE WHEN _s >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(abs(_s) div CAST(n AS DECIMAL(38,0)) AS BIGINT) AS mean_micro")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_r"), col(tieCol))
    base.join(means, Seq(keyCol))
      .withColumn("_r", abs(col("_v") - col("mean_micro")))
      .withColumn("_rn", row_number().over(w).cast("long"))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"), max(col("mean_micro")).as("mean_micro"),
        min(when(col("_rn") ===
          expr(s"least(n, ((n + 1) * ${100 - alphaPct} + 99) div 100)"), col("_r")))
          .as("q_micro"))
      .selectExpr(keyCol, "n", "mean_micro", "q_micro",
        "mean_micro - q_micro AS lo_micro", "mean_micro + q_micro AS hi_micro")
  }

  /** TIME IN STATE — per user, the share of their observed span spent
    * in each event type, under hold-until-next semantics (the
    * [[twap]] weighting aggregated the other way): each event's type
    * "holds" until the user's next event; the last event holds
    * nothing. The session-replay / UX question "where does the time
    * actually go", integer ppm per (user, type).
    *
    * One user-key exchange (lead window + fold). Returns (keyCol,
    * typeCol, n_events, held_sec, share_ppm) — share of the user's
    * total held time, NULL for a span-less user (single event). */
  def timeInState(
      ev: DataFrame,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_s"), col(tieCol))
    ev.select(col(keyCol), col(typeCol), col(tieCol), epochSec(tsCol).as("_s"))
      .withColumn("_h", coalesce(lead(col("_s"), 1).over(w) - col("_s"), lit(0L)))
      .groupBy(col(keyCol), col(typeCol))
      .agg(count(lit(1)).as("n_events"), sum(col("_h")).as("held_sec"))
      .withColumn("share_ppm", expr(
        "CASE WHEN sum(held_sec) OVER (PARTITION BY " + keyCol + ") = 0 " +
          "THEN CAST(NULL AS BIGINT) ELSE CAST(held_sec * 1000000 div " +
          "sum(held_sec) OVER (PARTITION BY " + keyCol + ") AS BIGINT) END"))
  }

  /** COHORT LTV CURVES — cumulative value per signup cohort by age:
    * the subscription-business chart ([[cohortMatrix]] counts heads;
    * this sums money). Cohort = the user's FIRST week (first-seen
    * decomposition — no scan of "signup" events needed, so it works on
    * any event log); age = event week − cohort week; the curve is the
    * running sum over age within cohort. Integer micro throughout.
    *
    * Shape: min-week per user (one partial agg) joined back ON THE
    * USER KEY (broadcast at gate scale, hash at 100 TB), a
    * (cohort, age) partial agg, and a running sum over the
    * weeks²-bounded matrix. Returns (cohort_week, age_week,
    * n_cohort_users, week_value_micro, cum_value_micro) ordered by
    * (cohort, age). */
  def cohortLtv(
      ev: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val week = floor(epochSec(tsCol).cast("double") / lit(604800.0d)).cast("long")
    val base = ev.where(col(valueCol).isNotNull)
      .select(col(keyCol), week.as("_w"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
    val cohorts = base.groupBy(col(keyCol))
      .agg(min(col("_w")).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort_users"))
    val cells = base.join(cohorts, Seq(keyCol))
      .groupBy(col("cohort_week"), (col("_w") - col("cohort_week")).as("age_week"))
      .agg(sum(col("_v")).as("week_value_micro"))
    cells.join(sizes, Seq("cohort_week"))
      .withColumn("cum_value_micro",
        sum(col("week_value_micro")).over(
          Window.partitionBy(col("cohort_week")).orderBy(col("age_week"))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("cohort_week"), col("age_week"), col("n_cohort_users"),
        col("week_value_micro"), col("cum_value_micro"))
      .orderBy("cohort_week", "age_week")
  }

  /** COHEN'S d + required sample size — the effect-size / power-
    * planning pair every experiment review wants next to the p-value:
    * d = (x̄_A − x̄_B)/s_pooled, and the per-group n for a two-sample
    * test at α = 0.05, power = 0.8 under the normal approximation,
    * n = 2·(z_{α/2}+z_β)²·s²/δ² = 2·(1.959964+0.841621)²·s²/δ² (the
    * standard planning formula; z literals pinned on both engines).
    *
    * Exact DECIMAL moments ([[ratioMetricCI]] recipe); floats only in
    * the d / n tail with fixed operand order, d round-6, n as
    * ceil(float) BIGINT — ceil of the same double on both engines.
    * Returns ONE row (n_a, n_b, mean_a_micro, mean_b_micro, cohens_d,
    * n_per_group); NULLs when a side is < 2 rows or pooled variance
    * is 0. */
  def effectSize(
      ev: DataFrame,
      typeA: String = "view",
      typeB: String = "purchase",
      valueCol: String = "value",
      typeCol: String = "event_type"): DataFrame = {
    val d = DecimalType(38, 0)
    val base = ev
      .where(col(typeCol).isin(typeA, typeB) && col(valueCol).isNotNull)
      .select((col(typeCol) === typeA).as("_a"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
    base.agg(
        sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"),
        coalesce(sum(when(col("_a"), col("_v")).otherwise(lit(0L)).cast(d)),
          lit(0).cast(d)).as("_sa"),
        coalesce(sum(when(!col("_a"), col("_v")).otherwise(lit(0L)).cast(d)),
          lit(0).cast(d)).as("_sb"),
        coalesce(sum(when(col("_a"), col("_v").cast(d) * col("_v").cast(d))
          .otherwise(lit(0).cast(d))), lit(0).cast(d)).as("_ssa"),
        coalesce(sum(when(!col("_a"), col("_v").cast(d) * col("_v").cast(d))
          .otherwise(lit(0).cast(d))), lit(0).cast(d)).as("_ssb"))
      .selectExpr("n_a", "n_b",
        "CASE WHEN n_a = 0 THEN CAST(NULL AS BIGINT) ELSE " +
          "CAST(CASE WHEN _sa >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(abs(_sa) div CAST(n_a AS DECIMAL(38,0)) AS BIGINT) END AS mean_a_micro",
        "CASE WHEN n_b = 0 THEN CAST(NULL AS BIGINT) ELSE " +
          "CAST(CASE WHEN _sb >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(abs(_sb) div CAST(n_b AS DECIMAL(38,0)) AS BIGINT) END AS mean_b_micro",
        // pooled variance from the exact sum-of-squared-deviation
        // numerators: SSD = Σv² − (Σv)²/n, folded as (n·Σv² − (Σv)²)/n
        "CASE WHEN n_a < 2 OR n_b < 2 THEN CAST(NULL AS DOUBLE) ELSE " +
          "(CAST(n_a * _ssa - _sa * _sa AS DOUBLE) / n_a " +
          "+ CAST(n_b * _ssb - _sb * _sb AS DOUBLE) / n_b) / (n_a + n_b - 2) END AS _s2",
        "CAST(_sa AS DOUBLE) AS _fsa", "CAST(_sb AS DOUBLE) AS _fsb",
        "n_a AS _na", "n_b AS _nb")
      .selectExpr("_na AS n_a", "_nb AS n_b", "mean_a_micro", "mean_b_micro",
        "CASE WHEN _s2 IS NULL OR _s2 = 0.0 THEN CAST(NULL AS DOUBLE) ELSE " +
          "round((_fsa / _na - _fsb / _nb) / sqrt(_s2), 6) + 0.0 END AS cohens_d",
        "CASE WHEN _s2 IS NULL OR _s2 = 0.0 OR _fsa / _na = _fsb / _nb " +
          "THEN CAST(NULL AS BIGINT) ELSE " +
          "CAST(ceil(2.0 * (1.959964 + 0.841621) * (1.959964 + 0.841621) * _s2 / " +
          "((_fsa / _na - _fsb / _nb) * (_fsa / _na - _fsb / _nb))) AS BIGINT) END AS n_per_group")
  }

  /** SPC c-CHART — the statistical-process-control count chart over
    * hourly event counts: center line c̄, upper/lower control limits
    * c̄ ± 3√c̄, and the out-of-control flag per hour. The FLAG is
    * integer-exact (no float boundary): c > UCL ⇔ (c·n − S)² > 9·n·S
    * AND c·n > S (cross-multiplied, S = Σc over n hours); the limits
    * themselves are display floats (round-6). The first alarm every
    * on-call runbook plots.
    *
    * One hour-count partial agg + a 1-row fold broadcast back; the
    * chart is |hours|-bounded. Returns (hour, n, ucl, lcl,
    * out_of_control) ordered by hour. */
  def cChart(
      ev: DataFrame,
      tsCol: String = "ts"): DataFrame = {
    val hour = floor(epochSec(tsCol).cast("double") / lit(3600.0d)).cast("long")
    val counts = ev.groupBy(hour.as("hour")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(count(lit(1)).as("_nh"), sum(col("n")).as("_s"))
    counts.crossJoin(broadcast(tot))
      .selectExpr("hour", "n",
        "round(CAST(_s AS DOUBLE) / _nh + 3.0 * sqrt(CAST(_s AS DOUBLE) / _nh), 6) + 0.0 AS ucl",
        "round(greatest(CAST(_s AS DOUBLE) / _nh - 3.0 * sqrt(CAST(_s AS DOUBLE) / _nh), 0.0), 6) + 0.0 AS lcl",
        // integer-exact: |c·n − S| > 3·sqrt(n·S) ⇔ (c·n − S)² > 9·n·S
        "(CAST(n AS DECIMAL(38,0)) * _nh - _s) * (CAST(n AS DECIMAL(38,0)) * _nh - _s) " +
          "> CAST(9 AS DECIMAL(38,0)) * _nh * _s AS out_of_control")
      .orderBy("hour")
  }

  /** MAX DRAWDOWN per key — the largest peak-to-trough fall of the
    * cumulative value series (the risk number every portfolio/quota/
    * budget tracker reports): with C_t the running sum over the
    * (sec, tie) total order and P_t its running max, drawdown =
    * max_t (P_t − C_t). Integer micro-units end to end; ONE key
    * exchange carries the cumulative window, the running-max window,
    * and the final fold. Returns (keyCol, n_events, final_micro,
    * peak_micro, max_drawdown_micro). */
  def maxDrawdown(
      ev: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_s"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.where(col(valueCol).isNotNull)
      .select(col(keyCol), col(tieCol), epochSec(tsCol).as("_s"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .withColumn("_cum", sum(col("_v")).over(w))
      .withColumn("_peak", max(col("_cum")).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        // the final cumulative IS the plain sum — no order-dependent
        // last() anywhere
        sum(col("_v")).as("final_micro"),
        max(col("_cum")).as("peak_micro"),
        max(col("_peak") - col("_cum")).as("max_drawdown_micro"))
      .select(col(keyCol), col("n_events"), col("final_micro"),
        col("peak_micro"), col("max_drawdown_micro"))
  }

  /** CUPED — the industry-standard experiment variance reduction
    * (Deng et al. 2013): adjust the experiment-period metric Y by the
    * PRE-period covariate X, `Y_adj = Y − θ(X − X̄)` with
    * θ = cov(X,Y)/var(X); the achievable variance reduction is exactly
    * ρ²(X,Y). Reported as ONE row: per-user X/Y from the midpoint
    * split (the [[heavyChangers]] convention; a user absent from a
    * half contributes 0 — declared), exact DECIMAL(38,0) moments, and
    * the [[graft.ops.Stats.correlationMatrix]] float policy for the
    * tails: θ and ρ round-6 in fixed operand order, the reduction ppm
    * as `floor(ρ_rounded² · 10⁶)` — a deterministic function of the
    * already-rounded ρ on any engine.
    *
    * Shape: one per-user aggregate (conditional sums over the
    * broadcast midpoint), one 1-row moment fold. Returns (n_users,
    * theta, rho, var_reduction_ppm); NULLs when either variance is 0
    * or n < 2. */
  def cuped(
      ev: DataFrame,
      keyCol: String = "user_id",
      valueCol: String = "value",
      tsCol: String = "ts"): DataFrame = {
    val d = DecimalType(38, 0)
    val base = ev.where(col(valueCol).isNotNull)
      .select(col(keyCol), epochSec(tsCol).as("_s"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
    val mid = base.agg(
      floor((min(col("_s")) + max(col("_s"))).cast("double") / lit(2.0d))
        .cast("long").as("_mid"))
    val perUser = base.crossJoin(broadcast(mid))
      .groupBy(col(keyCol))
      .agg(sum(when(col("_s") <= col("_mid"), col("_v")).otherwise(lit(0L))).as("_x"),
        sum(when(col("_s") > col("_mid"), col("_v")).otherwise(lit(0L))).as("_y"))
    perUser.agg(
        count(lit(1)).as("n_users"),
        sum(col("_x").cast(d)).as("_sx"), sum(col("_y").cast(d)).as("_sy"),
        sum(col("_x").cast(d) * col("_x").cast(d)).as("_sxx"),
        sum(col("_y").cast(d) * col("_y").cast(d)).as("_syy"),
        sum(col("_x").cast(d) * col("_y").cast(d)).as("_sxy"))
      .selectExpr("n_users",
        "CAST(n_users AS DECIMAL(38,0)) * _sxx - _sx * _sx AS _vx",
        "CAST(n_users AS DECIMAL(38,0)) * _syy - _sy * _sy AS _vy",
        "CAST(n_users AS DECIMAL(38,0)) * _sxy - _sx * _sy AS _cov")
      .selectExpr("n_users",
        "CASE WHEN n_users < 2 OR _vx = 0 THEN CAST(NULL AS DOUBLE) " +
          "ELSE round(CAST(_cov AS DOUBLE) / CAST(_vx AS DOUBLE), 6) + 0.0 END AS theta",
        "CASE WHEN n_users < 2 OR _vx = 0 OR _vy = 0 THEN CAST(NULL AS DOUBLE) " +
          "ELSE round(CAST(_cov AS DOUBLE) / sqrt(CAST(_vx AS DOUBLE) * CAST(_vy AS DOUBLE)), 6) + 0.0 END AS rho")
      .selectExpr("n_users", "theta", "rho",
        "CASE WHEN rho IS NULL THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(floor(rho * rho * 1000000.0) AS BIGINT) END AS var_reduction_ppm")
  }

  /** SEASONAL CELL OUTLIERS — which (hour-of-week, week) cells deviate
    * most from their slot's own average: per cell the seasonality
    * index `obs · n_weeks · 10⁶ div slot_total` ([[seasonalProfile]]'s
    * index at cell granularity), top-k by |index − 10⁶| — the
    * "Tuesday 3 pm was 4× normal, which Tuesday?" question. Exact
    * integers; total ordering (deviation desc, hour_of_week, week).
    *
    * Shape: one (slot, week) partial-agg count, slot totals off the
    * slot-bounded table, TakeOrdered top-k. Returns topK rows of
    * (hour_of_week, week, n, slot_weeks, index_ppm, dev_ppm). */
  def seasonalOutliers(
      ev: DataFrame,
      topK: Int = 20,
      tsCol: String = "ts"): DataFrame = {
    require(topK >= 1, s"seasonalOutliers: need topK >= 1, got $topK")
    val sec = epochSec(tsCol)
    val hourAbs = floor(sec.cast("double") / lit(3600.0d)).cast("long")
    val cells = ev
      .select(pmod(hourAbs, lit(168L)).as("hour_of_week"),
        floor(hourAbs.cast("double") / lit(168.0d)).cast("long").as("week"))
      .groupBy(col("hour_of_week"), col("week"))
      .agg(count(lit(1)).as("n"))
    val slots = cells.groupBy(col("hour_of_week"))
      .agg(sum(col("n")).as("_tot"), count(lit(1)).as("slot_weeks"))
    cells.join(slots, Seq("hour_of_week"))
      .selectExpr("hour_of_week", "week", "n", "slot_weeks",
        "CAST(n * slot_weeks * 1000000 div _tot AS BIGINT) AS index_ppm")
      .withColumn("dev_ppm", abs(col("index_ppm") - lit(1000000L)))
      .orderBy(col("dev_ppm").desc, col("hour_of_week"), col("week"))
      .limit(topK)
  }

  /** SESSION KPIs — the product-analytics headline numbers off the
    * [[sessionize]] table, folded to ONE row: session count, bounce
    * rate (single-event sessions — the metric every landing-page
    * review opens with), events per session, and mean session duration
    * — integer ppm/micro by integral division over exact sums. The
    * gap-session table is corpus-sized; this fold is its partial-agg'd
    * summary, so the whole op remains the sessionize exchange plus a
    * scalar aggregate.
    *
    * Returns (n_sessions, n_bounces, bounce_ppm, events_per_session
    * _micro, mean_duration_sec_micro). */
  def sessionKpis(
      ev: DataFrame,
      gapSeconds: Long = 1800L,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val d = DecimalType(38, 0)
    sessionize(ev, gapSeconds, keyCol, tsCol, tieCol)
      .agg(count(lit(1)).as("n_sessions"),
        coalesce(sum(when(col("n_events") === 1, 1L).otherwise(0L)), lit(0L))
          .as("n_bounces"),
        sum(col("n_events").cast(d)).as("_ne"),
        sum(col("duration_seconds").cast(d)).as("_dur"))
      .selectExpr("n_sessions", "n_bounces",
        "CASE WHEN n_sessions = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(n_bounces * 1000000 div n_sessions AS BIGINT) END AS bounce_ppm",
        "CASE WHEN n_sessions = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(_ne * 1000000 div CAST(n_sessions AS DECIMAL(38,0)) AS BIGINT) END AS events_per_session_micro",
        "CASE WHEN n_sessions = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(_dur * 1000000 div CAST(n_sessions AS DECIMAL(38,0)) AS BIGINT) END AS mean_duration_sec_micro")
  }

  /** SLO BURN — the SRE error-budget ledger by hour: per-hour error
    * share beside the CUMULATIVE error rate and the remaining budget
    * against a declared objective (`sloPpm`, e.g. 10000 = 99% success
    * SLO). `budget_remaining_ppm = sloPpm − cum_err·10⁶ div cum_total`
    * goes negative exactly when the objective is burned — the page
    * threshold IS a sign bit, no dashboard math. Integer-exact; the
    * subtraction is of two non-negative integral divs, so both engines
    * agree at every hour including the burn crossing.
    *
    * Shape: one (hour) partial-agg count pair, then running sums over
    * the |hours|-bounded series. Returns (hour, n_total, n_errors,
    * err_ppm, cum_err_ppm, budget_remaining_ppm) ordered by hour. */
  def sloBurn(
      ev: DataFrame,
      sloPpm: Long = 10000L,
      errorType: String = "error",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(sloPpm >= 0 && sloPpm <= 1000000L,
      s"sloBurn: sloPpm must be in [0, 1e6], got $sloPpm")
    import org.apache.spark.sql.expressions.Window
    val hour = floor(epochSec(tsCol).cast("double") / lit(3600.0d)).cast("long")
    // hour-bounded ladder (observation window div 3600, never corpus)
    val run = Window.orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.groupBy(hour.as("hour"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col(typeCol) === errorType, 1L).otherwise(0L)).as("n_errors"))
      .withColumn("_ct", sum(col("n_total")).over(run))
      .withColumn("_ce", sum(col("n_errors")).over(run))
      .selectExpr("hour", "n_total", "n_errors",
        "CAST(n_errors * 1000000 div n_total AS BIGINT) AS err_ppm",
        "CAST(_ce * 1000000 div _ct AS BIGINT) AS cum_err_ppm",
        s"$sloPpm - CAST(_ce * 1000000 div _ct AS BIGINT) AS budget_remaining_ppm")
      .orderBy("hour")
  }

  /** ORDERED FUNNEL: how many users completed step 1, then step 2
    * STRICTLY LATER, then step 3 strictly later than that, … — the
    * product-analytics conversion table ([[conversionLatency]] measures
    * the time between two fixed steps; this counts survivors through an
    * arbitrary ordered chain).
    *
    * Step semantics: a user's step-i time is the EARLIEST epoch second
    * of a `steps(i)`-typed event strictly after their step-(i−1) time
    * (second granularity — two events inside the same second don't
    * order, matching the timestamp's actual resolution; no tie-break
    * column is consulted, so the step times are pure MINs and exactly
    * reproducible on any engine).
    *
    * Shape: one filtered per-user MIN aggregate per step, each joining
    * the previous step's (user, time) table — all k aggregates and
    * joins key on the user column, so the single user-key exchange is
    * reused end to end and every join side after step 1 is
    * #users-bounded, not corpus-bounded. k is pipeline-author-sized
    * (3–6), so the k-pass loop is a static plan, not a driver loop over
    * data. At 100 TB the cost is the first filtered scan; AQE turns the
    * later #users-sized joins into broadcasts.
    *
    * `maxGapSeconds` (None = unbounded) additionally requires each
    * step to land within that many seconds of the PREVIOUS step's
    * time — the "click within an hour of the view" marketing contract.
    * The bound composes with the same MIN semantics: the earliest
    * in-window event is the step time.
    *
    * Returns one row per step, in step order: (step (1-based),
    * event_type, n_users, conv_ppm) where conv_ppm is
    * `n_users·10⁶ div step-1's n_users` (integer; 10⁶ for step 1). */
  def funnelSteps(
      ev: DataFrame,
      steps: Seq[String],
      keyCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: need at least one step")
    require(maxGapSeconds.forall(_ > 0),
      s"funnelSteps: maxGapSeconds must be positive, got $maxGapSeconds")
    val base = ev.select(col(keyCol).as("_u"), col(typeCol).as("_et"),
      epochSec(tsCol).as("_t"))
    // reached(i): (user, step-i time) — the survivors after step i
    val reached = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (st, _)) =>
        val mine = base.where(col("_et") === lit(st))
        val gated = prev match {
          case None => mine
          case Some(p) =>
            val joined = mine.join(p.select(col("_u"), col("_mt").as("_pt")), Seq("_u"))
              .where(col("_t") > col("_pt"))
            maxGapSeconds.fold(joined)(g => joined.where(col("_t") <= col("_pt") + g))
        }
        Some(gated.groupBy(col("_u")).agg(min(col("_t")).as("_mt")))
    }.flatten
    val counts = reached.zip(steps).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(st).as("event_type"), col("n_users"))
    }.reduce(_.union(_))
    val first = counts.where(col("step") === 1L)
      .select(col("n_users").as("_n1"))
    counts.crossJoin(first)
      .select(col("step"), col("event_type"), col("n_users"),
        when(col("_n1") === 0L, lit(0L))
          .otherwise(expr("n_users * 1000000 div _n1")).as("conv_ppm"))
      .orderBy("step")
  }

  /** LAST-TOUCH ATTRIBUTION: credit each conversion event to the most
    * recent PRECEDING touch event of the same user — the marketing
    * counterpart of [[funnelSteps]] (the funnel counts survivors; this
    * answers "which touch type gets the credit per conversion").
    *
    * The carried touch is the running LAST non-null touch tag over the
    * user's stream in total (epoch-second, tieCol) order — Spark's
    * `last(_, ignoreNulls)` over a rows-unbounded-preceding frame ≡
    * DuckDB's `last_value(_ IGNORE NULLS)`, both O(1) per row. A
    * conversion row's own tag is NULL (a conversion is not a touch), so
    * the frame including the current row is safe, and a conversion with
    * no preceding touch credits `"direct"`. Everything rides one
    * user-key shuffle + a |touch types|-bounded partial agg; shares are
    * integer ppm of total conversions.
    *
    * `firstTouch = true` credits the EARLIEST preceding touch instead
    * (Spark `first(_, ignoreNulls)` ≡ DuckDB `first_value IGNORE
    * NULLS` over the same frame) — the acquisition-channel view of the
    * same stream; everything else, including the 'direct' fallback,
    * is unchanged.
    *
    * Returns (touch_type, n_conversions, share_ppm) ordered by
    * (n_conversions desc, touch_type). */
  def lastTouchAttribution(
      ev: DataFrame,
      convType: String = "purchase",
      touchTypes: Seq[String] = Seq("view", "click"),
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      typeCol: String = "event_type",
      firstTouch: Boolean = false): DataFrame = {
    require(touchTypes.nonEmpty, "lastTouchAttribution: need touch types")
    require(!touchTypes.contains(convType),
      s"lastTouchAttribution: conversion '$convType' cannot also be a touch")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_t"), col(tieCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tagged = ev.select(col(keyCol), col(tieCol), col(typeCol).as("_et"),
        epochSec(tsCol).as("_t"))
      .where(col("_et").isin(convType +: touchTypes: _*))
      .withColumn("_touch",
        when(col("_et").isin(touchTypes: _*), col("_et")))
    val carried =
      if (firstTouch) first(col("_touch"), ignoreNulls = true).over(w)
      else last(col("_touch"), ignoreNulls = true).over(w)
    val credited = tagged
      .withColumn("_last", carried)
      .where(col("_et") === lit(convType))
      .select(coalesce(col("_last"), lit("direct")).as("touch_type"))
    credited.groupBy("touch_type")
      .agg(count(lit(1)).as("n_conversions"))
      .withColumn("share_ppm", expr(
        "n_conversions * 1000000 div sum(n_conversions) OVER ()"))
      .orderBy(col("n_conversions").desc, col("touch_type"))
  }

  /** POSITION-BASED (U-shaped) multi-touch attribution — the 40/20/40
    * model that completes the attribution family ([[lastTouchAttribution]]
    * covers first/last): per conversion journey (a user's touches since
    * their previous conversion), the FIRST touch gets 40% credit, the
    * LAST 40%, and the middles split the remaining 20% evenly. Exact
    * integer ppm with a declared remainder rule — each journey's credits
    * sum to EXACTLY 1,000,000: 1-touch journeys take it all, 2-touch
    * split 500k/500k, and with n ≥ 3 middles the indivisible remainder
    * of `200000 div (n−2)` goes to the EARLIEST middle. Conversions
    * with no preceding touch credit the "direct" bucket.
    *
    * Shape: journey ids are a running conversion count over the per-user
    * (sec, tie) window; the per-journey position/size windows partition
    * by (user, journey) — hash distribution by user already CLUSTERS
    * (user, journey), so Spark inserts only a sort, never a second
    * exchange. Credits fold per touch type (bounded). At 100 TB
    * parallelism = #users; no journey array is ever materialized.
    *
    * Returns (touch_type, n_touches, credit_ppm) ordered by credit
    * desc — Σ credit_ppm = 1,000,000 × #conversions. */
  def positionAttribution(
      ev: DataFrame,
      convType: String = "purchase",
      touchTypes: Seq[String] = Seq("view", "click"),
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(touchTypes.nonEmpty, "positionAttribution: need touch types")
    require(!touchTypes.contains(convType),
      s"positionAttribution: conversion '$convType' cannot also be a touch")
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(keyCol)).orderBy(col("_t"), col(tieCol))
    val tagged = ev.select(col(keyCol), col(tieCol), col(typeCol).as("_et"),
        epochSec(tsCol).as("_t"))
      .where(col("_et").isin(convType +: touchTypes: _*))
      // journey j = number of conversions STRICTLY before this row, so
      // a conversion row closes its own journey
      .withColumn("_j", coalesce(
        sum(when(col("_et") === convType, 1L).otherwise(0L))
          .over(byUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val convs = tagged.where(col("_et") === convType)
      .select(col(keyCol), col("_j"))
    val touches = tagged.where(col("_et") =!= convType)
    val journeyW = Window.partitionBy(col(keyCol), col("_j"))
    val credited = touches
      .join(convs, Seq(keyCol, "_j"), "left_semi")
      .withColumn("_rn", row_number().over(journeyW.orderBy(col("_t"), col(tieCol))))
      .withColumn("_n", count(lit(1)).over(journeyW))
      .withColumn("credit_ppm",
        when(col("_n") === 1, lit(1000000L))
          .when(col("_n") === 2, lit(500000L))
          .when(col("_rn") === 1 || col("_rn") === col("_n"), lit(400000L))
          // earliest middle absorbs the indivisible remainder
          .when(col("_rn") === 2, expr(
            "200000L div (_n - 2) + 200000L - (_n - 2) * (200000L div (_n - 2))"))
          .otherwise(expr("200000L div (_n - 2)")))
      .select(col("_et").as("touch_type"), col("credit_ppm"))
    val direct = convs
      .join(touches.select(col(keyCol), col("_j")).distinct(),
        Seq(keyCol, "_j"), "left_anti")
      .select(lit("direct").as("touch_type"), lit(1000000L).as("credit_ppm"))
    credited.unionByName(direct)
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_touches"), sum("credit_ppm").as("credit_ppm"))
      .orderBy(col("credit_ppm").desc, col("touch_type"))
  }

  /** WEIGHTED MEDIAN per key — the smallest value whose cumulative
    * weight reaches half the key's total (the lower weighted median,
    * `2·cum ≥ total` so no division ever happens): the right center
    * when observations carry importance — spend-weighted latency,
    * volume-weighted price — where the plain median lets a thousand
    * tiny rows outvote one heavy one. Integer-exact: values in BIGINT
    * micro-units, weights as BIGINTs, the qualifying row picked by
    * `min(struct(v))` over the filtered stream.
    *
    * Shape: ONE hash exchange on the key — the running-weight window,
    * the total-weight window, and the final min/count fold all reuse
    * it. Zero- or negative-weight rows are dropped up front (declared:
    * weights must be positive to vote). At 100 TB parallelism = #keys.
    *
    * Returns (keyCol, n, total_w, wmedian_micro). */
  def weightedMedian(
      ev: DataFrame,
      keyCol: String = "event_type",
      valueCol: String = "value",
      weightCol: String = "weight",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy(col(keyCol)).orderBy(col("_v"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy(col(keyCol))
    ev.select(col(keyCol), col(tieCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"),
        col(weightCol).cast("long").as("_w"))
      .where(col("_v").isNotNull && col("_w") > 0)
      .withColumn("_cum", sum(col("_w")).over(run))
      .withColumn("_tot", sum(col("_w")).over(whole))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), max(col("_tot")).as("total_w"),
        min(when(col("_cum") * 2 >= col("_tot"), col("_v"))).as("wmedian_micro"))
  }

  /** WOE / IV — weight-of-evidence and information value per feature
    * bucket, the credit-scoring/risk staple for "how predictive is
    * this feature of the binary target": bucket the feature into value
    * deciles, then per bucket WOE = ln(pos_share / neg_share) and the
    * IV term (pos_share − neg_share)·WOE; Σ IV ≳ 0.3 reads "strong
    * predictor". Zero cells are handled with half-count smoothing (the
    * [[graft.ops.Governance.psiDrift]] convention): shares use
    * (2·n + 1)/(2·N + k) so WOE is always finite.
    *
    * Exactness: bucket ranks, cell counts, and the smoothing rationals
    * are all integers; float enters ONLY as one ln over the integer
    * cross-ratio and the share subtraction, in a fixed operand order,
    * round-6 (+0.0). The IV total is the window sum of the ROUNDED
    * terms — deterministic on both engines.
    *
    * Shape: one rank ladder over (value, tie), then everything is
    * k-bucket-bounded. The ntile is a GLOBAL total order — Spark runs
    * it single-partition over the slim (value, tie, pos) projection;
    * at extreme scale swap it for pre-computed quantile cut points
    * ([[slaPercentiles]]) + a map-only bucket assignment — the
    * [[graft.ops.CorpusOps.curriculumOrder]] caveat, same remedy.
    * Returns (bucket 1..k, n, n_pos, n_neg, woe, iv_term, iv_total)
    * ordered by bucket. */
  def woeIv(
      ev: DataFrame,
      posType: String = "purchase",
      nBuckets: Int = 10,
      valueCol: String = "value",
      typeCol: String = "event_type",
      tieCol: String = "event_id"): DataFrame = {
    require(nBuckets >= 2, s"woeIv: need nBuckets >= 2, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    // GLOBAL total order — see Scaladoc caveat: swap for precomputed
    // quantile cut points + map-only bucket assignment at scale
    val w = Window.orderBy(col("_v"), col(tieCol))
    val cells = ev.where(col(valueCol).isNotNull)
      .select(col(tieCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"),
        when(col(typeCol) === posType, 1L).otherwise(0L).as("_pos"))
      .withColumn("bucket", ntile(nBuckets).over(w))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_pos")).as("n_pos"),
        (count(lit(1)) - sum(col("_pos"))).as("n_neg"))
    val tot = cells.agg(
      coalesce(sum(col("n_pos")), lit(0L)).as("_tp"),
      coalesce(sum(col("n_neg")), lit(0L)).as("_tn"))
    val k = nBuckets.toLong
    cells.crossJoin(broadcast(tot))
      .selectExpr("bucket", "n", "n_pos", "n_neg",
        // ln of the integer cross-ratio — one float division inside
        s"round(ln(CAST((2 * n_pos + 1) * (2 * _tn + $k) AS DOUBLE) / " +
          s"CAST((2 * n_neg + 1) * (2 * _tp + $k) AS DOUBLE)), 6) + 0.0 AS woe",
        s"round((CAST(2 * n_pos + 1 AS DOUBLE) / (2 * _tp + $k) - " +
          s"CAST(2 * n_neg + 1 AS DOUBLE) / (2 * _tn + $k)) * " +
          s"(ln(CAST((2 * n_pos + 1) * (2 * _tn + $k) AS DOUBLE) / " +
          s"CAST((2 * n_neg + 1) * (2 * _tp + $k) AS DOUBLE))), 6) + 0.0 AS iv_term")
      .withColumn("iv_total",
        round(sum(col("iv_term")).over(Window.partitionBy()), 6) + lit(0.0d))
      .orderBy("bucket")
  }

  /** BURSTINESS (Fano factor) per key over the dense hourly count
    * series — variance-to-mean of counts INCLUDING silent hours: 1 ≈
    * Poisson arrivals, ≫ 1 bursty (campaign spikes, retry storms),
    * < 1 regular (heartbeat). Exactly integer: with S = Σc and n grid
    * hours, F_ppm = (n·Σc² − S²)·1e6 div ((n−1)·S) — numerator
    * non-negative (Cauchy-Schwarz), so the integral div is portable.
    * The dense grid matters: skipping empty hours silently Poisson-izes
    * every burst (the [[seasonalNaiveMase]] zero-fill lesson).
    *
    * Shape: hour-count partial agg, per-key bounds, per-key grid
    * explode sized |hours| — everything after the first aggregate is
    * grid-sized, exchanges on the key only. Returns (keyCol, n_hours,
    * n_events, fano_ppm) — NULL fano for n < 2 or zero events. */
  def burstiness(
      ev: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val d = DecimalType(38, 0)
    val hc = floor(epochSec(tsCol).cast("double") / lit(3600.0d)).cast("long")
    val counts = ev.groupBy(col(keyCol), hc.as("_h"))
      .agg(count(lit(1)).as("_c"))
    val bounds = counts.groupBy(col(keyCol))
      .agg(min(col("_h")).as("_lo"), max(col("_h")).as("_hi"))
    bounds
      .select(col(keyCol), explode(sequence(col("_lo"), col("_hi"))).as("_h"))
      .join(counts, Seq(keyCol, "_h"), "left")
      .select(col(keyCol), coalesce(col("_c"), lit(0L)).as("_c"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("_c")).as("n_events"),
        sum(col("_c").cast(d) * col("_c").cast(d)).as("_ss"))
      .selectExpr(keyCol, "n_hours", "n_events",
        "CASE WHEN n_hours < 2 OR n_events = 0 THEN CAST(NULL AS BIGINT) ELSE " +
          "CAST((CAST(n_hours AS DECIMAL(38,0)) * _ss - " +
          "CAST(n_events AS DECIMAL(38,0)) * n_events) * 1000000 div " +
          "(CAST(n_hours - 1 AS DECIMAL(38,0)) * n_events) AS BIGINT) END AS fano_ppm")
  }

  /** DIFFERENCE-IN-DIFFERENCES — the two-group × two-period causal
    * estimator: DiD = (treated_after − treated_before) −
    * (control_after − control_before), removing both the group baseline
    * and the common time trend. Periods split at the range midpoint
    * (the [[heavyChangers]] convention); all four cell means are
    * re-signed integral micro divisions, and the estimate is pure
    * integer arithmetic over them. This is the point estimate — pair
    * with [[ratioMetricCI]]-style moments when an error bar is needed.
    *
    * Returns ONE row: (n per cell ×4, mean micro ×4, did_micro). */
  def diffInDiff(
      ev: DataFrame,
      treatedType: String = "purchase",
      controlType: String = "view",
      valueCol: String = "value",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val base = ev
      .where(col(typeCol).isin(treatedType, controlType) && col(valueCol).isNotNull)
      .select((col(typeCol) === treatedType).as("_t"), epochSec(tsCol).as("_s"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
    val mid = base.agg(
      floor((min(col("_s")) + max(col("_s"))).cast("double") / lit(2.0d))
        .cast("long").as("_mid"))
    def cell(t: Boolean, after: Boolean, suffix: String): Seq[org.apache.spark.sql.Column] = {
      val in = col("_t") === t &&
        (if (after) col("_s") > col("_mid") else col("_s") <= col("_mid"))
      Seq(coalesce(sum(when(in, 1L).otherwise(0L)), lit(0L)).as(s"n_$suffix"),
        coalesce(sum(when(in, col("_v")).otherwise(lit(0L))
          .cast(DecimalType(38, 0))), lit(0).cast(DecimalType(38, 0)))
          .as(s"_s_$suffix"))
    }
    def meanExpr(suffix: String): String =
      s"CASE WHEN n_$suffix = 0 THEN 0 ELSE " +
        s"CAST(CASE WHEN _s_$suffix >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
        s"CAST(abs(_s_$suffix) div CAST(n_$suffix AS DECIMAL(38,0)) AS BIGINT) END AS mean_${suffix}_micro"
    val aggs = cell(t = true, after = false, "tb") ++
      cell(t = true, after = true, "ta") ++
      cell(t = false, after = false, "cb") ++
      cell(t = false, after = true, "ca")
    base.crossJoin(broadcast(mid))
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_tb", "n_ta", "n_cb", "n_ca",
        meanExpr("tb"), meanExpr("ta"), meanExpr("cb"), meanExpr("ca"))
      .selectExpr("n_tb", "n_ta", "n_cb", "n_ca",
        "mean_tb_micro", "mean_ta_micro", "mean_cb_micro", "mean_ca_micro",
        "(mean_ta_micro - mean_tb_micro) - (mean_ca_micro - mean_cb_micro) AS did_micro")
  }

  /** Q-Q TABLE — empirical quantile-quantile comparison of a measure
    * between two groups: decile d of group A beside decile d of group
    * B plus their re-signed ratio — the distribution-shape diagnostic
    * behind every "is treatment shifted OR reshaped?" question (a pure
    * location shift moves all deciles equally; a tail effect moves only
    * the top rows). Deciles are the exact lower-quantile rank cuts
    * (⌈d·n/10⌉ over the (value, tie) total order — the
    * [[slaPercentiles]] convention), so the table is integer-exact.
    *
    * One rank ladder per group (parallelism = 2 groups — each group's
    * ladder is a per-partition sort of its own rows; for corpus-sized
    * groups swap exact ranks for the [[slaPercentiles]] cut-point
    * recipe); the decile table is 10-row-bounded. Returns (decile
    * 1..10, a_micro, b_micro, ratio_ppm), ratio NULL when the B decile
    * is 0. */
  def qqTable(
      ev: DataFrame,
      typeA: String = "view",
      typeB: String = "purchase",
      valueCol: String = "value",
      typeCol: String = "event_type",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = ev
      .where(col(typeCol).isin(typeA, typeB) && col(valueCol).isNotNull)
      .select(col(typeCol).as("_g"), col(tieCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .withColumn("_rn", row_number()
        .over(Window.partitionBy(col("_g")).orderBy(col("_v"), col(tieCol)))
        .cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("_g"))))
    // ONE global conditional aggregate holds all 20 decile cuts — no
    // per-decile re-scan, no group join; the 1-row result explodes to
    // the 10-row table
    val aggs = for {
      (g, nm) <- Seq((typeA, "a"), (typeB, "b")); dd <- 1 to 10
    } yield min(when(col("_g") === g &&
        col("_rn") === expr(s"($dd * _n + 9) div 10"), col("_v")))
      .as(s"_$nm$dd")
    base.agg(aggs.head, aggs.tail: _*)
      .select(explode(array((1 to 10).map(dd =>
        struct(lit(dd).as("decile"),
          col(s"_a$dd").as("a_micro"), col(s"_b$dd").as("b_micro"))): _*)).as("_e"))
      .select(col("_e.decile").as("decile"),
        col("_e.a_micro").as("a_micro"), col("_e.b_micro").as("b_micro"))
      // empty input: the 1-row aggregate explodes to all-NULL deciles —
      // suppress them (a one-sided decile still reports)
      .where(col("a_micro").isNotNull || col("b_micro").isNotNull)
      .selectExpr("decile", "a_micro", "b_micro",
        "CASE WHEN b_micro = 0 OR b_micro IS NULL OR a_micro IS NULL THEN CAST(NULL AS BIGINT) ELSE " +
          "CAST(CASE WHEN a_micro >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(CASE WHEN b_micro >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(abs(a_micro) * 1000000 div abs(b_micro) AS BIGINT) END AS ratio_ppm")
      .orderBy("decile")
  }

  /** CUMULATIVE UNIQUES — the growth curve: distinct users ever seen,
    * by day. NOT a running count-distinct (quadratic in any engine):
    * each user contributes on their FIRST day only — min(day) per user
    * (one partial-agg'd exchange), first-seen counts per day, then a
    * running sum over the |days|-bounded series. The classic exact
    * decomposition that makes "uniques to date" linear.
    *
    * Returns (day, n_new, n_cumulative) ordered by day — days with no
    * new users appear with n_new = 0 (dense grid, the
    * [[seasonalNaiveMase]] zero-fill lesson: a flat week must show as
    * flat, not absent). */
  def cumulativeUniques(
      ev: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = floor(epochSec(tsCol).cast("double") / lit(86400.0d)).cast("long")
    val firstSeen = ev.select(col(keyCol), day.as("_d"))
      .groupBy(col(keyCol)).agg(min(col("_d")).as("_first"))
      .groupBy(col("_first").as("day")).agg(count(lit(1)).as("n_new"))
    val bounds = firstSeen.agg(min(col("day")).as("_lo"), max(col("day")).as("_hi"))
    bounds.select(explode(sequence(col("_lo"), col("_hi"))).as("day"))
      .join(firstSeen, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("n_cumulative", // day-bounded ladder (observation window)
        sum(col("n_new")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("day")
  }

  /** RECENCY-DECAYED engagement score per key — each event's value
    * halves for every `halfLifeSeconds` of age at the snapshot's
    * high-water mark: score = Σ v_micro div 2^(age div halfLife). The
    * EXACT integer form of exponential decay (the float e^{-λt} version
    * is [[ewmaSmooth]]'s territory): a power-of-two halving is a BIGINT
    * division, so the score is reproducible to the last unit on any
    * engine — the property a ranking signal feeding downstream joins
    * actually needs. Ages ≥ 40 half-lives contribute 0 (declared cap;
    * 2⁴⁰ ≈ 10¹² already zeroes any realistic micro value).
    *
    * Shape: the high-water mark is a 1-row fold broadcast back (lazy,
    * single-pass — the [[graft.ops.Governance.freshnessReport]]
    * recipe); the decay is map-only; one partial-agg'd fold on the key.
    * At 100 TB this is the scan plus a key-sized aggregate. Returns
    * (keyCol, n_events, score_micro, last_sec). */
  def decayScore(
      ev: DataFrame,
      halfLifeSeconds: Long = 86400L,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(halfLifeSeconds > 0, s"decayScore: need halfLifeSeconds > 0, got $halfLifeSeconds")
    val base = ev.select(col(keyCol),
      epochSec(tsCol).as("_s"),
      floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
    val hwm = base.agg(max(col("_s")).as("_hwm"))
    base.crossJoin(broadcast(hwm))
      .withColumn("_k", expr(s"(_hwm - _s) div $halfLifeSeconds"))
      .withColumn("_dv",
        when(col("_k") >= 40L, lit(0L))
          // re-signed magnitude div (truncate vs floor on negatives)
          .otherwise(expr("CASE WHEN _v >= 0 THEN _v div shiftleft(1L, CAST(_k AS INT)) " +
            "ELSE -((-_v) div shiftleft(1L, CAST(_k AS INT))) END")))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("_dv")).as("score_micro"),
        max(col("_s")).as("last_sec"))
  }

  /** SLA PERCENTILES — the operations quartet (p50/p90/p95/p99) per
    * key, EXACT: value at rank ⌈p·n/100⌉ over the (value, tie) total
    * order (the lower-percentile convention — an SLA report must quote
    * a value that actually occurred, not an interpolation). Integer
    * micro-units; rank arithmetic is `(p·n + 99) div 100` (exact
    * ceiling, non-negative operands).
    *
    * Shape: ONE hash exchange on the key — the rank window and the
    * final conditional-min fold reuse it; nothing global. At 100 TB
    * parallelism = #keys (same envelope as [[trimmedMean]]'s rank
    * cuts). Returns (keyCol, n, p50_micro, p90_micro, p95_micro,
    * p99_micro); empty keys simply don't appear. */
  def slaPercentiles(
      ev: DataFrame,
      keyCol: String = "event_type",
      valueCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_v"), col(tieCol))
    val n = Window.partitionBy(col(keyCol))
    ev.where(col(valueCol).isNotNull)
      .select(col(keyCol), col(tieCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(n))
      .groupBy(col(keyCol))
      .agg(
        max(col("_n")).as("n"),
        min(when(col("_rn") === expr("(50 * _n + 99) div 100"), col("_v")))
          .as("p50_micro"),
        min(when(col("_rn") === expr("(90 * _n + 99) div 100"), col("_v")))
          .as("p90_micro"),
        min(when(col("_rn") === expr("(95 * _n + 99) div 100"), col("_v")))
          .as("p95_micro"),
        min(when(col("_rn") === expr("(99 * _n + 99) div 100"), col("_v")))
          .as("p99_micro"))
  }

  /** RATIO-METRIC confidence interval per cohort — the A/B primitive
    * [[wilsonInterval]] cannot cover: a metric that is a RATIO of two
    * per-user counts (purchases per view, clicks per session), where
    * users are the randomization unit and the naive binomial CI is
    * wrong because both numerator and denominator vary per user. Uses
    * the delta method on per-user (x, y): R = Σx/Σy and
    * se = sqrt((Vx − 2R·Cxy + R²·Vy) / (n−1)) / Σy with the exact
    * integer moments Vx = n·Σx²−(Σx)², Vy = n·Σy²−(Σy)²,
    * Cxy = n·Σxy−Σx·Σy (the variance-of-a-ratio expansion; the n/(n−1)
    * convention is declared by the formula).
    *
    * Engine-portability: every moment is an exact DECIMAL(38,0) from
    * ONE partial-agg'd pass over the per-user count table; floats enter
    * only in the final R/se expression with IDENTICAL operand order on
    * both engines, rounded to 6 — the [[wilsonInterval]] policy. CI
    * NULL when n < 2 or Σy = 0 or the bracket is negative-degenerate
    * (clamped at 0 under the max).
    *
    * Returns (cohort, n_users, sum_num, sum_den, ratio, ci_lo, ci_hi)
    * ordered by cohort. */
  def ratioMetricCI(
      ev: DataFrame,
      numType: String = "purchase",
      denType: String = "view",
      nCohorts: Int = 10,
      keyCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(nCohorts >= 1, s"ratioMetricCI: need nCohorts >= 1, got $nCohorts")
    val d = DecimalType(38, 0)
    val perUser = ev
      .where(col(typeCol).isin(numType, denType))
      .groupBy(pmod(col(keyCol), lit(nCohorts)).as("cohort"), col(keyCol))
      .agg(
        sum(when(col(typeCol) === numType, 1L).otherwise(0L)).as("_x"),
        sum(when(col(typeCol) === denType, 1L).otherwise(0L)).as("_y"))
    perUser.groupBy(col("cohort"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("_x")).as("sum_num"), sum(col("_y")).as("sum_den"),
        sum(col("_x").cast(d) * col("_x").cast(d)).as("_sxx"),
        sum(col("_y").cast(d) * col("_y").cast(d)).as("_syy"),
        sum(col("_x").cast(d) * col("_y").cast(d)).as("_sxy"))
      .selectExpr("cohort", "n_users", "sum_num", "sum_den",
        "CASE WHEN sum_den = 0 THEN CAST(NULL AS DOUBLE) " +
          "ELSE round(CAST(sum_num AS DOUBLE) / sum_den, 6) + 0.0 END AS ratio",
        // Vx − 2R·Cxy + R²·Vy: moments exact, floats in fixed order
        "CASE WHEN n_users < 2 OR sum_den = 0 THEN CAST(NULL AS DOUBLE) ELSE " +
          "round(CAST(sum_num AS DOUBLE) / sum_den - 1.96 * " +
          "(sqrt(greatest(CAST(n_users * _sxx - CAST(sum_num AS DECIMAL(38,0)) * sum_num AS DOUBLE) " +
          "- 2.0 * (CAST(sum_num AS DOUBLE) / sum_den) * CAST(n_users * _sxy - CAST(sum_num AS DECIMAL(38,0)) * sum_den AS DOUBLE) " +
          "+ (CAST(sum_num AS DOUBLE) / sum_den) * (CAST(sum_num AS DOUBLE) / sum_den) * CAST(n_users * _syy - CAST(sum_den AS DECIMAL(38,0)) * sum_den AS DOUBLE), 0.0) " +
          "/ (CAST(n_users AS DOUBLE) - 1.0)) / sum_den), 6) + 0.0 END AS ci_lo",
        "CASE WHEN n_users < 2 OR sum_den = 0 THEN CAST(NULL AS DOUBLE) ELSE " +
          "round(CAST(sum_num AS DOUBLE) / sum_den + 1.96 * " +
          "(sqrt(greatest(CAST(n_users * _sxx - CAST(sum_num AS DECIMAL(38,0)) * sum_num AS DOUBLE) " +
          "- 2.0 * (CAST(sum_num AS DOUBLE) / sum_den) * CAST(n_users * _sxy - CAST(sum_num AS DECIMAL(38,0)) * sum_den AS DOUBLE) " +
          "+ (CAST(sum_num AS DOUBLE) / sum_den) * (CAST(sum_num AS DOUBLE) / sum_den) * CAST(n_users * _syy - CAST(sum_den AS DECIMAL(38,0)) * sum_den AS DOUBLE), 0.0) " +
          "/ (CAST(n_users AS DOUBLE) - 1.0)) / sum_den), 6) + 0.0 END AS ci_hi")
      .orderBy("cohort")
  }

  /** MIX-SHIFT decomposition — why did the average move between two
    * periods? Split each segment's contribution into a MIX effect (its
    * share of traffic changed) and a RATE effect (its own average
    * changed): with shares s and rates r (before b / after a),
    * Δ = Σ_seg [(s_a − s_b)·r_b + s_a·(r_a − r_b)] — the standard
    * share-first convention (declared; the other factorization moves
    * the cross term). Periods split at the range midpoint, the
    * [[heavyChangers]] convention (midpoint row counts as BEFORE).
    *
    * Integer-exact: shares in ppm off BIGINT counts, rates in
    * micro-units; every division and every product-then-divide is the
    * re-signed magnitude `div` (Spark div truncates, DuckDB // floors —
    * identical only on non-negative magnitudes). A segment absent from
    * one period contributes share 0 and rate 0 (declared; its whole
    * movement shows up as the other period's effect).
    *
    * Shape: one partial-agg (count, sum) on (segment, half); totals are
    * a 2-row fold broadcast back; everything after the first aggregate
    * is |segments|-bounded. Returns (segment, n_before, n_after,
    * share_before_ppm, share_after_ppm, rate_before_micro,
    * rate_after_micro, mix_effect_micro, rate_effect_micro) ordered by
    * segment. */
  def mixShift(
      ev: DataFrame,
      segCol: String = "event_type",
      valueCol: String = "value",
      tsCol: String = "ts"): DataFrame = {
    val base = ev.select(col(segCol).as("seg"), epochSec(tsCol).as("_s"),
      floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
    val mid = base.agg(
      floor((min(col("_s")) + max(col("_s"))).cast("double") / lit(2.0d))
        .cast("long").as("_mid"))
    val halves = base.crossJoin(broadcast(mid))
      .withColumn("_h", when(col("_s") <= col("_mid"), lit(0)).otherwise(lit(1)))
    val perSeg = halves.groupBy(col("seg"))
      .agg(
        sum(when(col("_h") === 0, 1L).otherwise(0L)).as("n_before"),
        sum(when(col("_h") === 1, 1L).otherwise(0L)).as("n_after"),
        sum(when(col("_h") === 0, col("_v")).otherwise(lit(0L))
          .cast(DecimalType(38, 0))).as("_sb"),
        sum(when(col("_h") === 1, col("_v")).otherwise(lit(0L))
          .cast(DecimalType(38, 0))).as("_sa"))
    val tot = perSeg.agg(sum(col("n_before")).as("_tb"), sum(col("n_after")).as("_ta"))
    def resignedDiv(num: String, den: String): String =
      s"CASE WHEN $den = 0 THEN 0 ELSE " +
        s"CAST(CASE WHEN $num >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
        s"CAST(abs($num) div CAST($den AS DECIMAL(38,0)) AS BIGINT) END"
    perSeg.crossJoin(broadcast(tot))
      .selectExpr("seg", "n_before", "n_after", "_sb", "_sa", "_tb", "_ta")
      .selectExpr("seg", "n_before", "n_after",
        "CAST(CASE WHEN _tb = 0 THEN 0 ELSE n_before * 1000000 div _tb END AS BIGINT) AS share_before_ppm",
        "CAST(CASE WHEN _ta = 0 THEN 0 ELSE n_after * 1000000 div _ta END AS BIGINT) AS share_after_ppm",
        resignedDiv("_sb", "n_before") + " AS rate_before_micro",
        resignedDiv("_sa", "n_after") + " AS rate_after_micro")
      .selectExpr("seg", "n_before", "n_after",
        "share_before_ppm", "share_after_ppm",
        "rate_before_micro", "rate_after_micro",
        resignedDiv("(share_after_ppm - share_before_ppm) * rate_before_micro",
          "1000000") + " AS mix_effect_micro",
        resignedDiv("share_after_ppm * (rate_after_micro - rate_before_micro)",
          "1000000") + " AS rate_effect_micro")
      .orderBy("seg")
  }

  /** AUTOCORRELATION function per key at lags 1..`maxLag` over the
    * (ts, tie)-ordered value sequence — the seasonality/momentum
    * fingerprint ("does this metric echo itself one step later?") and
    * the standard pre-check before fitting any AR model. Per key and
    * lag ℓ: r_ℓ = Σ_t (x_t − x̄)(x_{t+ℓ} − x̄) / Σ_t (x_t − x̄)², the
    * textbook full-series-mean estimator.
    *
    * Integer-exact: values micro-quantize to BIGINT (the p59 recipe);
    * with per-key n and S = Σx, mean-centering scales by n so every
    * term is the exact integer (n·x_t − S)(n·x_{t+ℓ} − S) in
    * DECIMAL(38,0), and the final ppm is a re-signed non-negative
    * `div` against the exact denominator (the [[Governance.cohenKappa]]
    * re-sign recipe — Spark div truncates, DuckDB // floors; they
    * agree only on non-negative operands). Headroom: |n·x| ≤ 2e4·5e8 =
    * 1e13 at gate scale; its square sums to ~2e30 ≪ 1e38.
    *
    * Shape — KEY-POOR-SAFE (the [[Ffill.ffillBlocked]] two-pass recipe
    * applied to lag emission): a plain key-partitioned lead() window
    * serializes each key through one task, so a 5-event-type
    * clickstream would run 5 tasks at any corpus size. Instead the
    * per-key sequence rank comes from (key, time-block)-parallel
    * row_number windows plus a carry of block counts cumulated over the
    * (#keys × #blocks)-bounded summary, and lag pairs come from ONE
    * composite (key, rank)-keyed equi-join (each row probes its maxLag
    * predecessors) — every wide stage is partition-parallel. A bounded
    * (key × lag) skeleton re-emits zero-pair lags. Per-key moments
    * (n, S — key-cardinality bounded) broadcast back as before.
    *
    * Returns (keyCol, lag, n_pairs, acf_ppm), acf_ppm NULL for a
    * zero-variance key; keys with fewer than ℓ+1 values emit that lag
    * with n_pairs = 0 and NULL acf_ppm. */
  def acfByKey(
      ev: DataFrame,
      maxLag: Int = 3,
      keyCol: String = "event_type",
      valueCol: String = "value",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      blockMicros: Long = 3600000000L): DataFrame = {
    require(maxLag >= 1, s"acfByKey: need maxLag >= 1, got $maxLag")
    require(blockMicros >= 1, s"acfByKey: need blockMicros >= 1, got $blockMicros")
    import org.apache.spark.sql.expressions.Window
    val d = DecimalType(38, 0)
    val base = ev
      .where(col(valueCol).isNotNull)
      .select(col(keyCol), col(tieCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_x"),
        unix_micros(col(tsCol)).as("_t"))
    val moments = base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("_n"), sum(col("_x").cast(d)).as("_s"))
    val centered = base
      .join(broadcast(moments), Seq(keyCol))
      .withColumn("_c", col("_n").cast(d) * col("_x").cast(d) - col("_s"))
      .withColumn("_blk", expr(s"_t div ${blockMicros}L"))
    // blocked global-per-key rank: within-block row_number in
    // (key, blk)-parallel windows + a cumulated block-count carry over
    // the bounded (key, blk) summary — identical to the rank a single
    // key-partitioned window would assign (blocks are monotone,
    // non-overlapping _t intervals)
    val wIn = Window.partitionBy(col(keyCol), col("_blk"))
      .orderBy(col("_t"), col(tieCol))
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = centered.groupBy(col(keyCol), col("_blk"))
      .agg(count(lit(1)).as("_bc"))
      .withColumn("_carry", coalesce(sum(col("_bc")).over(wCarry), lit(0L)))
      .select(col(keyCol), col("_blk"), col("_carry"))
    val seq0 = centered
      .withColumn("_rnIn", row_number().over(wIn).cast("long"))
      .join(broadcast(carry), Seq(keyCol, "_blk"))
      .select(col(keyCol), (col("_rnIn") + col("_carry")).as("_rn"), col("_c"))
    // each row probes its 1..maxLag predecessors: one hash-partitioned
    // equi-join on (key, rank), never a per-key serial scan
    val probes = seq0.select(col(keyCol), col("_c").as("_cl"),
        explode(array((1 to maxLag).map(l =>
          struct(lit(l).as("lag"), (col("_rn") - l).as("_rn0"))): _*)).as("_e"))
      .select(col(keyCol), col("_e.lag").as("lag"),
        col("_e._rn0").as("_rn"), col("_cl"))
    val pairAgg = seq0.join(probes, Seq(keyCol, "_rn"))
      .groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("_np"), sum(col("_c") * col("_cl")).as("_num"))
    // bounded (key × lag) skeleton: zero-pair lags still emit, and the
    // exact denominator Σc² is one per-key partial agg
    val den = centered.groupBy(col(keyCol))
      .agg(sum(col("_c") * col("_c")).as("_den"))
    val lags = ev.sparkSession.range(1, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    den.crossJoin(broadcast(lags))
      .join(pairAgg, Seq(keyCol, "lag"), "left")
      .select(col(keyCol), col("lag"),
        coalesce(col("_np"), lit(0L)).as("n_pairs"),
        when(col("_den") === 0 || coalesce(col("_np"), lit(0L)) === 0,
          lit(null).cast("long"))
          .otherwise(
            when(col("_num") >= 0, lit(1L)).otherwise(lit(-1L)) *
              expr("CAST(abs(_num) * 1000000 div _den AS BIGINT)")).as("acf_ppm"))
      .orderBy(keyCol, "lag")
  }

  /** First-order MARKOV next-event predictor with in-corpus accuracy:
    * per from-type, the argmax next type (count desc, type asc
    * tie-break) and how often that prediction is right — the one-table
    * answer to "what happens after X, and how predictable is it?" and
    * the evaluation [[transitionMotifs]] (raw top-k pairs) doesn't do.
    *
    * Shape: one key-partitioned lag window emits transitions (the
    * transitionMotifs stream — only (key, type) pairs shuffle), a
    * partial-agg count on the |types|²-bounded (from, to) pair, and the
    * argmax folds over that bounded table via min(struct(−n, to)) — no
    * second corpus pass, no window over data rows. Transitions never
    * cross keys. Integer-exact ppm.
    *
    * Returns (from_type, predicted, n_transitions, n_hits, hit_ppm). */
  def markovNext(
      ev: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_t"), col(tieCol))
    val pairs = ev
      .select(col(keyCol), col(tieCol), col(typeCol).as("_from"),
        unix_micros(col(tsCol)).as("_t"))
      .withColumn("_to", lead(col("_from"), 1).over(w))
      .where(col("_to").isNotNull)
      .groupBy(col("_from"), col("_to"))
      .agg(count(lit(1)).as("_n"))
    pairs.groupBy(col("_from").as("from_type"))
      .agg(
        min(struct((-col("_n")).as("_neg"), col("_to").as("_t2"))).as("_best"),
        sum(col("_n")).as("n_transitions"))
      .select(col("from_type"), col("_best._t2").as("predicted"),
        col("n_transitions"),
        (-col("_best._neg")).as("n_hits"))
      .withColumn("hit_ppm", expr("CAST(n_hits * 1000000 div n_transitions AS BIGINT)"))
      .orderBy("from_type")
  }

  /** Per-key SHANNON ENTROPY of the event-type mix — the behavioral-
    * diversity score (0 = one-note bots, ln(|types|) = uniform
    * explorers) that segments users beyond raw counts.
    *
    * Float policy: each term −(c/n)·ln(c/n) is computed per (key, type)
    * row with FIXED operand order (the [[Governance.psiDrift]]
    * contract), then micro-quantized `floor(term·1e6)` to BIGINT
    * BEFORE the per-key sum — so the only order-sensitive step (the
    * sum) runs on exact integers and the result is invariant to
    * aggregation order cross-engine. Entropy is in nats, micro-points.
    *
    * Shape: one partial-agg count on (key, type), the per-key total as
    * a key window REUSING that exchange, and the final per-key sum on
    * the same key. At 100 TB parallelism = #keys; nothing row-sized
    * survives the first aggregate.
    *
    * Returns (keyCol, n_events, n_types, entropy_micro). */
  def typeEntropy(
      ev: DataFrame,
      keyCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    ev.select(col(keyCol), col(typeCol))
      .groupBy(col(keyCol), col(typeCol))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_n", sum(col("_c")).over(wKey))
      .withColumn("_p", col("_c").cast("double") / col("_n").cast("double"))
      .withColumn("_tm",
        floor((-col("_p") * log(col("_p"))) * lit(1000000.0d)).cast("long"))
      .groupBy(col(keyCol))
      .agg(max(col("_n")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(col("_tm")).as("entropy_micro"))
  }

  /** WILSON SCORE INTERVAL per key for a binary outcome — the error
    * bars every conversion dashboard should draw: unlike the normal
    * approximation it never leaves [0, 1] and stays honest at small n
    * or extreme rates. Outcome = "the key's user did `convType` at
    * least once".
    *
    * Shape: one (key, user) partial agg (users-bounded), one key agg
    * on its exchange. The interval itself is the declared float tail
    * (one sqrt; z = 1.96 literal on both engines; round-6, +0.0) over
    * exact integer n and x — the [[Governance.psiDrift]] float
    * policy; n, x, and rate_ppm stay integer-exact.
    *
    * Returns per cohort (user id mod `cohorts`): (cohort, n_users,
    * n_converted, rate_ppm, wilson_lo, wilson_hi). */
  def wilsonInterval(
      ev: DataFrame,
      convType: String = "purchase",
      cohorts: Int = 10,
      userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(cohorts >= 1, s"wilsonInterval: need >= 1 cohorts, got $cohorts")
    val perUser = ev
      .groupBy((col(userCol) % cohorts).as("cohort"), col(userCol).as("_u"))
      .agg(max(when(col(typeCol) === convType, 1L).otherwise(0L)).as("_conv"))
    val n = col("n_users").cast("double")
    val p = col("n_converted").cast("double") / n
    val z = lit(1.96d)
    val z2 = z * z
    val center = p + z2 / (lit(2.0d) * n)
    val spread = z * sqrt((p * (lit(1.0d) - p) + z2 / (lit(4.0d) * n)) / n)
    val denom = lit(1.0d) + z2 / n
    perUser
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_users"), sum(col("_conv")).as("n_converted"))
      .select(col("cohort"), col("n_users"), col("n_converted"),
        expr("CAST(n_converted * 1000000 div n_users AS BIGINT)").as("rate_ppm"),
        (round((center - spread) / denom, 6) + lit(0.0d)).as("wilson_lo"),
        (round((center + spread) / denom, 6) + lit(0.0d)).as("wilson_hi"))
      .orderBy("cohort")
  }

  /** TRIMMED MEAN per key: the mean of the middle (1 − 2·trim) of each
    * key's values — the robust location estimate dashboards should use
    * where a plain AVG is one fat-finger away from nonsense, and the
    * aggregate sibling of [[winsorize]] (which clamps rows; this trims
    * and averages).
    *
    * Exact trim rule: with n values ranked (value, tie) ascending, keep
    * ranks in (⌊n·trim_ppm/1e6⌋, n − ⌊n·trim_ppm/1e6⌋] — the low and
    * high cut counts are equal and the kept count is never zero for
    * trim < 50%. Integer-exact: micro-quantized sums, one final div.
    *
    * Shape: one key window (rank) + one aggregate on the SAME key
    * exchange. Returns (keyCol, n, n_kept, mean_micro, trimmed_mean_micro)
    * — the untrimmed mean rides along for the "how much did outliers
    * move it" readout. */
  def trimmedMean(
      ev: DataFrame,
      trimPpm: Long = 50000L,
      keyCol: String = "event_type",
      valueCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    require(trimPpm >= 0 && trimPpm < 500000L,
      s"trimmedMean: trim must be in [0, 0.5) as ppm, got $trimPpm")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_v"), col(tieCol))
    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    ev.where(col(valueCol).isNotNull)
      .select(col(keyCol), col(tieCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .withColumn("_r", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wKey))
      .withColumn("_cut", expr(s"CAST(_n * $trimPpm div 1000000 AS BIGINT)"))
      .groupBy(col(keyCol))
      .agg(
        max(col("_n")).as("n"),
        sum(when(col("_r") > col("_cut") && col("_r") <= col("_n") - col("_cut"), 1L))
          .as("n_kept"),
        sum(col("_v")).as("_sum_all"),
        sum(when(col("_r") > col("_cut") && col("_r") <= col("_n") - col("_cut"),
          col("_v"))).as("_sum_kept"))
      .select(col(keyCol), col("n"), col("n_kept"),
        expr("CAST(CASE WHEN _sum_all >= 0 THEN 1 ELSE -1 END * (abs(_sum_all) div n) AS BIGINT)")
          .as("mean_micro"),
        expr("CAST(CASE WHEN _sum_kept >= 0 THEN 1 ELSE -1 END * (abs(_sum_kept) div n_kept) AS BIGINT)")
          .as("trimmed_mean_micro"))
      .orderBy(keyCol)
  }

  /** MANN–WHITNEY U rank-sum test between two keys' value
    * distributions — the nonparametric "is A stochastically larger
    * than B" answer that needs no normality assumption, completing the
    * in-engine test kit (χ² p143 for proportions, KS p135 for shape,
    * this for location).
    *
    * Tie handling is the textbook average-rank rule computed EXACTLY:
    * ranks are scaled ×2 (the average of a tied run's min/max rank is
    * a half-integer, so 2·rank is always an integer — min_rank +
    * max_rank per tied value, via one value-keyed count table and a
    * running sum over it). U_a then comes from the ×2 rank sum with
    * one final halving division; U_a + U_b = n_a·n_b is asserted by
    * construction. The z statistic (tie-corrected variance) is the
    * declared float tail: one sqrt, round-3.
    *
    * Shape: one partial-agg count on (value, side) — the tied-rank
    * ladder is THE shared [[graft.ops.Stats.mwTiedRankLadder]] kernel
    * (one implementation engine-wide; this surface and [[graft.ops
    * .Stats.mannWhitney]] are intentional dual API — caller-keyed
    * U + float z here, lexicographic 2-group integer-exact z² there) —
    * and every statistic folds over that value-cardinality-bounded
    * table; corpus rows are touched once. Returns ONE row:
    * (key_a, key_b, n_a, n_b, u2_a, u2_b, z). */
  def mannWhitneyU(
      ev: DataFrame,
      keyA: String,
      keyB: String,
      keyCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val d = DecimalType(38, 0)
    val counts = ev
      .where(col(valueCol).isNotNull && col(keyCol).isin(keyA, keyB))
      .select(floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long")
        .as("_v"), col(keyCol).as("_k"))
      .groupBy(col("_v"))
      .agg(sum(when(col("_k") === keyA, 1L).otherwise(0L)).as("_c1"),
        sum(when(col("_k") === keyB, 1L).otherwise(0L)).as("_c2"))
    // 2·avg_rank of a tied run = 2·before + t + 1 (min+max rank)
    val ranked = graft.ops.Stats.mwTiedRankLadder(counts)
    ranked.agg(
        sum(col("_c1")).as("n_a"), sum(col("_c2")).as("n_b"),
        coalesce(sum(col("_c1").cast(d) * col("_mr2").cast(d)), lit(0).cast(d))
          .as("_ra2"),
        coalesce(sum(col("_ct").cast(d) * col("_ct").cast(d) * col("_ct").cast(d) -
          col("_ct").cast(d)), lit(0).cast(d)).as("_tie3"))
      // 2·U_a = 2·R_a − n_a(n_a+1) = _ra2 − n_a(n_a+1): U itself is a
      // half-integer when the cross-side tie count is odd, so the ×2
      // scale is the exact integer form; 2U_a + 2U_b = 2·n_a·n_b
      .select(lit(keyA).as("key_a"), lit(keyB).as("key_b"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        expr("CAST(_ra2 - CAST(coalesce(n_a, 0) AS DECIMAL(38,0)) * (coalesce(n_a, 0) + 1) AS BIGINT)")
          .as("u2_a"),
        col("_tie3"))
      .withColumn("u2_b", expr("CAST(2 * n_a * n_b - u2_a AS BIGINT)"))
      .select(col("key_a"), col("key_b"), col("n_a"), col("n_b"), col("u2_a"),
        col("u2_b"), {
          // z = (U_a − n_a·n_b/2) / sqrt(var), tie-corrected var =
          // n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1))); float tail, round-3
          val na = col("n_a").cast("double")
          val nb = col("n_b").cast("double")
          val n = na + nb
          val variance = na * nb / lit(12.0d) *
            ((n + 1) - col("_tie3").cast("double") / (n * (n - 1)))
          when(col("n_a") === 0 || col("n_b") === 0 || variance <= 0,
            lit(null).cast("double"))
            .otherwise(round((col("u2_a").cast("double") / lit(2.0d) -
              na * nb / lit(2.0d)) / sqrt(variance), 3) + lit(0.0d))
            .as("z")
        })
  }

  /** QUANTILE NORMALIZATION: map every `fromKey` row's value onto the
    * `toKey` distribution by rank — the batch-effect correction that
    * makes two sources' scores comparable ("a 90th-percentile click
    * value IS a 90th-percentile purchase value after mapping"), the
    * sibling of [[graft.ops.CorpusOps.groupPercentileRank]] that
    * returns VALUES, not ranks.
    *
    * Integer-exact: ranks come from row_number over the tie-free
    * (value, id) order; the mid-rank percentile (2r−1)/(2n_A) maps to
    * the target's empirical quantile index ⌈pct·n_B⌉ computed as ONE
    * ceiling division ((2r−1)·n_B + 2n_A − 1) div (2n_A) — exact
    * rationals end to end, clamped to ≥ 1; the mapped value is B's
    * value at that rank via an equi-join on the index. Values are
    * micro-quantized BIGINT.
    *
    * Shape: one window per side (each partitioned on the constant key
    * — a single series; the documented blocked two-pass rank swap
    * applies at 100 TB), scalar counts broadcast-cross-joined (lazy),
    * and one shuffle equi-join on the rank index. Returns
    * (idCol, value_micro, rank_a, norm_micro). */
  def quantileNormalize(
      ev: DataFrame,
      fromKey: String,
      toKey: String,
      keyCol: String = "event_type",
      valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    val q = floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long")
    def side(k: String) = ev
      .where(col(keyCol) === k && col(valueCol).isNotNull)
      .select(col(idCol).as("_id"), q.as("_v"))
    // GLOBAL per-row order — see Scaladoc: the blocked two-pass rank
    // swap (the QTE recipe) applies at 100 TB
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_v"), col("_id"))
    val a = side(fromKey).withColumn("_r", row_number().over(w))
    val b = side(toKey).withColumn("_r", row_number().over(w))
      .select(col("_r").as("_rb"), col("_v").as("_bv"))
    val na = a.agg(count(lit(1)).as("_na"))
    val nb = b.agg(count(lit(1)).as("_nb"))
    a.crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .withColumn("_idx", greatest(lit(1L), expr(
        "CAST(((2 * _r - 1) * _nb + 2 * _na - 1) div (2 * _na) AS BIGINT)")))
      .join(b, col("_idx") === col("_rb"))
      .select(col("_id").as(idCol), col("_v").as("value_micro"),
        col("_r").as("rank_a"), col("_bv").as("norm_micro"))
  }

  /** LONGEST ACTIVITY STREAK per key: the maximum run of CONSECUTIVE
    * active days — the engagement metric behind "7-day streak" product
    * mechanics and a sharper habit signal than raw active-day counts
    * (30 scattered days ≠ a 30-day streak).
    *
    * Integer-exact: day = floor(epoch_s/86400) (floor idiom, exact
    * pre-1970), the distinct (key, day) projection is a partial-agg
    * dedup, and the classic day − row_number() island fold runs on the
    * active-day table (≤ lifetime days per key, ≪ events). One key
    * exchange: the distinct, the island window, and both aggregates
    * all ride the key (or key-prefix) partitioning.
    *
    * Returns (keyCol, n_active_days, longest_streak, n_streaks). */
  def activityStreaks(
      ev: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val day = floor(epochSec(tsCol).cast("double") / lit(86400.0d)).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_d"))
    ev.select(col(keyCol), day.as("_d"))
      .distinct()
      .withColumn("_isl", col("_d") - row_number().over(w))
      .groupBy(col(keyCol), col("_isl"))
      .agg(count(lit(1)).as("_len"))
      .groupBy(col(keyCol))
      .agg(sum(col("_len")).as("n_active_days"),
        max(col("_len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
  }

  /** WEEK-OVER-WEEK growth per key on the DENSE week grid: volume per
    * epoch week with the previous calendar week as the base — the
    * default growth readout of any activity dashboard. Zero-filled
    * weeks are real (a silent week IS a −100% move and the next active
    * week's base); growth is NULL only for the first grid week and
    * when the base is zero (±∞).
    *
    * Integer-exact: week = floor(day/7) on floored epoch days, counts
    * are integers, growth_ppm is the re-signed magnitude div (the
    * [[Governance.cohenKappa]] recipe — Spark div truncates, DuckDB
    * // floors, they agree on non-negatives). The grid is
    * calendar-bounded per key; everything past the first partial-agg
    * count is weeks-sized.
    *
    * Returns (keyCol, week, n, growth_ppm), week-ordered. */
  def wowGrowth(
      ev: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val wk = floor(floor(epochSec(tsCol).cast("double") / lit(86400.0d))
      .cast("double") / lit(7.0d)).cast("long")
    val counts = ev.groupBy(col(keyCol), wk.as("week")).agg(count(lit(1)).as("n"))
    val bounds = counts.groupBy(col(keyCol))
      .agg(min(col("week")).as("_lo"), max(col("week")).as("_hi"))
    val grid = bounds
      .select(col(keyCol), explode(sequence(col("_lo"), col("_hi"))).as("week"))
      .join(counts, Seq(keyCol, "week"), "left")
      .select(col(keyCol), col("week"), coalesce(col("n"), lit(0L)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("week"))
    grid
      .withColumn("_prev", lag(col("n"), 1).over(w))
      .select(col(keyCol), col("week"), col("n"),
        when(col("_prev").isNull || col("_prev") === 0, lit(null).cast("long"))
          .otherwise(
            when(col("n") >= col("_prev"), lit(1L)).otherwise(lit(-1L)) *
              expr("CAST(abs(n - _prev) * 1000000 div _prev AS BIGINT)"))
          .as("growth_ppm"))
      .orderBy(keyCol, "week")
  }

  /** HOUR-OF-WEEK seasonality profile per key: the 168-slot load shape
    * ("Mondays 9am run 3.2× the weekly average") that capacity plans
    * and anomaly baselines start from. index_ppm is the slot's share
    * of the key's volume scaled by 168 — exactly 1,000,000 means "an
    * average hour".
    *
    * Integer-exact: the slot is pmod(hour_id, 168) on the floored epoch
    * hour (exact pre-1970 too), counts are integers, and the index is
    * one `div` against the key total (both non-negative). Shape: ONE
    * partial-agg count on the (key, slot) pair — ≤ 168·|keys| rows
    * leave the map side — and the key total rides a key window over
    * that bounded table. Slots with zero events are absent (their
    * index is structurally 0; emitting 168·|keys| zero rows is the
    * consumer's cross join, not a corpus pass).
    *
    * Returns (keyCol, hour_of_week, n, index_ppm), slot-ordered. */
  def seasonalProfile(
      ev: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val slot = pmod(floor(epochSec(tsCol).cast("double") / lit(3600.0d)).cast("long"),
      lit(168L))
    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    ev.groupBy(col(keyCol), slot.as("hour_of_week"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_tot", sum(col("n")).over(wKey))
      .select(col(keyCol), col("hour_of_week"), col("n"),
        expr("CAST(n * 168 * 1000000 div _tot AS BIGINT)").as("index_ppm"))
      .orderBy(keyCol, "hour_of_week")
  }

  /** SEASONAL-NAIVE BACKTEST per key: score the one-week-ago forecast
    * (ŷ_h = y_{h−168}) against the one-hour-ago naive (ŷ_h = y_{h−1})
    * over the key's hourly volume series — the MASE-style "is there
    * real weekly seasonality worth modeling?" answer, computed entirely
    * in-engine. mase_ppm < 1,000,000 means the weekly pattern beats
    * persistence.
    *
    * Series are the DENSE per-key hour grid (zero-filled — skipping
    * quiet hours would score forecasts only when traffic happened);
    * the grid is calendar-bounded (8,760 rows/key-year) and built from
    * one 1-row-per-key min/max aggregate via sequence(). Errors are
    * integer |count − count| sums; the final ratio is one re-signed-
    * free div (both sums ≥ 0). Both lags come from ONE key window.
    * Eval hours are those with BOTH references in-grid (h ≥ lo+168).
    *
    * Returns (keyCol, n_eval, sae_seasonal, sae_naive, mase_ppm);
    * mase_ppm NULL when the naive error is zero (constant series). */
  def seasonalNaiveMase(
      ev: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val hcol = floor(epochSec(tsCol).cast("double") / lit(3600.0d)).cast("long")
    val counts = ev.groupBy(col(keyCol), hcol.as("_h")).agg(count(lit(1)).as("_c"))
    val bounds = counts.groupBy(col(keyCol))
      .agg(min(col("_h")).as("_lo"), max(col("_h")).as("_hi"))
    val grid = bounds
      .select(col(keyCol), explode(sequence(col("_lo"), col("_hi"))).as("_h"))
      .join(counts, Seq(keyCol.toString, "_h"), "left")
      .select(col(keyCol), col("_h"), coalesce(col("_c"), lit(0L)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_h"))
    grid
      .withColumn("_lag1", lag(col("_c"), 1).over(w))
      .withColumn("_lag168", lag(col("_c"), 168).over(w))
      .where(col("_lag168").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("_c") - col("_lag168"))).as("sae_seasonal"),
        sum(abs(col("_c") - col("_lag1"))).as("sae_naive"))
      .select(col(keyCol), col("n_eval"), col("sae_seasonal"), col("sae_naive"),
        when(col("sae_naive") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(sae_seasonal * 1000000 div sae_naive AS BIGINT)"))
          .as("mase_ppm"))
      .orderBy(keyCol)
  }

  /** LORENZ CURVE by user decile per key: rank each key's users by
    * their total spend (asc, user-id tie-break), cut into ntile(10),
    * and report each decile's cumulative share — the "bottom 80% of
    * users carry 12% of revenue" readout that [[concentration]]'s
    * scalar Gini summarizes. Cumulative by construction: decile 10 is
    * exactly 1,000,000.
    *
    * Integer-exact: per-user totals are micro-quantized sums, decile
    * sums are DECIMAL(38,0), and shares divide last (all operands
    * non-negative). ntile ties are impossible — the rank order
    * (total, user) is a total order. Shape: one (key, user) partial
    * agg, one key window pair (ntile + running sum) on the
    * users-bounded table, one (key, decile) agg reusing the key
    * exchange. Returns (keyCol, decile, n_users, decile_micro,
    * cum_share_ppm). */
  def lorenzDeciles(
      ev: DataFrame,
      buckets: Int = 10,
      keyCol: String = "event_type",
      userCol: String = "user_id",
      valueCol: String = "value"): DataFrame = {
    require(buckets >= 2, s"lorenzDeciles: need >= 2 buckets, got $buckets")
    val d = DecimalType(38, 0)
    val perUser = ev
      .where(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(userCol))
      .agg(sum(floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long"))
        .as("_v"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_v"), col(userCol))
    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("decile"))
    perUser
      .withColumn("decile", ntile(buckets).over(wRank))
      .groupBy(col(keyCol), col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("_v").cast(d)).as("_dv"))
      .withColumn("_tot", sum(col("_dv")).over(wKey))
      .withColumn("_cum", sum(col("_dv")).over(wCum))
      .select(col(keyCol), col("decile"), col("n_users"),
        col("_dv").cast("long").as("decile_micro"),
        when(col("_tot") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(_cum * 1000000 div _tot AS BIGINT)"))
          .as("cum_share_ppm"))
      .orderBy(keyCol, "decile")
  }

  /** CROSS-CORRELATION between two event types' hourly volumes at lags
    * −`maxLag`..+`maxLag` hours — the lead/lag discovery tool ("views
    * foreshadow purchases by how long?") that [[acfByKey]]'s
    * self-correlation can't answer. Positive lag correlates a's volume
    * at hour h with b's at h+lag (a LEADS b when positive lags win).
    *
    * Series are the DENSE hour grid [min h, max h] over both types
    * with structural zeros — skipping empty hours would silently
    * correlate only busy times. The grid is hours-bounded (a year is
    * 8,760 rows), built from one 1-row min/max aggregate via
    * sequence(); every per-lag moment pass runs on grid-sized tables.
    * Pearson arithmetic is the [[Stats.correlationMatrix]] contract:
    * integer counts, exact DECIMAL(38,0) moments, float only at
    * num/sqrt(d1·d2), round-6 (+0.0 folds −0.0).
    *
    * Shape: ONE corpus pass (filtered count per (type, hour) —
    * partial-agg'd), then everything is grid×lags-sized. Hour ids are
    * floor(epoch_s/3600), exact for pre-1970 too.
    *
    * Returns (lag, n_hours, corr); corr NULL when either series is
    * constant over the aligned window. */
  def crossCorrelation(
      ev: DataFrame,
      typeA: String = "view",
      typeB: String = "purchase",
      maxLag: Int = 2,
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(maxLag >= 0, s"crossCorrelation: need maxLag >= 0, got $maxLag")
    val d = DecimalType(38, 0)
    val hc = floor(epochSec(tsCol).cast("double") / lit(3600.0d)).cast("long")
    val counts = ev
      .where(col(typeCol).isin(typeA, typeB))
      .groupBy(hc.as("_h"), col(typeCol).as("_ty"))
      .agg(count(lit(1)).as("_c"))
    val bounds = counts.agg(min(col("_h")).as("_lo"), max(col("_h")).as("_hi"))
    val grid = bounds
      .select(explode(sequence(col("_lo"), col("_hi"))).as("_h"))
      .join(counts.where(col("_ty") === typeA).select(col("_h"), col("_c").as("_a")),
        Seq("_h"), "left")
      .join(counts.where(col("_ty") === typeB).select(col("_h"), col("_c").as("_b")),
        Seq("_h"), "left")
      .select(col("_h"),
        coalesce(col("_a"), lit(0L)).as("_a"), coalesce(col("_b"), lit(0L)).as("_b"))
    val lags = (-maxLag to maxLag).map(l =>
      struct(lit(l).as("lag")))
    val g2 = grid.select(col("_h").as("_h2"), col("_b").as("_b2"))
    grid
      .crossJoin(broadcast(
        grid.sparkSession.range(1).select(
          explode(array(lags: _*)).as("_l")).select(col("_l.lag").as("lag"))))
      .join(g2, col("_h2") === col("_h") + col("lag"))
      .groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("_a").cast(d)).as("_sa"), sum(col("_b2").cast(d)).as("_sb"),
        sum(col("_a").cast(d) * col("_a").cast(d)).as("_ssa"),
        sum(col("_b2").cast(d) * col("_b2").cast(d)).as("_ssb"),
        sum(col("_a").cast(d) * col("_b2").cast(d)).as("_sab"))
      .select(col("lag"), col("n_hours"), {
        val n = col("n_hours").cast(d)
        val num = n * col("_sab") - col("_sa") * col("_sb")
        val d1 = n * col("_ssa") - col("_sa") * col("_sa")
        val d2 = n * col("_ssb") - col("_sb") * col("_sb")
        when(d1 === 0 || d2 === 0, lit(null).cast("double"))
          .otherwise(round(num.cast("double") /
            sqrt(d1.cast("double") * d2.cast("double")), 6) + lit(0.0d))
          .as("corr")
      })
      .orderBy("lag")
  }

  /** TWAP — TIME-WEIGHTED average of a measure per key: each event's
    * value "holds" from its second until the next event's second on the
    * same key, so bursty seconds don't dominate the way a plain mean
    * lets them (the market-data TWAP construction, equally the right
    * average for any sampled gauge: queue depth, price, temperature).
    * The plain mean rides along so the report shows the burst bias.
    *
    * Determinism/exactness: values quantized to BIGINT micro-units
    * before anything else; hold durations come from `lead` over the
    * (second, tieCol) TOTAL order (same-second bursts get zero weight
    * except the last event of the second — a declared, reproducible
    * convention); the value·duration products sum in DECIMAL(38,0) and
    * divide last (integral `div`, operands non-negative by the micro
    * floor of non-negative measures — callers with signed measures get
    * floor-division semantics from Spark's `div` and must mirror it in
    * any oracle). The last event per key has no successor and carries
    * no weight — span and weight sums agree by construction.
    *
    * Shape: ONE hash exchange on the key; the lead window and the
    * final fold reuse it (no second shuffle — the aggregate runs on
    * the window's partitioning). At 100 TB parallelism = #keys and
    * per-key work is a linear scan; nothing global exists.
    *
    * Returns (keyCol, n_events, span_sec, weighted_sec, mean_micro,
    * twap_micro); twap NULL when every duration is zero. */
  def twap(
      ev: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    val d = DecimalType(38, 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_s"), col(tieCol))
    ev.select(col(keyCol), col(tieCol),
        epochSec(tsCol).as("_s"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .withColumn("_w", coalesce(lead(col("_s"), 1).over(w) - col("_s"), lit(0L)))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("_s")) - min(col("_s"))).as("span_sec"),
        sum(col("_w")).as("weighted_sec"),
        sum(col("_v").cast(d)).as("_sv"),
        sum(col("_v").cast(d) * col("_w").cast(d)).as("_svw"))
      .select(col(keyCol), col("n_events"), col("span_sec"), col("weighted_sec"),
        expr("CAST(_sv div CAST(n_events AS DECIMAL(38,0)) AS BIGINT)").as("mean_micro"),
        when(col("weighted_sec") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(_svw div CAST(weighted_sec AS DECIMAL(38,0)) AS BIGINT)"))
          .as("twap_micro"))
  }

  /** OHLC BARS — per key per fixed time bar: open/high/low/close of the
    * measure plus count and volume, the candlestick aggregation every
    * monitoring and market pipeline draws. Bar id is
    * floor(epoch_s / barSeconds) (exact for pre-1970 via the
    * floor(double) idiom shared with [[seasonalProfile]]).
    *
    * Open/close WITHOUT a window: `min(struct(sec, tie, v))` /
    * `max(struct(sec, tie, v))` — struct ordering is lexicographic and
    * (sec, tieCol) is a total order, so the first/last event per bar is
    * unique and the whole op is ONE partial-agg'd aggregate pair over
    * ONE hash exchange (struct buffers aren't hash-mutable so Spark
    * plans SortAggregate, but the PARTIAL half still runs map-side —
    * each partition collapses to ≤ #bars rows before the shuffle, and
    * the sorts are per-partition spillable, never a global sort or a
    * window). At 100 TB parallelism = #(key × bar) and a hot bar is
    * exactly what the partial agg absorbs. PlanSpec pins the shape.
    *
    * Returns (keyCol, bar, bar_start_sec, n_events, open/high/low/
    * close_micro, volume_micro), micro-quantized BIGINTs throughout. */
  def ohlcBars(
      ev: DataFrame,
      barSeconds: Long = 3600L,
      keyCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    require(barSeconds > 0, s"ohlcBars: need barSeconds > 0, got $barSeconds")
    val d = DecimalType(38, 0)
    val bar = floor(epochSec(tsCol).cast("double") / lit(barSeconds.toDouble)).cast("long")
    ev.select(col(keyCol), bar.as("bar"),
        epochSec(tsCol).as("_s"), col(tieCol).as("_t"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .groupBy(col(keyCol), col("bar"))
      .agg(
        count(lit(1)).as("n_events"),
        min(struct(col("_s"), col("_t"), col("_v"))).as("_first"),
        max(struct(col("_s"), col("_t"), col("_v"))).as("_last"),
        max(col("_v")).as("high_micro"),
        min(col("_v")).as("low_micro"),
        sum(col("_v").cast(d)).cast("long").as("volume_micro"))
      .select(col(keyCol), col("bar"),
        (col("bar") * barSeconds).as("bar_start_sec"),
        col("n_events"),
        col("_first._v").as("open_micro"), col("high_micro"), col("low_micro"),
        col("_last._v").as("close_micro"), col("volume_micro"))
  }

  /** HEAVY CHANGERS — the keys whose activity shifted most between the
    * first and second half of the observed time range: count per key
    * per half, delta = after − before, top-k by |delta| (delta-sketch
    * "heavy changers" are the streaming cousin; this is the exact batch
    * form). The midpoint is floor((min+max)/2) epoch seconds; an event
    * at exactly the midpoint counts as AFTER (half = sec > mid ? 1 : 0,
    * declared).
    *
    * Shape: one partial-agg count on (key, half) — map-side combine
    * collapses to ≤ 2·#keys rows — then a key-sized pivot fold and
    * TakeOrderedAndProject for the top-k (never a global sort of the
    * key table; the driver holds k rows). The range bounds come from a
    * 1-row aggregate broadcast-joined back, so the op stays lazy and
    * single-pass over the data. Ordering is total: |delta| desc, then
    * key asc. All-integer output.
    *
    * Returns topK rows of (keyCol, n_before, n_after, delta,
    * abs_delta). */
  def heavyChangers(
      ev: DataFrame,
      topK: Int = 20,
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(topK >= 1, s"heavyChangers: need topK >= 1, got $topK")
    val secs = ev.select(col(keyCol), epochSec(tsCol).as("_s"))
    val mid = secs.agg(
      floor((min(col("_s")) + max(col("_s"))).cast("double") / lit(2.0d))
        .cast("long").as("_mid"))
    secs
      .crossJoin(broadcast(mid))
      .groupBy(col(keyCol))
      .agg(
        sum(when(col("_s") <= col("_mid"), 1L).otherwise(0L)).as("n_before"),
        sum(when(col("_s") > col("_mid"), 1L).otherwise(0L)).as("n_after"))
      .withColumn("delta", col("n_after") - col("n_before"))
      .withColumn("abs_delta", abs(col("delta")))
      .orderBy(col("abs_delta").desc, col(keyCol).asc)
      .limit(topK)
  }

  /** DAILY GROWTH ACCOUNTING — the canonical active-user flow ledger
    * (new / retained / resurrected / churned) every growth team keeps:
    * per observed day, `active = new + retained + resurrected` exactly,
    * and `churned(d)` = users active on d−1 with no activity on d.
    * Consecutive-day retention is the declared grain (the standard
    * daily definition); a user skipping a day churns and later
    * RESURRECTS, never silently "retains across the gap".
    *
    * Shape: the corpus collapses ONCE to the distinct (user, day)
    * activity table — persisted, it feeds all four flows; first-seen is
    * a user-keyed partial agg; retained/churned are (user, day)
    * equi-joins of the table against its own day+1 shift (never a
    * window over the full corpus, never a per-user array). Everything
    * after the distinct is activity-table-sized. All counts integers.
    *
    * Returns (day, active, n_new, n_retained, n_resurrected,
    * n_churned) for each observed active day, day-ordered. */
  def growthAccounting(
      ev: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val day = floor(epochSec(tsCol).cast("double") / lit(86400.0d)).cast("long")
    val um = ev.select(col(userCol).as("_u"), day.as("_d")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val first = um.groupBy(col("_u")).agg(min(col("_d")).as("_fm"))
    val prevAct = um.select(col("_u"), (col("_d") + 1).as("_d"))
    val per = um
      .join(first, Seq("_u"))
      .join(prevAct.withColumn("_was", lit(1)), Seq("_u", "_d"), "left")
      .groupBy(col("_d").as("day"))
      .agg(count(lit(1)).as("active"),
        sum(when(col("_fm") === col("_d"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("_was").isNotNull, 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("_fm") < col("_d") && col("_was").isNull, 1L)
          .otherwise(0L)).as("n_resurrected"))
    val churn = prevAct.join(um, Seq("_u", "_d"), "left_anti")
      .groupBy(col("_d").as("day")).agg(count(lit(1)).as("n_churned"))
    per.join(churn, Seq("day"), "left")
      .withColumn("n_churned", coalesce(col("n_churned"), lit(0L)))
      .orderBy("day")
  }

  /** DAU/MAU STICKINESS — the product-health ratio boards ask for
    * daily: what fraction of the monthly audience shows up on a given
    * day? Rides [[rollingActiveUsers]]' interval-contribution trick at
    * a 28-day window (no windowed count-distinct, no day×user join),
    * ratio as one integral ppm (mau ≥ dau ≥ 1 on observed days by
    * construction). Returns (day, dau, mau, dau_mau_ppm), day-ordered. */
  def stickiness(
      ev: DataFrame,
      windowDays: Int = 28,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame =
    rollingActiveUsers(ev, windowDays, userCol, tsCol)
      .withColumnRenamed("wau", "mau")
      .withColumn("dau_mau_ppm",
        expr("CAST(dau * 1000000 div mau AS BIGINT)"))
      .orderBy("day")

  /** MILESTONE VELOCITY — how fast do users reach their 1st, 2nd, 3rd
    * conversion after first contact? The activation ladder growth teams
    * instrument ("day-N to first purchase" etc.), exact: day of the
    * n-th conversion (full (sec, tie) order decides WHICH event is
    * n-th; the reported distance is calendar days) minus the user's
    * first-activity day; per milestone the LOWER MEDIAN via
    * value-at-rank over the (days, user) total order — an exact
    * integer, never an interpolation.
    *
    * Shape: one user-keyed window ranks conversions, first contact is
    * a user partial agg, then ONE milestone-keyed exchange (≤
    * `maxMilestone` groups) carries the rank/count windows. Returns
    * (milestone, n_users, median_days, max_days), milestone-ordered. */
  def milestoneVelocity(
      ev: DataFrame,
      maxMilestone: Int = 3,
      convType: String = "purchase",
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    require(maxMilestone >= 1, s"milestoneVelocity: need maxMilestone >= 1, got $maxMilestone")
    import org.apache.spark.sql.expressions.Window
    val day = floor(epochSec(tsCol).cast("double") / lit(86400.0d)).cast("long")
    val first = ev.groupBy(col(userCol).as("_u")).agg(min(day).as("_f0"))
    val wU = Window.partitionBy(col("_u")).orderBy(col("_s"), col(tieCol))
    val conv = ev.where(col(typeCol) === convType)
      .select(col(userCol).as("_u"), epochSec(tsCol).as("_s"),
        day.as("_d"), col(tieCol))
      .withColumn("milestone", row_number().over(wU).cast("long"))
      .where(col("milestone") <= maxMilestone)
      .join(first, Seq("_u"))
      .select(col("milestone"), (col("_d") - col("_f0")).as("_days"), col("_u"))
    val wRank = Window.partitionBy(col("milestone"))
      .orderBy(col("_days"), col("_u"))
    val wCnt = Window.partitionBy(col("milestone"))
    conv
      .withColumn("_rn", row_number().over(wRank))
      .withColumn("_m", count(lit(1)).over(wCnt))
      .groupBy(col("milestone"))
      .agg(max(col("_m")).as("n_users"),
        max(when(col("_rn") === expr("CAST((_m + 1) div 2 AS INT)"), col("_days")))
          .as("median_days"),
        max(col("_days")).as("max_days"))
      .orderBy("milestone")
  }

  /** CHURN-DEFINITION SWEEP — every team argues over "inactive for N
    * days = churned"; this table settles it with data: for each
    * candidate threshold, how many users ever had a gap that long, and
    * how many of THOSE came back anyway (the false-churn rate — a
    * definition whose "churned" users mostly return is mislabeling
    * dormancy). The [[jaccardThresholdSweep]] pattern applied to
    * lifecycle policy.
    *
    * Per user the evidence is ONE pass: the MAX internal activity gap
    * (from a day-distinct lag window) and the FINAL SILENCE (snapshot
    * high-water mark minus last active day, right-censored). A user is
    * flagged at threshold T when either exceeds T; they RETURNED when
    * an internal gap exceeded T — every internal gap is followed by
    * activity by construction, so `false_churn_ppm = returned·10⁶ div
    * flagged` is exactly the share of T-flagged users history already
    * contradicts. All counts integer, the per-user table persists once
    * and serves every threshold. Returns (threshold_days, n_users,
    * n_flagged, n_returned, false_churn_ppm), threshold-ordered. */
  def churnDefinitionSweep(
      ev: DataFrame,
      thresholdsDays: Seq[Long] = Seq(3L, 7L, 14L),
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(thresholdsDays.nonEmpty, "churnDefinitionSweep: need thresholds")
    import org.apache.spark.sql.expressions.Window
    val day = floor(epochSec(tsCol).cast("double") / lit(86400.0d)).cast("long")
    val ud = ev.select(col(userCol).as("_u"), day.as("_d")).distinct()
    val w = Window.partitionBy(col("_u")).orderBy(col("_d"))
    val per = ud
      .withColumn("_g", col("_d") - lag(col("_d"), 1).over(w))
      .groupBy(col("_u"))
      .agg(max(coalesce(col("_g"), lit(0L))).as("_maxGap"),
        max(col("_d")).as("_last"))
    val hwm = per.agg(max(col("_last")).as("_hwm"))
    val enriched = per.crossJoin(broadcast(hwm))
      .select(col("_maxGap"), (col("_hwm") - col("_last")).as("_silence"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    thresholdsDays.sorted.map { t =>
      enriched.agg(count(lit(1)).as("n_users"),
        sum(when(col("_maxGap") > t || col("_silence") > t, 1L).otherwise(0L))
          .as("n_flagged"),
        sum(when(col("_maxGap") > t, 1L).otherwise(0L)).as("n_returned"))
        .select(lit(t).as("threshold_days"), col("n_users"),
          col("n_flagged"), col("n_returned"))
        .withColumn("false_churn_ppm",
          when(col("n_flagged") === 0, lit(null).cast("long"))
            .otherwise(expr("CAST(n_returned * 1000000 div n_flagged AS BIGINT)")))
    }.reduce(_ unionByName _)
  }

  /** CHAIN ENTROPY RATE per state, FLOOR-BITS — how predictable is the
    * next event given the current one? Complements [[markovStationary]]'s
    * occupancy and the p153 argmax: a state with 0 bits is a corridor
    * (one successor), log₂(k) bits is a fair die over k successors.
    * Engine-portable by the p65 surprisal convention: each transition's
    * surprisal is the INTEGER ⌊log₂(r/c)⌋ (bit-length gap with the
    * overshoot correction — no libm log whose last ulp could differ),
    * and the per-state rate is the count-weighted mean in milli-bits
    * with ONE integral division `Σc·bits·1000 div r`. A floor at every
    * term makes this a declared lower bound of the true Shannon rate —
    * the ORDERING across states (what the screen is for) is what it
    * preserves.
    *
    * Shape: one user-keyed lead window builds transitions; everything
    * after is types²-bounded. Returns (event_type, n_out, n_targets,
    * entropy_millibits), type-ordered. */
  def chainEntropy(
      ev: DataFrame,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_s"), col(tieCol))
    val trans = ev.select(col(keyCol), col(typeCol).as("_from"),
        epochSec(tsCol).as("_s"), col(tieCol))
      .withColumn("_to", lead(col("_from"), 1).over(w))
      .where(col("_to").isNotNull)
      .groupBy(col("_from"), col("_to")).agg(count(lit(1)).as("_c"))
    val outs = trans.groupBy(col("_from")).agg(sum(col("_c")).as("_r"),
      count(lit(1)).as("n_targets"))
    trans.join(outs, Seq("_from"))
      .withColumn("_k0", (length(bin(col("_r"))) - length(bin(col("_c")))).cast("int"))
      .withColumn("_bits",
        when(col("_r") < expr("shiftleft(_c, _k0)"), col("_k0") - 1)
          .otherwise(col("_k0")).cast("long"))
      .groupBy(col("_from").as(typeCol))
      .agg(max(col("_r")).as("n_out"), max(col("n_targets")).as("n_targets"),
        expr("CAST(sum(_c * _bits) * 1000 div max(_r) AS BIGINT)")
          .as("entropy_millibits"))
      .orderBy(typeCol)
  }

  /** INTERRUPTED TIME SERIES (segmented regression) — the
    * release-impact reading: fit separate exact OLS lines to the daily
    * value series BEFORE and AFTER a break day and report the slope
    * change and the LEVEL JUMP AT THE BREAK — the two coefficients an
    * ITS analysis reads (p203's DiD needs a control group; this is the
    * single-series variant).
    *
    * Integer-exact: the series is the per-day mean value in micro
    * (integral div of exact sums — day grain bounds the regression
    * table); each segment's OLS prediction at the break is ONE rational
    * `ŷ(b) = (Σy·Σxx − Σx·Σxy + (nΣxy − ΣxΣy)·b) div (nΣxx − (Σx)²)`
    * — DECIMAL(38,0) moments, a single re-signed integral division per
    * segment, no intermediate slope/intercept rounding compounding.
    * Slopes are the [[graft.ops.Stats.groupSlope]] re-signed ppm.
    * Segments need ≥ 2 distinct days. Returns ONE row
    * (n_days_pre, n_days_post, slope_pre_ppm, slope_post_ppm,
    * slope_change_ppm, level_pre_at_break_micro,
    * level_post_at_break_micro, level_change_micro). */
  def interruptedSeries(
      ev: DataFrame,
      breakAfterDays: Long = 15L,
      valueCol: String = "value",
      tsCol: String = "ts"): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val day = floor(epochSec(tsCol).cast("double") / lit(86400.0d)).cast("long")
    // value ≥ 0 keeps the daily-mean `div` truncation == DuckDB's
    // floor `//` (the re-sign rule); the moment arithmetic below is
    // fully re-signed and sign-safe
    val base = ev.where(col(valueCol).isNotNull && col(valueCol) >= 0)
      .select(day.as("_d"),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
    val daily = base.groupBy(col("_d"))
      .agg(expr("CAST(sum(CAST(_v AS DECIMAL(38,0))) div count(1) AS BIGINT)").as("_y"))
    val cut = daily.agg((min(col("_d")) + breakAfterDays).as("_cut"))
    val seg = daily.crossJoin(broadcast(cut))
      .select((col("_d") - col("_cut")).as("_x"), col("_y"),
        (col("_d") < col("_cut")).as("_pre"))
    def fit(pre: Boolean, suffix: String) =
      seg.where(col("_pre") === pre)
        .agg(count(lit(1)).as(s"n_days_$suffix"),
          sum(col("_x").cast(d)).as("_sx"),
          sum(col("_y").cast(d)).as("_sy"),
          sum(col("_x").cast(d) * col("_x").cast(d)).as("_sxx"),
          sum(col("_x").cast(d) * col("_y").cast(d)).as("_sxy"))
        .selectExpr(s"n_days_$suffix",
          s"CAST(n_days_$suffix AS DECIMAL(38,0)) * _sxy - _sx * _sy AS _num",
          s"CAST(n_days_$suffix AS DECIMAL(38,0)) * _sxx - _sx * _sx AS _den",
          "_sy * _sxx - _sx * _sxy AS _lvlnum")
        .selectExpr(s"n_days_$suffix",
          s"CASE WHEN n_days_$suffix < 2 OR _den = 0 THEN NULL ELSE " +
            "CAST(CASE WHEN _num >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
            s"CAST(abs(_num) * 1000000 div _den AS BIGINT) END AS slope_${suffix}_ppm",
          // ŷ at the break (x = 0): _lvlnum div _den — the OLS intercept
          s"CASE WHEN n_days_$suffix < 2 OR _den = 0 THEN NULL ELSE " +
            "CAST(CASE WHEN _lvlnum >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
            s"CAST(abs(_lvlnum) div _den AS BIGINT) END AS level_${suffix}_at_break_micro")
    fit(pre = true, "pre").crossJoin(fit(pre = false, "post"))
      .withColumn("slope_change_ppm",
        col("slope_post_ppm") - col("slope_pre_ppm"))
      .withColumn("level_change_micro",
        col("level_post_at_break_micro") - col("level_pre_at_break_micro"))
      .select("n_days_pre", "n_days_post", "slope_pre_ppm", "slope_post_ppm",
        "slope_change_ppm", "level_pre_at_break_micro",
        "level_post_at_break_micro", "level_change_micro")
  }

  /** OVER-DISPERSION INDEX per event type — variance-to-mean ratio of
    * the DAILY COUNT series (index of dispersion): 1.0 = Poisson
    * arrivals, ≫ 1 = bursty/clumped, ≪ 1 = regularized — the one
    * number that says whether rate alerts can assume Poisson noise.
    * Population variance over the observed days, all DECIMAL(38,0)
    * moments, ratio as ONE integral ppm division (variance numerator
    * n·Σc² − (Σc)² over denominator n·Σc — mean > 0 by construction
    * since every observed day has ≥ 1 event). Types need ≥ `minDays`
    * observed days. Returns (event_type, n_days, total, dispersion_ppm),
    * type-ordered. */
  def dispersionIndex(
      ev: DataFrame,
      minDays: Long = 5L,
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val day = floor(epochSec(tsCol).cast("double") / lit(86400.0d)).cast("long")
    ev.where(col(typeCol).isNotNull)
      .groupBy(col(typeCol), day.as("_d"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("_c")).as("total"),
        sum(col("_c").cast(d) * col("_c").cast(d)).as("_sc2"))
      .where(col("n_days") >= minDays)
      .selectExpr(typeCol, "n_days", "total",
        "CAST((CAST(n_days AS DECIMAL(38,0)) * _sc2 - " +
          "CAST(total AS DECIMAL(38,0)) * total) * 1000000 div " +
          "(CAST(n_days AS DECIMAL(38,0)) * total) AS BIGINT) AS dispersion_ppm")
      .orderBy(typeCol)
  }

  /** PURCHASE-REGULARITY SEGMENTS — the repeat-behavior classifier CRM
    * teams run: per user, the coefficient of variation of consecutive
    * purchase gaps. CV ≈ 0 = clockwork subscriber; CV ≈ 1 = Poisson
    * (memoryless); CV ≫ 1 = bursty. Segments cut at the declared ppm
    * boundaries (< 0.5 `regular`, < 1.0 `variable`, else `bursty`).
    *
    * Integer-exact: gaps are epoch-second diffs from ONE user-keyed
    * lag window; the sample variance is an integral division of
    * DECIMAL(38,0) moments and sd its exact floor isqrt (the
    * [[graft.ops.Stats.neymanAllocation]] guess+correct recipe);
    * cv_ppm = sd·10⁶ div mean (mean > 0 — equal-second purchases
    * collapse to gap 0 rows but a zero MEAN means a degenerate clock,
    * declared NULL). Users need ≥ `minGaps` gaps. Returns (user_id,
    * n_gaps, mean_gap_sec, sd_gap_sec, cv_ppm, segment), user-ordered. */
  def purchaseRegularity(
      ev: DataFrame,
      minGaps: Long = 3L,
      convType: String = "purchase",
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col("_s"), col(tieCol))
    val gaps = ev.where(col(typeCol) === convType)
      .select(col(userCol), epochSec(tsCol).as("_s"), col(tieCol))
      .withColumn("_g", col("_s") - lag(col("_s"), 1).over(w))
      .where(col("_g").isNotNull)
    gaps.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("_g").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("_sg"),
        sum(col("_g").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("_g").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("_sg2"))
      .where(col("n_gaps") >= minGaps)
      .selectExpr("*",
        "CAST(_sg div n_gaps AS BIGINT) AS mean_gap_sec",
        "CASE WHEN n_gaps < 2 THEN CAST(0 AS DECIMAL(38,0)) ELSE " +
          "(CAST(n_gaps AS DECIMAL(38,0)) * _sg2 - _sg * _sg) div " +
          "(CAST(n_gaps AS DECIMAL(38,0)) * (n_gaps - 1)) END AS _var")
      .selectExpr("*",
        "CAST(floor(sqrt(CAST(_var AS DOUBLE))) AS BIGINT) AS _g0")
      .selectExpr(userCol, "n_gaps", "mean_gap_sec",
        "CASE WHEN CAST(_g0 + 1 AS DECIMAL(38,0)) * (_g0 + 1) <= _var THEN _g0 + 1 " +
          "WHEN CAST(_g0 AS DECIMAL(38,0)) * _g0 > _var THEN _g0 - 1 " +
          "ELSE _g0 END AS sd_gap_sec")
      .withColumn("cv_ppm",
        when(col("mean_gap_sec") <= 0, lit(null).cast("long"))
          .otherwise(expr("CAST(sd_gap_sec * 1000000 div mean_gap_sec AS BIGINT)")))
      .withColumn("segment",
        when(col("cv_ppm").isNull, lit("degenerate"))
          .when(col("cv_ppm") < 500000L, lit("regular"))
          .when(col("cv_ppm") < 1000000L, lit("variable"))
          .otherwise(lit("bursty")))
      .orderBy(userCol)
  }

  /** MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. / the standard
    * "Markov chain attribution" of marketing analytics) — how much
    * conversion probability disappears if a channel is deleted from the
    * journey graph? Unlike last-touch (p66) or position credits (p183),
    * this prices a channel by its STRUCTURAL role: an assist channel
    * that never finishes journeys still shows a large removal effect.
    *
    * Model: per user, the journey is the event sequence up to and
    * including the FIRST conversion (the p41 first-conversion
    * convention); states are START → touches → CONV/NULL absorbers.
    * Conversion probability is `rounds` synchronous ppm power
    * iterations (truncating integer division per move — deterministic
    * on any engine; mass not yet absorbed after `rounds` is simply
    * unreported, a declared lower-bound truncation, same convention as
    * [[markovStationary]]). Channel removal deletes the channel's
    * out-edges and redirects its in-edges to NULL (the standard
    * removal-effect graph surgery). Effect = (P_base − P_removed)·10⁶
    * div P_base.
    *
    * Shape: ONE user-keyed window pass builds the edge list; the edge
    * table is (channels+1)·(channels+2)-bounded and the iteration runs
    * driver-side on those few dozen integers (the bounded-collect
    * precedent of the k-means centroid sums — kilobytes, exact BigInt
    * arithmetic). Returns (channel, p_base_ppm, p_removed_ppm,
    * removal_effect_ppm), channel-ordered. */
  def markovAttribution(
      ev: DataFrame,
      channels: Seq[String],
      convType: String = "purchase",
      rounds: Int = 8,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    require(channels.nonEmpty, "markovAttribution: need at least one channel")
    require(!channels.contains(convType),
      s"markovAttribution: conversion type $convType cannot be a channel")
    require(rounds >= 1, s"markovAttribution: need rounds >= 1, got $rounds")
    import org.apache.spark.sql.expressions.Window
    val START = "_START_"
    val NUL = "_NULL_"
    val base = ev.select(col(userCol).as("_u"), col(typeCol).as("_t"),
      epochSec(tsCol).as("_s"), col(tieCol).as("_i"))
    val firstConv = base.where(col("_t") === convType)
      .groupBy(col("_u")).agg(min(struct(col("_s"), col("_i"))).as("_fc"))
    val kept = base.join(firstConv, Seq("_u"), "left")
      .where(col("_fc").isNull || struct(col("_s"), col("_i")) <= col("_fc"))
    val w = Window.partitionBy(col("_u")).orderBy(col("_s"), col("_i"))
    val seq = kept
      .withColumn("_rn", row_number().over(w))
      .withColumn("_next", lead(col("_t"), 1).over(w))
    val edges = seq.where(col("_rn") === 1)
      .select(lit(START).as("_f"), col("_t").as("_to"))
      .unionByName(seq.where(col("_next").isNotNull)
        .select(col("_t").as("_f"), col("_next").as("_to")))
      .unionByName(seq.where(col("_next").isNull && col("_t") =!= convType)
        .select(col("_t").as("_f"), lit(NUL).as("_to")))
      .groupBy(col("_f"), col("_to")).agg(count(lit(1)).as("_c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def pConv(es: Map[(String, String), Long]): Long = {
      val out = es.toSeq.groupBy(_._1._1).map { case (f, xs) => f -> xs.map(_._2).sum }
      var pi = Map[String, BigInt](START -> BigInt(1000000L)).withDefaultValue(BigInt(0))
      var conv = BigInt(0)
      for (_ <- 1 to rounds) {
        val next = scala.collection.mutable.Map[String, BigInt]().withDefaultValue(BigInt(0))
        for (((f, t), c) <- es) {
          val m = pi(f)
          if (m > 0) {
            val moved = m * c / out(f) // integer truncation, order-free sums
            if (t == convType) conv += moved
            else if (t == NUL) () // absorbed, unreported
            else next(t) += moved
          }
        }
        pi = next.toMap.withDefaultValue(BigInt(0))
      }
      conv.toLong
    }
    val pBase = pConv(edges)
    val rows = channels.sorted.map { ch =>
      val removed = edges
        .filter { case ((f, _), _) => f != ch }
        .groupBy { case ((f, t), _) => (f, if (t == ch) NUL else t) }
        .map { case (k, xs) => k -> xs.values.sum }
      val pR = pConv(removed)
      // re-signed magnitude division: a truncation-rounding artifact can
      // push pR a hair past pBase, and Scala / truncates where DuckDB
      // // floors — they agree only on non-negative operands
      val eff = if (pBase == 0) null
        else {
          val diff = pBase - pR
          val sgn = if (diff >= 0) 1L else -1L
          java.lang.Long.valueOf(sgn * (math.abs(diff) * 1000000L / pBase))
        }
      (ch, pBase, pR, eff)
    }
    ev.sparkSession.createDataFrame(
      ev.sparkSession.sparkContext.parallelize(rows.map {
        case (c, b, r, e) => org.apache.spark.sql.Row(c, b, r,
          if (e == null) null else e.longValue())
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("channel",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("p_base_ppm",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("p_removed_ppm",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("removal_effect_ppm",
          org.apache.spark.sql.types.LongType, nullable = true))))
      .orderBy("channel")
  }

  /** CALIBRATION BACKTEST — does a rate model fitted on the train
    * window still hold out of sample? The train period's per-bucket
    * conversion rate is the "model"; each bucket's eval-period actual
    * is the test; the eval-count-weighted mean absolute gap is the
    * expected calibration error (ECE — the standard binned definition,
    * with the bins scored out-of-time instead of in-sample, which is
    * the honest version: in-sample binned calibration of empirical
    * rates is zero by construction).
    *
    * Integer-exact: day-grain split at `minDay + trainDays` (the min
    * rides a 1-row broadcast), buckets = value_micro div
    * `bucketWidthMicro`, rates and gaps in integral ppm; buckets need
    * `minTrainN` train rows (no rate evidence otherwise) and ≥ 1 eval
    * row. ONE partial agg on (bucket, period) then bucket-bounded
    * joins. Returns (bucket, n_train, rate_train_ppm, n_eval,
    * rate_eval_ppm, gap_ppm, ece_ppm) — ece repeated per row (it is
    * the table's headline), bucket-ordered. */
  def calibrationBacktest(
      ev: DataFrame,
      trainDays: Long = 20L,
      bucketWidthMicro: Long = 10000000L,
      minTrainN: Long = 20L,
      typeCol: String = "event_type",
      valueCol: String = "value",
      tsCol: String = "ts"): DataFrame = {
    val day = floor(epochSec(tsCol).cast("double") / lit(86400.0d)).cast("long")
    val base = ev
      // value ≥ 0: the truncating `div` bucket matches DuckDB's floor
      // `//` only on non-negative operands (the re-sign rule)
      .where(col(valueCol).isNotNull && col(valueCol) >= 0 &&
        col(typeCol).isNotNull)
      .select(day.as("_d"),
        expr(s"CAST(CAST(floor(CAST($valueCol AS DOUBLE) * 1000000) AS BIGINT) " +
          s"div $bucketWidthMicro AS BIGINT)").as("bucket"),
        (col(typeCol) === "purchase").as("_y"))
    val cut = base.agg((min(col("_d")) + trainDays).as("_cut"))
    val flagged = base.crossJoin(broadcast(cut))
      .withColumn("_train", col("_d") < col("_cut"))
    def rates(train: Boolean, nName: String, rName: String) =
      flagged.where(col("_train") === train)
        .groupBy("bucket")
        .agg(count(lit(1)).as(nName),
          sum(when(col("_y"), 1L).otherwise(0L)).as("_p"))
        .withColumn(rName, expr(s"CAST(_p * 1000000 div $nName AS BIGINT)"))
        .drop("_p")
    val joined = rates(train = true, "n_train", "rate_train_ppm")
      .where(col("n_train") >= minTrainN)
      .join(rates(train = false, "n_eval", "rate_eval_ppm"), Seq("bucket"))
      .withColumn("gap_ppm", abs(col("rate_train_ppm") - col("rate_eval_ppm")))
    val ece = joined.agg(
      expr("CAST(sum(n_eval * gap_ppm) div sum(n_eval) AS BIGINT)").as("ece_ppm"))
    joined.crossJoin(broadcast(ece))
      .select("bucket", "n_train", "rate_train_ppm", "n_eval",
        "rate_eval_ppm", "gap_ppm", "ece_ppm")
      .orderBy("bucket")
  }

  /** Robust per-user value trend — [[graft.ops.Stats.theilSenSlope]]
    * over (epoch-second, value) with the shared ts idiom: the lower
    * median of pairwise slopes shrugs off the single wild purchase that
    * drags [[groupTrend]]'s OLS line. Per-user pair cost is O(g²) under
    * the bounded-group contract (event series per user). Returns
    * (user_id, n, n_pairs, slope_ppm). */
  def theilSenTrend(
      ev: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      minN: Long = 3L): DataFrame =
    Stats.theilSenSlope(
      ev.where(col(valueCol).isNotNull)
        .select(col(userCol), epochSec(tsCol).as("_sec"), col(valueCol)),
      userCol, "_sec", valueCol, minN)
}
