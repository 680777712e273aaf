package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

/** Pareto frontier (dominance semantics incl. duplicate survival) and
  * the exact correlation matrix (perfect/anti/constant columns). */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("paretoFrontier: keeps the frontier, keeps exact duplicates, drops both dominance cases") {
    import spark.implicits._
    // (id, x minimize, y maximize)
    val pts = Seq(
      (1L, 10L, 5L), (2L, 10L, 5L), // exact duplicates — neither dominates, BOTH kept
      (3L, 10L, 4L),                // dominated same-x (y strictly below the x=10 max)
      (4L, 20L, 5L),                // dominated by x=10,y=5 (cheaper, same y)
      (5L, 20L, 6L),                // kept: more y than anything cheaper
      (6L, 30L, 6L),                // dominated by (20, 6): cheaper, same y
      (7L, 5L, 1L),                 // kept: cheapest overall
      (8L, 30L, 7L)                 // kept: global max y
    ).toDF("id", "x", "y")
    val out = Stats.paretoFrontier(pts, "x", "y")
      .orderBy("x", "id").select("id").as[Long].collect()
    assert(out.toSeq == Seq(7L, 1L, 2L, 5L, 8L))
  }

  test("paretoFrontier: empty input yields empty frontier") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "x", "y")
    assert(Stats.paretoFrontier(empty, "x", "y").count() == 0L)
  }

  test("correlationMatrix: perfect, anti, and mixed pairs are exact; constant column is NULL") {
    import spark.implicits._
    val df = Seq(
      (1.0, 2.0, -1.0, 7.0),
      (2.0, 4.0, -2.0, 7.0),
      (3.0, 6.0, -3.0, 7.0),
      (4.0, 8.0, -4.0, 7.0)
    ).toDF("x", "y", "z", "w")
    val out = Stats.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .orderBy("col_a", "col_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // sorted cols: w, x, y, z → pairs in that order
    assert(out.toSeq == Seq(
      ("w", "x", 4L, None), ("w", "y", 4L, None), ("w", "z", 4L, None),
      ("x", "y", 4L, Some(1.0)), ("x", "z", 4L, Some(-1.0)),
      ("y", "z", 4L, Some(-1.0))))
  }

  test("correlationMatrix: rows with any NULL are excluded from every pair (shared n)") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(1.0), Some(5.0)),
      (Some(2.0), Some(2.0), None), // listwise-deleted everywhere
      (Some(3.0), Some(3.0), Some(1.0))
    ).toDF("a", "b", "c")
    val out = Stats.correlationMatrix(df, Seq("a", "b", "c"))
      .orderBy("col_a", "col_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq(
      ("a", "b", 2L, Some(1.0)), ("a", "c", 2L, Some(-1.0)),
      ("b", "c", 2L, Some(-1.0))))
  }

  test("rankReport: tie semantics of every rank flavor, singleton NULLs") {
    import spark.implicits._
    val df = Seq(
      ("g", 1L, 10.0), ("g", 2L, 10.0), ("g", 3L, 20.0),
      ("h", 9L, 5.0)
    ).toDF("grp", "id", "v")
    val out = Stats.rankReport(df, "grp", "v", "id", nTiles = 2)
      .orderBy("grp", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getLong(7),
        if (r.isNullAt(8)) None else Some(r.getLong(8))))
    assert(out.toSeq == Seq(
      // peers at 10.0 share rank/dense/cume but split row_number/ntile
      ("g", 1L, 10000000L, 1, 1, 1, 1, 666666L, Some(0L)),
      ("g", 2L, 10000000L, 2, 1, 1, 1, 666666L, Some(0L)),
      ("g", 3L, 20000000L, 3, 3, 2, 2, 1000000L, Some(1000000L)),
      // 1-row group: cume 1.0, percent_rank NULL (0/0 undefined)
      ("h", 9L, 5000000L, 1, 1, 1, 1, 1000000L, None)))
  }

  test("neymanAllocation: volatile stratum takes the budget, exact sum") {
    import spark.implicits._
    val df = Seq(
      ("a", 0.0), ("a", 2.0),   // var = 2e12 micro² → sd = isqrt = 1414213
      ("b", 5.0), ("b", 5.0),   // constant → sd 0
      ("c", 9.0)                // singleton → sd 0 (declared)
    ).toDF("stratum", "v")
    val out = Stats.neymanAllocation(df, "stratum", "v", totalN = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 2L, 1414213L, 10L), ("b", 2L, 0L, 0L), ("c", 1L, 0L, 0L)))
    assert(out.map(_._4).sum == 10L)
    // exact isqrt: 1414213² ≤ 2e12 < 1414214²
    assert(1414213L * 1414213L <= 2000000000000L)
    assert(1414214L * 1414214L > 2000000000000L)
  }

  test("groupSlope: exact slope ppm, degenerate x NULL, min-n floor") {
    import spark.implicits._
    val df = Seq(
      // key a: y = 2x exactly → slope 2e6 ppm
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
      // key b: constant x → NULL slope
      ("b", 5.0, 1.0), ("b", 5.0, 9.0),
      // key c: below minN → dropped
      ("c", 1.0, 1.0)
    ).toDF("k", "x", "y")
    val out = Stats.groupSlope(df, "k", "x", "y", minN = 2L)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(out.toSeq == Seq(("a", 3L, Some(2000000L)), ("b", 2L, None)))
  }

  test("spearmanMatrix: monotone-nonlinear hits 1, average ranks under ties, hand value") {
    import spark.implicits._
    // y = x² is monotone → ρ = 1 even though Pearson < 1; z is a
    // permuted column with ranks (1,3,2) against x's (1,2,3):
    // cov 1, var 2 each → ρ = 0.5 exactly
    val df = Seq(
      (1.0, 1.0, 10.0), (2.0, 4.0, 30.0), (3.0, 9.0, 20.0)
    ).toDF("x", "y", "z")
    val out = Stats.spearmanMatrix(df, Seq("x", "y", "z"))
      .orderBy("col_a", "col_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("x", "y", 3L, 1.0), ("x", "z", 3L, 0.5), ("y", "z", 3L, 0.5)))
    // tied block takes the average of the positions it spans: doubled
    // ranks stay integral so the perfect anti-monotone pair is exactly −1
    val ties = Seq((1.0, 4.0), (2.0, 3.0), (2.0, 3.0), (3.0, 1.0))
      .toDF("a", "b")
    val r2 = Stats.spearmanMatrix(ties, Seq("a", "b")).collect()
    assert(r2.length == 1 && r2(0).getDouble(3) == -1.0)
  }

  test("etaSquared: perfect separation 1e6, identical groups 0, constant NULL") {
    import spark.implicits._
    val perfect = Seq(("a", 1.0), ("a", 1.0), ("b", 3.0), ("b", 3.0)).toDF("g", "v")
    assert(Stats.etaSquared(perfect, "g", "v").collect()(0).getLong(2) == 1000000L)
    val flat = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    assert(Stats.etaSquared(flat, "g", "v").collect()(0).getLong(2) == 0L)
    val const = Seq(("a", 5.0), ("b", 5.0)).toDF("g", "v")
    assert(Stats.etaSquared(const, "g", "v").collect()(0).isNullAt(2))
  }

  test("qiniTable: per-tile uplift signs and the cumulative qini collapse") {
    import spark.implicits._
    val df = Seq(
      // tile 1: treated 1/2 convert, control 0/2
      (8.0, true, true, 1L), (7.0, false, true, 2L),
      (6.0, false, false, 3L), (5.0, false, false, 4L),
      // tile 2: treated 0/2, control 1/2 — negative uplift
      (4.0, false, true, 5L), (3.0, false, true, 6L),
      (2.0, true, false, 7L), (1.0, false, false, 8L)
    ).toDF("s", "y", "tr", "id")
    val out = Stats.qiniTable(df, "s", "y", "tr", "id", nTiles = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 2L, 0L, 500000L, 1000000L),
      // balanced overall: the full-corpus qini closes at exactly 0
      (2L, 2L, 0L, 2L, 1L, -500000L, 0L)))
  }

  test("aucExact: perfect separation 1e6, tie pays exactly half credit, one-class NULL") {
    import spark.implicits._
    val perfect = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("s", "y")
    assert(Stats.aucExact(perfect, "s", "y").collect()(0).getLong(3) == 1000000L)
    // pairs: (1,1) tie ½, (1,2) 0, (3,1) 1, (3,2) 1 → 2.5/4 = 625000
    val tied = Seq((1.0, true), (3.0, true), (1.0, false), (2.0, false))
      .toDF("s", "y")
    val t = Stats.aucExact(tied, "s", "y").collect()(0)
    assert((t.getLong(0), t.getLong(1), t.getLong(2), t.getLong(3)) ==
      ((4L, 2L, 2L, 625000L)))
    val oneClass = Seq((1.0, true), (2.0, true)).toDF("s", "y")
    assert(Stats.aucExact(oneClass, "s", "y").collect()(0).isNullAt(3))
  }

  test("gainsTable: top tile captures the positives, lifts reconcile to the base rate") {
    import spark.implicits._
    val df = (1 to 10).map { i =>
      val score = 11.0 - i // 10 down to 1
      (score, Set(10.0, 9.0, 6.0).contains(score), i.toLong)
    }.toDF("score", "lbl", "id")
    val out = Stats.gainsTable(df, "score", "lbl", "id", nTiles = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 666666L, 3333333L, 3333333L),
      (2L, 2L, 0L, 666666L, 0L, 1666666L),
      (3L, 2L, 1L, 1000000L, 1666666L, 1666666L),
      (4L, 2L, 0L, 1000000L, 0L, 1250000L),
      (5L, 2L, 0L, 1000000L, 0L, 1000000L)))
    // the bottom row's cumulative lift is exactly the base rate (1e6)
    assert(out.last._6 == 1000000L)
  }

  test("isotonicCalibration: violator pools with its left neighbor, fit matches hand PAVA") {
    import spark.implicits._
    // bucket rates 0.5 / 0.0 / 1.0 — PAVA pools the first two to 0.25
    val rows =
      Seq.fill(2)((5.0, true)) ++ Seq.fill(2)((5.0, false)) ++
        Seq.fill(4)((15.0, false)) ++ Seq.fill(4)((25.0, true))
    val out = Stats.isotonicCalibration(rows.toDF("x", "lbl"), "x", "lbl")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 4L, 2L, 500000L, 250000L),
      (1L, 4L, 0L, 0L, 250000L),
      (2L, 4L, 4L, 1000000L, 1000000L)))
    // the fit is nondecreasing by construction
    assert(out.map(_._5).sliding(2).forall(p => p.head <= p.last))
  }

  test("cvmDrift: hand value on a one-point shift, identical halves score 0") {
    import spark.implicits._
    val df = Seq((1.0, true), (2.0, true), (1.0, false), (3.0, false))
      .toDF("v", "side")
    val r = Stats.cvmDrift(df, "v", "side").collect()(0)
    // num = 1·(2·2 − 2·1)² = 4 → 4e6 / (2·2·16) = 62500
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 62500L)))
    val same = Seq((1.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("v", "side")
    assert(Stats.cvmDrift(same, "v", "side").collect()(0).getLong(2) == 0L)
  }

  test("effectiveSampleSize: uniform weights hit 1e6 ppm, one heavy weight collapses it") {
    import spark.implicits._
    val uniform = Seq(4L, 4L, 4L).toDF("w")
    val u = Stats.effectiveSampleSize(uniform, "w").collect()(0)
    assert((u.getLong(0), u.getLong(1), u.getLong(2), u.getLong(3)) ==
      ((3L, 12L, 3L, 1000000L)))
    // (1, 1, 1000): ESS = 1002²/1000002 = 1 — the corpus is one document
    val degenerate = Seq(1L, 1L, 1000L, 0L).toDF("w") // zero weight ignored
    val g = Stats.effectiveSampleSize(degenerate, "w").collect()(0)
    assert((g.getLong(0), g.getLong(2), g.getLong(3)) == ((3L, 1L, 334667L)))
  }

  test("giniSplit: perfect separator wins, hand-computed purity ladder, no empty right side") {
    import spark.implicits._
    val df = Seq(
      (1.0, false), (2.0, false), (3.0, false), (10.0, true), (11.0, true)
    ).toDF("x", "lbl")
    val out = Stats.giniSplit(df, "x", "lbl", topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      // x ≤ 3 separates perfectly: purity 9/3 + 4/2 = 5e6 ppm
      (3000000L, 3L, 0L, 2L, 2L, 5000000L),
      (2000000L, 2L, 0L, 3L, 2L, 3666666L),
      (10000000L, 4L, 1L, 1L, 1L, 3500000L),
      (1000000L, 1L, 0L, 4L, 2L, 3000000L)))
    // the max x never appears (its right side would be empty)
    assert(!out.exists(_._1 == 11000000L))
  }

  test("theilSenSlope: lower-median pair slope shrugs off the outlier") {
    import spark.implicits._
    val df = Seq(
      // group a: slopes {1.0, 4.5, 8.0} ppm-scaled → lower median 4.5e6;
      // OLS on the same points would report 4.5 too — but pull y3 to
      // 100 and OLS explodes while the pair-slope median barely moves
      ("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 3.0, 10.0),
      // group b: all x equal → zero distinct-x pairs → absent
      ("b", 5.0, 1.0), ("b", 5.0, 2.0), ("b", 5.0, 3.0),
      // group c: below minN → absent
      ("c", 1.0, 1.0), ("c", 2.0, 2.0)
    ).toDF("k", "x", "y")
    val out = Stats.theilSenSlope(df, "k", "x", "y", minN = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", 3L, 3L, 4500000L)))
    // negative trend re-signs exactly: y = -2x → every slope −2e6
    val neg = Seq(("n", 1.0, -2.0), ("n", 2.0, -4.0), ("n", 3.0, -6.0))
      .toDF("k", "x", "y")
    val n = Stats.theilSenSlope(neg, "k", "x", "y").collect()
    assert(n.length == 1 && n(0).getLong(3) == -2000000L)
  }

  test("kendallTau: hand-counted concordance and the tie-corrected zero") {
    import spark.implicits._
    // (1,1),(2,3),(3,2): C=2, D=1, no ties → τ = 1/3
    val df = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0)).toDF("x", "y")
    val out = Stats.kendallTau(df, "x", "y").collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) == ((3L, 2L, 1L)))
    assert(out.getDouble(3) == 0.333333)
    // balanced 2×2 grid: one concordant, one discordant, x/y ties
    // excluded from both → τ-b = 0 with the tie-corrected denominator
    val grid = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0)).toDF("x", "y")
    val g = Stats.kendallTau(grid, "x", "y").collect()(0)
    assert((g.getLong(1), g.getLong(2), g.getDouble(3)) == ((1L, 1L, 0.0)))
  }

  test("nnMatchAtt: closest in-caliper control wins, id tie-break, out-of-caliper treated absent, controls reusable") {
    import spark.implicits._
    val units = Seq(
      // (id, treated, score_micro, y_micro)
      (1L, true, 100L, 1000L),   // best control: 11 (d20) over 10 (d50)
      (2L, true, 900L, 500L),    // only 12 in caliper (d100)
      (3L, true, 5000L, 0L),     // nothing within 200 → absent
      (4L, true, 500L, 900L),    // tie d20 both sides → min control id 13
      (5L, true, 130L, 600L),    // reuses 11 (d10) — with replacement
      (10L, false, 150L, 800L),
      (11L, false, 120L, 300L),
      (12L, false, 1000L, 450L),
      (13L, false, 480L, 100L),
      (14L, false, 520L, 200L)
    ).toDF("id", "treated", "score_micro", "y_micro")
    val out = Stats.nnMatchAtt(units, "id", "treated", "score_micro", "y_micro",
        caliperMicro = 200L)
      .orderBy("treated_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 11L, 20L, 700L),
      (2L, 12L, 100L, 50L),
      (4L, 13L, 20L, 800L),
      (5L, 11L, 10L, 300L)))
    // ATT over the table: (700 + 50 + 800 + 300) / 4
    assert(out.map(_._4).sum / out.length == 462L)
  }

  test("mannWhitney: scipy-checked tie-corrected z², exact doubled statistics") {
    import spark.implicits._
    // a = [1,2,3,4], b = [3,5,6,7,8]: ranks 1,2,3.5,5 | 3.5,6,7,8,9
    // R1 = 11.5, U1 = 1.5, ties: one block of 2 (ΣT = 6)
    // scipy.stats.mannwhitneyu: z = -2.0909…, z² = 4.37143
    val rows = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq(3.0, 5.0, 6.0, 7.0, 8.0).map(("b", _))).toDF("g", "v")
    val r = Stats.mannWhitney(rows, "g", "v").collect()(0)
    assert((r.getString(0), r.getString(1)) == (("a", "b")))
    assert((r.getLong(2), r.getLong(3)) == ((4L, 5L)))         // n_a, n_b
    assert((r.getLong(4), r.getLong(5)) == ((3L, 37L)))        // 2·U: 2·1.5, 2·18.5
    assert(r.getLong(6) == 6L)                                 // Σ(t³−t)
    assert(r.getLong(7) == 4371428L)                           // ⌊z²·1e6⌋
    assert(r.getBoolean(8))                                    // 4.37 > 3.84
    // u_a_x2 + u_b_x2 = 2·n_a·n_b invariant
    assert(r.getLong(4) + r.getLong(5) == 2L * r.getLong(2) * r.getLong(3))
  }

  test("mannWhitney: identical distributions are not significant; all-tied is NULL variance") {
    import spark.implicits._
    val same = (Seq.fill(10)(("a", 5.0)) ++ Seq.fill(10)(("b", 5.0)) ++
      Seq(("a", 1.0), ("b", 1.0), ("a", 9.0), ("b", 9.0))).toDF("g", "v")
    val r = Stats.mannWhitney(same, "g", "v").collect()(0)
    assert(r.getLong(4) == r.getLong(5))   // perfectly balanced → U_a = U_b
    assert(r.getLong(7) == 0L && !r.getBoolean(8))
    // every value identical → zero variance → NULL statistic, NULL decision
    val tied = (Seq.fill(5)(("a", 2.0)) ++ Seq.fill(5)(("b", 2.0))).toDF("g", "v")
    val t = Stats.mannWhitney(tied, "g", "v").collect()(0)
    assert(t.isNullAt(7) && t.isNullAt(8))
  }

  test("mannWhitney: exactly-2-groups contract raises; empty input is empty") {
    import spark.implicits._
    val three = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("g", "v")
    val e = intercept[Exception] { Stats.mannWhitney(three, "g", "v").collect() }
    assert(e.toString.contains("exactly 2 groups") ||
      Option(e.getCause).exists(_.toString.contains("exactly 2 groups")))
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Stats.mannWhitney(empty, "g", "v").count() == 0)
  }

  test("bhFdr: step-up rejects below the largest passing rank; q-values are suffix mins") {
    import spark.implicits._
    // sorted p (micro), m = 10, alpha = 0.05 -> threshold rank*5000:
    // ranks 1,2,4 pass their own comparison, rank 3 does NOT
    // (16500 > 15000) — yet step-up (k = 4) rejects it anyway.
    val p = Seq(100L, 8000L, 16500L, 19000L, 70000L,
      200000L, 350000L, 500000L, 750000L, 999999L)
    val df = p.zipWithIndex.map { case (v, i) => (f"t$i%02d", v) }
      .toDF("test_id", "p_micro")
    val out = Stats.bhFdr(df, "test_id", "p_micro", 50000L)
      .select(col("rank"), col("p_micro"), col("q_micro"), col("reject"))
      .as[(Int, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == p)
    assert(out.map(_._3).toSeq == Seq(1000L, 40000L, 47500L, 47500L,
      140000L, 333333L, 500000L, 625000L, 833333L, 999999L))
    assert(out.map(_._4).toSeq ==
      Seq(true, true, true, true, false, false, false, false, false, false))
  }

  test("bhFdr dependence=true: BY harmonic correction, hand-pinned") {
    import spark.implicits._
    // same fixture as the BH test; c_ppm = sum ceil(1e6/i), i=1..10
    // = 2_928_971; threshold p*10*c <= rank*5e10 passes only rank 1
    val p = Seq(100L, 8000L, 16500L, 19000L, 70000L,
      200000L, 350000L, 500000L, 750000L, 999999L)
    val df = p.zipWithIndex.map { case (v, i) => (f"t$i%02d", v) }
      .toDF("test_id", "p_micro")
    val out = Stats.bhFdr(df, "test_id", "p_micro", 50000L,
        dependence = true)
      .select(col("rank"), col("q_micro"), col("reject"))
      .as[(Int, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._3).toSeq ==
      (true +: Seq.fill(9)(false)))
    // floored q = p*m*c_ppm div (rank*1e6), suffix-min'd, capped
    assert(out.map(_._2).toSeq == Seq(2928L, 117158L, 139126L, 139126L,
      410055L, 976323L, 1000000L, 1000000L, 1000000L, 1000000L))
  }

  test("bhFdr: no passing rank rejects nothing; empty input empty; bad p raises") {
    import spark.implicits._
    val none = Seq(("a", 60000L), ("b", 900000L)).toDF("test_id", "p_micro")
    val out = Stats.bhFdr(none, "test_id", "p_micro", 50000L)
      .select(col("q_micro"), col("reject")).as[(Long, Boolean)]
      .collect().toSeq
    assert(out == Seq((120000L, false), (900000L, false)))
    val empty = Seq.empty[(String, Long)].toDF("test_id", "p_micro")
    assert(Stats.bhFdr(empty, "test_id", "p_micro").count() == 0)
    val bad = Seq(("a", -1L)).toDF("test_id", "p_micro")
    val e = intercept[Exception] { Stats.bhFdr(bad, "test_id", "p_micro").collect() }
    assert(e.toString.contains("out of [0, 1e6]") ||
      Option(e.getCause).exists(_.toString.contains("out of [0, 1e6]")))
  }

  test("poissonBootstrap: constant data collapses the CI to the exact mean") {
    import spark.implicits._
    // every replicate mean of a constant column IS the constant,
    // whatever the weights — the CI must be a point, exactly
    val df = (1L to 50L).map(i => (i, 7.25)).toDF("id", "v")
    val out = Stats.poissonBootstrap(df, "id", "v", replicates = 50)
      .collect().head
    assert(out.getAs[Long]("n_rows") == 50L)
    assert(out.getAs[Long]("n_replicates") == 50L)
    assert(out.getAs[Long]("mean_micro") == 7250000L)
    assert(out.getAs[Long]("ci_lo_micro") == 7250000L)
    assert(out.getAs[Long]("ci_hi_micro") == 7250000L)
  }

  test("poissonBootstrap: deterministic, brackets the mean, and widens with spread") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, i.toDouble)).toDF("id", "v")
    val a = Stats.poissonBootstrap(df, "id", "v", replicates = 100).collect().head
    val b = Stats.poissonBootstrap(df, "id", "v", replicates = 100).collect().head
    assert(a == b) // no RNG anywhere — bit-identical reruns
    val mean = a.getAs[Long]("mean_micro")
    assert(mean == 100500000L) // exact integral mean of 1..200 in micro
    assert(a.getAs[Long]("ci_lo_micro") <= mean && mean <= a.getAs[Long]("ci_hi_micro"))
    assert(a.getAs[Long]("ci_lo_micro") < a.getAs[Long]("ci_hi_micro"))
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(Stats.poissonBootstrap(empty, "id", "v").count() == 0)
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("kaplanMeier: product-limit replayed by hand; censoring flattens, full kill pins zero") {
    import spark.implicits._
    // (duration, event): deaths at 1 (x2) and 3; censored at 2 and 4
    val df = Seq((1L, 1), (1L, 1), (2L, 0), (3L, 1), (4L, 0))
      .toDF("duration", "event")
    val out = Stats.kaplanMeier(df, "duration", "event")
      .select(col("duration"), col("n_at_risk"), col("n_events"),
        col("n_censored"), col("km_survival"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val s1 = r6(math.exp(r6(r6(math.log(3.0 / 5.0)))))
    val s3 = r6(math.exp(r6(r6(math.log(3.0 / 5.0)) + r6(math.log(1.0 / 2.0)))))
    assert(out == Seq(
      (1L, 5L, 2L, 0L, s1),   // S = 3/5
      (2L, 3L, 0L, 1L, s1),   // censor-only: risk set drops, curve flat
      (3L, 2L, 1L, 0L, s3),   // S = 3/5 * 1/2
      (4L, 1L, 0L, 1L, s3)))
    assert(s1 == 0.6 && s3 == 0.3) // the round-6 policy recovers the rationals
    // a time that kills its whole risk set pins the curve to exactly 0
    val kill = Seq((1L, 1), (1L, 1)).toDF("duration", "event")
    val k = Stats.kaplanMeier(kill, "duration", "event").collect()
    assert(k.length == 1 && k.head.getAs[Double]("km_survival") == 0.0)
    assert(Stats.kaplanMeier(
      Seq.empty[(Long, Int)].toDF("duration", "event"),
      "duration", "event").count() == 0)
    // fractional durations RAISE (never silently floor-truncate: two
    // engines could bucket 1.9 days differently upstream)
    val frac = Seq((1.9d, 1)).toDF("duration", "event")
    val fe = intercept[Exception] {
      Stats.kaplanMeier(frac, "duration", "event").collect()
    }
    assert(fe.toString.contains("non-negative integer") ||
      Option(fe.getCause).exists(_.toString.contains("non-negative integer")))
    val fe2 = intercept[Exception] {
      Stats.nelsonAalen(frac, "duration", "event").collect()
    }
    assert(fe2.toString.contains("non-negative integer") ||
      Option(fe2.getCause).exists(_.toString.contains("non-negative integer")))
  }

  test("quantileTreatmentEffect: exact ceil-rank order statistics pivot; shift; ties; raises") {
    import spark.implicits._
    // B is A shifted by exactly +5 -> QTE = 5e6 at every percentile
    val df = ((1 to 10).map(i => ("A", i.toDouble)) ++
      (1 to 10).map(i => ("B", i + 5.0))).toDF("g", "v")
    val out = Stats.quantileTreatmentEffect(df, "g", "v")
      .select(col("pct"), col("n_a"), col("n_b"), col("q_a_micro"),
        col("q_b_micro"), col("qte_micro"))
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    // ceil ranks on n=10: p25->3, p50->5, p75->8, p90->9
    assert(out == Seq(
      (25, 10L, 10L, 3000000L, 8000000L, 5000000L),
      (50, 10L, 10L, 5000000L, 10000000L, 5000000L),
      (75, 10L, 10L, 8000000L, 13000000L, 5000000L),
      (90, 10L, 10L, 9000000L, 14000000L, 5000000L)))
    // ties collapse into the count table, ranks still exact
    val ties = (Seq.fill(3)(("A", 1.0)) ++ Seq(("A", 9.0)) ++
      Seq.fill(4)(("B", 2.0))).toDF("g", "v")
    val t = Stats.quantileTreatmentEffect(ties, "g", "v", Seq(50))
      .collect().head
    assert(t.getAs[Long]("q_a_micro") == 1000000L) // rank 2 of {1,1,1,9}
    assert(t.getAs[Long]("q_b_micro") == 2000000L)
    val three = Seq(("A", 1.0), ("B", 1.0), ("C", 1.0)).toDF("g", "v")
    val err = intercept[Exception] {
      Stats.quantileTreatmentEffect(three, "g", "v").collect()
    }
    assert(err.toString.contains("exactly 2 groups") ||
      Option(err.getCause).exists(_.toString.contains("exactly 2 groups")))
    assert(Stats.quantileTreatmentEffect(
      Seq.empty[(String, Double)].toDF("g", "v"), "g", "v").count() == 0)
    // BLOCK-EQUIVALENCE PIN: the blocked two-pass rank is a pure
    // parallelism rewrite — any blockMicro yields identical output,
    // including values straddling block boundaries and negatives
    // spanning the truncate-toward-zero block 0
    val mixed = ((1 to 7).map(i => ("A", i - 4.0)) ++
      (1 to 9).map(i => ("B", i * 1.5 - 5.0))).toDF("g", "v")
    val wide = Stats.quantileTreatmentEffect(mixed, "g", "v",
      Seq(10, 50, 90), blockMicro = Long.MaxValue).collect().toSeq
    val narrow = Stats.quantileTreatmentEffect(mixed, "g", "v",
      Seq(10, 50, 90), blockMicro = 1L).collect().toSeq
    val mid = Stats.quantileTreatmentEffect(mixed, "g", "v",
      Seq(10, 50, 90), blockMicro = 1500000L).collect().toSeq
    assert(wide == narrow && wide == mid)
  }

  test("msprt: replayed mixture likelihood ladder; thin days stay conservative; contract raise") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = new Timestamp(day * 86400000L)
    // day 0: one lone A observation -> no variance -> p term 1.0
    // day 1: A {1, 2}, B {1, 1}; day 2: A +3, B +1
    val df = Seq(
      (ts(0), "A", 5.0),
      (ts(1), "A", 1.0), (ts(1), "A", 2.0), (ts(1), "B", 1.0), (ts(1), "B", 1.0),
      (ts(2), "A", 3.0), (ts(2), "B", 1.0)).toDF("ts", "g", "v")
    val out = Stats.msprt(df, "ts", "g", "v", tauMicro = 500000L)
      .select(col("day"), col("n_a"), col("n_b"), col("theta"), col("v"),
        col("p_always"), col("reject")).collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_a") == 1L && out(0).isNullAt(4))
    assert(out(0).getAs[Double]("p_always") == 1.0)
    // replay the exact pinned arithmetic for the cumulative day rows
    def replay(ca: Long, cb: Long, sa: Long, sb: Long, qa: BigInt, qb: BigInt)
        : (Double, Double, Double) = {
      val tau2 = 0.25
      val theta = r6((BigInt(sa) * cb - BigInt(sb) * ca).toDouble /
        (ca.toDouble * cb * 1.0e6))
      val va = r6((qa * ca - BigInt(sa) * sa).toDouble /
        (ca.toDouble * ca * (ca - 1) * 1.0e12))
      val vb = r6((qb * cb - BigInt(sb) * sb).toDouble /
        (cb.toDouble * cb * (cb - 1) * 1.0e12))
      val vv = r6(va + vb)
      val lnl = r6(r6(0.5 * math.log(vv / (vv + tau2))) +
        r6(theta * theta * tau2 / (2.0 * vv * (vv + tau2))))
      (theta, vv, r6(math.min(1.0, math.exp(-lnl))))
    }
    val (t1, v1, p1) = replay(3, 2, 8000000L, 2000000L,
      BigInt("30000000000000"), BigInt("2000000000000"))
    assert(out(1).getAs[Double]("theta") == t1)
    assert(out(1).getAs[Double]("v") == v1)
    assert(out(1).getAs[Double]("p_always") == math.min(1.0, p1))
    val (t2, v2, p2) = replay(4, 3, 11000000L, 3000000L,
      BigInt("39000000000000"), BigInt("3000000000000"))
    assert(out(2).getAs[Double]("theta") == t2)
    assert(out(2).getAs[Double]("v") == v2)
    assert(out(2).getAs[Double]("p_always") ==
      math.min(math.min(1.0, p1), p2))
    assert(!out(2).getAs[Boolean]("reject"))
    val three = Seq((ts(1), "A", 1.0), (ts(1), "B", 1.0), (ts(1), "C", 1.0))
      .toDF("ts", "g", "v")
    val err = intercept[Exception] { Stats.msprt(three, "ts", "g", "v").collect() }
    assert(err.toString.contains("exactly 2 groups") ||
      Option(err.getCause).exists(_.toString.contains("exactly 2 groups")))
    assert(Stats.msprt(Seq.empty[(Timestamp, String, Double)]
      .toDF("ts", "g", "v"), "ts", "g", "v").count() == 0)
  }

  test("msprt: a real separation drives the always-valid p to rejection") {
    import spark.implicits._
    import java.sql.Timestamp
    // 30 days x 10 obs/arm/day, A ~ 2.0 + jitter, B ~ 1.0 + jitter
    val rows = for {
      d <- 0 until 30; i <- 0 until 10
      (g, base) <- Seq(("A", 2.0), ("B", 1.0))
    } yield (new Timestamp(d * 86400000L), g,
      base + ((d * 10 + i) % 7) * 0.01)
    val out = Stats.msprt(rows.toDF("ts", "g", "v"), "ts", "g", "v",
      tauMicro = 500000L).orderBy(col("day")).collect()
    assert(out.last.getAs[Boolean]("reject"))
    // always-valid p is non-increasing by construction
    val ps = out.map(_.getAs[Double]("p_always")).toSeq
    assert(ps == ps.scanLeft(1.0)(math.min).tail)
  }

  test("kaplanMeierByGroup: each group's curve equals the ungrouped op on that slice") {
    import spark.implicits._
    val df = Seq(
      ("A", 1L, 1), ("A", 1L, 1), ("A", 2L, 0), ("A", 3L, 1), ("A", 4L, 0),
      ("B", 2L, 1), ("B", 5L, 0), ("B", 5L, 1),
      (null.asInstanceOf[String], 9L, 1)).toDF("g", "d", "e")
    val grouped = Stats.kaplanMeierByGroup(df, "d", "e", "g").collect()
      .groupBy(_.getAs[String]("group"))
    assert(grouped.keySet == Set("A", "B")) // NULL group dropped
    for (g <- Seq("A", "B")) {
      val single = Stats.kaplanMeier(df.where(col("g") === g), "d", "e")
        .collect().map(r => (r.getAs[Long]("duration"),
          r.getAs[Long]("n_at_risk"), r.getAs[Long]("n_events"),
          r.getAs[Long]("n_censored"), r.getAs[Double]("km_survival"))).toSeq
      val multi = grouped(g).map(r => (r.getAs[Long]("duration"),
        r.getAs[Long]("n_at_risk"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_censored"), r.getAs[Double]("km_survival"))).toSeq
      assert(multi == single, s"group $g")
    }
    assert(Stats.kaplanMeierByGroup(
      Seq.empty[(String, Long, Int)].toDF("g", "d", "e"),
      "d", "e", "g").count() == 0)
  }

  test("rmst: area under the KM steps replayed by hand; tau truncation; full-kill floor") {
    import spark.implicits._
    // KM from the kaplanMeier spec: S(1)=.6, S(2)=.6, S(3)=.3, S(4)=.3
    val df = Seq((1L, 1), (1L, 1), (2L, 0), (3L, 1), (4L, 0))
      .toDF("duration", "event")
    val far = Stats.rmst(df, "duration", "event", 10L).collect().head
    assert(far.getAs[Long]("tau") == 10L)
    assert(far.getAs[Long]("n_subjects") == 5L)
    // 1.0*1 + .6*1 + .6*1 + .3*1 + tail .3*(10-4)=1.8
    assert(far.getAs[Double]("rmst") == 4.3)
    val near = Stats.rmst(df, "duration", "event", 2L).collect().head
    assert(near.getAs[Double]("rmst") == 1.6) // 1.0*1 + .6*1, rest clipped
    val kill = Seq((1L, 1), (1L, 1)).toDF("duration", "event")
    val k = Stats.rmst(kill, "duration", "event", 5L).collect().head
    assert(k.getAs[Double]("rmst") == 1.0) // 1 day alive, then S pinned 0
    assert(Stats.rmst(Seq.empty[(Long, Int)].toDF("duration", "event"),
      "duration", "event", 5L).count() == 0)
  }

  test("cmhTest: hand-computed stratified chi2 and MH odds ratio; degenerate stratum; raises") {
    import spark.implicits._
    def subjects(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, 1, 1)) ++ Seq.fill(b)((s, 1, 0)) ++
        Seq.fill(c)((s, 0, 1)) ++ Seq.fill(d)((s, 0, 0))
    val df = (subjects("s1", 4, 1, 1, 4) ++ subjects("s2", 3, 2, 2, 3))
      .toDF("st", "t", "y")
    val r = Stats.cmhTest(df, "st", "t", "y").collect().head
    assert(r.getAs[Long]("n_strata") == 2L && r.getAs[Long]("n_total") == 20L)
    assert(r.getAs[Long]("sum_a") == 7L)
    // per stratum: E = 5*5/10 = 2.5, V = 5*5*5*5/(100*9) = .694444
    assert(r.getAs[Double]("expected_a") == 5.0)
    assert(r.getAs[Double]("chi2") ==
      r6(2.0 * 2.0 / r6(r6(625.0 / 900.0) + r6(625.0 / 900.0))))
    // OR = (4*4/10 + 3*3/10) / (1*1/10 + 2*2/10) = 2.5 / 0.5
    assert(r.getAs[Double]("or_mh") == 5.0)
    assert(!r.getAs[Boolean]("significant_05"))
    // one stratum, no controls: V = 0 -> NULL chi2, false flag, NULL OR
    val oneArm = subjects("s1", 3, 2, 0, 0).toDF("st", "t", "y")
    val o = Stats.cmhTest(oneArm, "st", "t", "y").collect().head
    assert(o.isNullAt(o.fieldIndex("chi2")) && o.isNullAt(o.fieldIndex("or_mh")))
    assert(!o.getAs[Boolean]("significant_05"))
    val bad = Seq(("s1", 2, 1)).toDF("st", "t", "y")
    val err = intercept[Exception] { Stats.cmhTest(bad, "st", "t", "y").collect() }
    assert(err.toString.contains("treatment must be 0 or 1") ||
      Option(err.getCause).exists(_.toString.contains("treatment must be 0 or 1")))
    assert(Stats.cmhTest(Seq.empty[(String, Int, Int)].toDF("st", "t", "y"),
      "st", "t", "y").count() == 0)
  }

  test("rmstDiff: per-group areas equal the single-group op; the diff is their subtraction") {
    import spark.implicits._
    val a = Seq((1L, 1), (1L, 1), (2L, 0), (3L, 1), (4L, 0))
    val b = Seq((2L, 1), (5L, 0), (5L, 1))
    val df = (a.map { case (d, e) => ("A", d, e) } ++
      b.map { case (d, e) => ("B", d, e) }).toDF("g", "d", "e")
    val out = Stats.rmstDiff(df, "d", "e", "g", tau = 10L).collect()
    assert(out.length == 1)
    val r = out.head
    val ra = Stats.rmst(a.toDF("d", "e"), "d", "e", 10L)
      .collect().head.getAs[Double]("rmst")
    val rb = Stats.rmst(b.toDF("d", "e"), "d", "e", 10L)
      .collect().head.getAs[Double]("rmst")
    assert(r.getAs[String]("group_a") == "A" && r.getAs[String]("group_b") == "B")
    assert(r.getAs[Long]("n_a") == 5L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("rmst_a") == ra)
    assert(r.getAs[Double]("rmst_b") == rb)
    assert(r.getAs[Double]("rmst_diff") == r6(rb - ra))
    val one = a.map { case (d, e) => ("A", d, e) }.toDF("g", "d", "e")
    val err = intercept[Exception] { Stats.rmstDiff(one, "d", "e", "g", 10L).collect() }
    assert(err.toString.contains("exactly 2 groups") ||
      Option(err.getCause).exists(_.toString.contains("exactly 2 groups")))
    assert(Stats.rmstDiff(Seq.empty[(String, Long, Int)].toDF("g", "d", "e"),
      "d", "e", "g", 10L).count() == 0)
  }

  test("logRank: hand-computed O/E/V ladder; degenerate and contract cases") {
    import spark.implicits._
    val df = Seq(
      ("A", 1L, 1), ("A", 2L, 1), ("A", 3L, 0),
      ("B", 3L, 1), ("B", 4L, 1), ("B", 5L, 0)).toDF("g", "d", "e")
    val out = Stats.logRank(df, "d", "e", "g").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("group_a") == "A" && r.getAs[String]("group_b") == "B")
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("events_a") == 2L && r.getAs[Long]("events_b") == 2L)
    // t=1: E=3*1/6=.5 V=3*3*1*5/(36*5)=.25 | t=2: E=2/5=.4 V=2*3*4/(25*4)=.24
    // t=3: E=1/4=.25 V=1*3*3/(16*3)=.1875 | t=4: E=0 V=0
    assert(r.getAs[Double]("expected_a") == 1.15)
    assert(r.getAs[Double]("chi2") == r6((2.0 - 1.15) * (2.0 - 1.15) / 0.6775))
    assert(!r.getAs[Boolean]("significant_05"))
    // all deaths in one arm at early times: large chi2, significant
    val sep = ((1 to 20).map(i => ("A", i.toLong, 1)) ++
      (1 to 20).map(i => ("B", 100L + i, 1))).toDF("g", "d", "e")
    val s = Stats.logRank(sep, "d", "e", "g").collect().head
    assert(s.getAs[Boolean]("significant_05"))
    val three = Seq(("A", 1L, 1), ("B", 1L, 1), ("C", 1L, 1)).toDF("g", "d", "e")
    val err = intercept[Exception] { Stats.logRank(three, "d", "e", "g").collect() }
    assert(err.toString.contains("exactly 2 groups") ||
      Option(err.getCause).exists(_.toString.contains("exactly 2 groups")))
    assert(Stats.logRank(Seq.empty[(String, Long, Int)].toDF("g", "d", "e"),
      "d", "e", "g").count() == 0)
  }

  test("ipwAte: hand-computed Hajek means with exact integer weights; clipping; one-arm raise") {
    import spark.implicits._
    // (t, y, e_micro): weights 1e12 div e (treated) / 1e12 div (1e6-e)
    val df = Seq(
      (1, 10.0, 500000L), (0, 5.0, 500000L),   // w = 2e6 both
      (1, 20.0, 250000L),                       // w = 4e6
      (0, 0.0, 250000L)                         // w = 1e12 div 75e4 = 1333333
    ).toDF("t", "y", "e")
    val r = Stats.ipwAte(df, "t", "y", "e", clipMicro = 0L).collect().head
    assert(r.getAs[Long]("n_treated") == 2L && r.getAs[Long]("n_control") == 2L)
    // swyt = 2e6*1e7 + 4e6*2e7 = 1e14; swt = 6e6 -> 16666666
    assert(r.getAs[Long]("mean_treated_micro") == 16666666L)
    // swyc = 2e6*5e6; swc = 3333333 -> 3000000
    assert(r.getAs[Long]("mean_control_micro") == 3000000L)
    assert(r.getAs[Long]("ate_micro") == 13666666L)
    // clipping: e = 1 would weigh 1e12; clip 10000 pins w to 1e8
    val ext = Seq((1, 1.0, 1L), (0, 1.0, 999999L)).toDF("t", "y", "e")
    val c = Stats.ipwAte(ext, "t", "y", "e", clipMicro = 10000L).collect().head
    assert(c.getAs[Long]("mean_treated_micro") == 1000000L)
    assert(c.getAs[Long]("ate_micro") == 0L)
    val oneArm = Seq((1, 1.0, 500000L)).toDF("t", "y", "e")
    val err = intercept[Exception] { Stats.ipwAte(oneArm, "t", "y", "e").collect() }
    assert(err.toString.contains("both arms") ||
      Option(err.getCause).exists(_.toString.contains("both arms")))
    assert(Stats.ipwAte(Seq.empty[(Int, Double, Long)].toDF("t", "y", "e"),
      "t", "y", "e").count() == 0)
  }

  test("bradleyTerry: matches the BigInt MM replay; zero-win boundary; dominance order; empty") {
    import spark.implicits._
    // a beats b 3x, b beats a 1x, a beats c 2x, c beats b 2x, b beats c 1x
    val prefs = (Seq.fill(3)(("a", "b")) ++ Seq(("b", "a")) ++
      Seq.fill(2)(("a", "c")) ++ Seq.fill(2)(("c", "b")) ++ Seq(("b", "c")))
      .toDF("w", "l")
    val out = Stats.bradleyTerry(prefs, "w", "l", iterations = 12)
      .select(col("item"), col("wins"), col("comparisons"), col("strength_micro"))
      .as[(String, Long, Long, Long)].collect().toSeq
    // replay the exact integer MM
    val wij = Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("a", "c") -> 2L,
      ("c", "a") -> 0L, ("c", "b") -> 2L, ("b", "c") -> 1L)
    val items = Seq("a", "b", "c")
    val nij = wij.map { case ((i, j), w) => (i, j) -> (w + wij((j, i))) }
    val bigW = items.map(i => i -> wij.collect {
      case ((`i`, _), w) => w }.sum).toMap
    var pi = items.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to 12) {
      val d = items.map { i =>
        i -> nij.collect { case ((`i`, j), n) =>
          BigInt(n) * BigInt("1000000000000") / (pi(i) + pi(j)).max(BigInt(1))
        }.sum
      }.toMap
      val praw = items.map { i =>
        i -> BigInt(bigW(i)) * BigInt("1000000000000") / d(i).max(BigInt(1))
      }.toMap
      val s = praw.values.sum.max(BigInt(1))
      pi = items.map(i => i -> praw(i) * (BigInt(3) * 1000000) / s).toMap
    }
    val expect = items.map(i =>
      (i, bigW(i), nij.collect { case ((`i`, _), n) => n }.sum, pi(i).toLong))
      .sortBy(t => (-t._4, t._1))
    assert(out == expect)
    assert(out.head._1 == "a") // the dominant item ranks first
    // an item that never won sits at the boundary: exactly 0
    val shut = (Seq.fill(4)(("x", "y")) ++ Seq.fill(2)(("z", "y")))
      .toDF("w", "l")
    val sOut = Stats.bradleyTerry(shut, "w", "l").collect()
      .map(r => r.getAs[String]("item") -> r.getAs[Long]("strength_micro"))
      .toMap
    assert(sOut("y") == 0L && sOut("x") > 0L && sOut("z") > 0L)
    assert(Stats.bradleyTerry(
      Seq.empty[(String, String)].toDF("w", "l"), "w", "l").count() == 0)
  }

  test("bradleyTerry: maxItems raises in-plan on breach") {
    import spark.implicits._
    val many = (1 to 12).flatMap(i => (1 to 12).filter(_ != i)
      .map(j => (s"i$i", s"i$j"))).toDF("w", "l")
    val err = intercept[Exception] {
      Stats.bradleyTerry(many, "w", "l", iterations = 1, maxItems = 5).collect()
    }
    assert(err.toString.contains("more than 5 items") ||
      Option(err.getCause).exists(_.toString.contains("more than 5 items")))
  }

  test("nelsonAalen: round-6 d/n hazard ladder; full-kill finite; empty") {
    import spark.implicits._
    val df = Seq((1L, 1), (1L, 0), (2L, 1), (3L, 0)).toDF("duration", "event")
    val out = Stats.nelsonAalen(df, "duration", "event")
      .select(col("duration"), col("n_at_risk"), col("n_events"),
        col("n_censored"), col("na_cum_hazard"), col("na_survival"))
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    // t=1: 1/4 -> 0.25; t=2: 1/2 -> cum 0.75; t=3: censor-only, flat
    assert(out == Seq(
      (1L, 4L, 1L, 1L, 0.25, 0.778801),
      (2L, 2L, 1L, 0L, 0.75, 0.472367),
      (3L, 1L, 0L, 1L, 0.75, 0.472367)))
    // a full-kill time contributes hazard exactly 1.0, never a blow-up
    val kill = Seq((1L, 1), (1L, 1)).toDF("duration", "event")
    val k = Stats.nelsonAalen(kill, "duration", "event").collect().head
    assert(k.getAs[Double]("na_cum_hazard") == 1.0 &&
      k.getAs[Double]("na_survival") == 0.367879)
    assert(Stats.nelsonAalen(Seq.empty[(Long, Int)].toDF("duration", "event"),
      "duration", "event").count() == 0)
  }

  test("kaplanMeierCi: Greenwood band replays the rounded ladder; kill pins zeros; clamps") {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq((1L, 1), (1L, 0), (2L, 1), (3L, 0)).toDF("duration", "event")
    val out = Stats.kaplanMeierCi(df, "duration", "event")
      .select(col("duration"), col("km_survival"), col("km_se"),
        col("km_lo"), col("km_hi"))
      .as[(Long, Double, Double, Double, Double)].collect().toSeq
    // replay: S and Greenwood cum off round-6 terms in ladder order
    val s1 = r6(math.exp(r6(math.log(3.0 / 4.0))))
    val g1 = r6(1.0 / (4.0 * 3.0))
    val se1 = r6(s1 * math.sqrt(g1))
    val m1 = r6(1.959964 * se1)
    val s2 = r6(math.exp(r6(r6(math.log(3.0 / 4.0)) + r6(math.log(1.0 / 2.0)))))
    val g2 = r6(g1 + r6(1.0 / (2.0 * 1.0)))
    val se2 = r6(s2 * math.sqrt(g2))
    val m2 = r6(1.959964 * se2)
    assert(out == Seq(
      (1L, s1, se1, r6(math.max(0.0, s1 - m1)), r6(math.min(1.0, s1 + m1))),
      (2L, s2, se2, r6(math.max(0.0, s2 - m2)), r6(math.min(1.0, s2 + m2))),
      (3L, s2, se2, r6(math.max(0.0, s2 - m2)), r6(math.min(1.0, s2 + m2)))))
    // full kill: survival, se and both bounds pin to exactly 0.0 after
    val kill = Seq((1L, 1), (2L, 1), (2L, 1)).toDF("duration", "event")
    val kRows = Stats.kaplanMeierCi(kill, "duration", "event").collect()
    val last = kRows.last
    assert(last.getAs[Double]("km_survival") == 0.0 &&
      last.getAs[Double]("km_se") == 0.0 &&
      last.getAs[Double]("km_lo") == 0.0 && last.getAs[Double]("km_hi") == 0.0)
    assert(Stats.kaplanMeierCi(Seq.empty[(Long, Int)].toDF("duration", "event"),
      "duration", "event").count() == 0)
  }

  test("cohensD: hand-pinned pooled effect size; contracts") {
    import spark.implicits._
    // A = {1,2,3} (var 1), B = {2,4,6} (var 4): pooled var 2.5,
    // d = -2/sqrt(2.5), g = d * (1 - 3/(4*6-9)) = 0.8 d
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(2.0, 4.0, 6.0).map(("b", _))).toDF("g", "v")
    val r = Stats.cohensD(df, "g", "v").collect().head
    assert(r.getAs[String]("group_a") == "a" && r.getAs[Long]("n_a") == 3L)
    assert(r.getAs[Double]("mean_a") == 1.0 + 1.0) // 2.0
    assert(r.getAs[Double]("mean_b") == 4.0)
    assert(r.getAs[Double]("sd_pooled") == 1.581139) // sqrt(2.5) r6
    assert(r.getAs[Double]("cohens_d") == -1.264911)
    assert(r.getAs[Double]("hedges_g") == -1.011929)
    // single-observation arm: NULL effect, never a blow-up
    val thin = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val t = Stats.cohensD(thin, "g", "v").collect().head
    assert(t.isNullAt(t.fieldIndex("cohens_d")))
    val three = Seq(("a", 1.0), ("b", 1.0), ("c", 1.0)).toDF("g", "v")
    val err = intercept[Exception] { Stats.cohensD(three, "g", "v").collect() }
    assert(err.toString.contains("exactly 2 groups") ||
      Option(err.getCause).exists(_.toString.contains("exactly 2 groups")))
    assert(Stats.cohensD(
      Seq.empty[(String, Double)].toDF("g", "v"), "g", "v").count() == 0)
  }

  test("competingRisks: CIF replays the lagged all-cause ladder; sums with S to ~1; dense grid") {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // t=1: cause-1 death among 5 at risk; t=2: cause-2 death among 4;
    // t=3: censor only; t=4: cause-1 death among 2
    val df = Seq((1L, 1), (2L, 2), (3L, 0), (4L, 1), (4L, 0))
      .toDF("dur", "cev")
    val out = Stats.competingRisks(df, "dur", "cev")
      .select("duration", "cause", "n_at_risk", "n_events", "cif")
      .as[(Long, Int, Long, Long, Double)].collect().toSeq
    val s1 = r6(math.exp(r6(math.log(4.0 / 5.0))))
    val s2 = r6(math.exp(r6(r6(math.log(4.0 / 5.0)) + r6(math.log(3.0 / 4.0)))))
    val c1t1 = r6(1.0 / 5.0)                    // S_prev = 1
    val c1t4 = r6(c1t1 + r6(s2 * 1.0 / 2.0))    // S_prev at t=4 is S(3)=S(2)
    val c2t2 = r6(s1 * 1.0 / 4.0)
    assert(out == Seq(
      (1L, 1, 5L, 1L, c1t1), (2L, 1, 4L, 0L, c1t1), (3L, 1, 3L, 0L, c1t1),
      (4L, 1, 2L, 1L, c1t4),
      (1L, 2, 5L, 0L, 0.0), (2L, 2, 4L, 1L, c2t2), (3L, 2, 3L, 0L, c2t2),
      (4L, 2, 2L, 0L, c2t2)))
    // conservation: Σ_k CIF_k(t_max) + S(t_max) = 1 up to round-6 noise
    val s4 = r6(math.exp(r6(r6(math.log(4.0 / 5.0)) + r6(math.log(3.0 / 4.0))
      + r6(math.log(1.0 / 2.0)))))
    assert(math.abs(c1t4 + c2t2 + s4 - 1.0) < 2e-5)
    val err = intercept[Exception] {
      Stats.competingRisks(Seq((1L, -1)).toDF("dur", "cev"), "dur", "cev")
        .collect()
    }
    assert(err.toString.contains("positive cause") ||
      Option(err.getCause).exists(_.toString.contains("positive cause")))
    val many = (1 to 20).map(i => (i.toLong, i)).toDF("dur", "cev")
    val e2 = intercept[Exception] {
      Stats.competingRisks(many, "dur", "cev", maxCauses = 4).collect()
    }
    assert(e2.toString.contains("more than 4 causes") ||
      Option(e2.getCause).exists(_.toString.contains("more than 4 causes")))
    assert(Stats.competingRisks(
      Seq.empty[(Long, Int)].toDF("dur", "cev"), "dur", "cev").count() == 0)
  }

  test("andersonDarling: replayed midrank ladder; shifted tail detected; degenerate 0; contract") {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // replay of the pinned arithmetic over an arbitrary tied fixture
    def replay(a: Seq[Double], b: Seq[Double]): Double = {
      val n1 = a.length.toLong; val n2 = b.length.toLong; val nn = n1 + n2
      val vs = (a ++ b).distinct.sorted
      var cum1 = 0L; var cumT = 0L; var s = 0.0
      vs.foreach { v =>
        val c1 = a.count(_ == v).toLong; val c2 = b.count(_ == v).toLong
        val ct = c1 + c2
        cum1 += c1; cumT += ct
        val b2 = 2 * cumT - ct
        val m21 = 2 * cum1 - c1
        val m22 = 2 * (cumT - cum1) - (ct - c1)
        val den4 = b2 * (2 * nn - b2) - nn * ct
        def term(m2: Long, ni: Long): Double = {
          val nu = nn * m2 - ni * b2
          if (den4 <= 0 || ni == 0) 0.0
          else r6(ct.toDouble * nu * nu / (nn.toDouble * ni * den4))
        }
        s += term(m21, n1) + term(m22, n2)
      }
      r6((nn - 1).toDouble / nn * r6(s))
    }
    val a = Seq(1.0, 2.0, 2.0, 3.0, 5.0)
    val b = Seq(2.0, 4.0, 6.0, 9.0)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val r = Stats.andersonDarling(df, "g", "v").collect().head
    assert(r.getAs[String]("group_a") == "A" && r.getAs[Long]("n_a") == 5L)
    assert(r.getAs[Double]("a2") == replay(a, b))
    // INDEPENDENT pin (not the replay): Scholz–Stephens 1987 eq. 7
    // computed by hand for this fixture (and matching scipy
    // anderson_ksamp midrank A²akN): exact Σterms = 1.712453…,
    // A² = 8/9 · 1.712453 = 1.522180. A replay-only check cannot
    // catch a formula error shared by both sides — this can.
    assert(r.getAs[Double]("a2") == 1.522180)
    // a gross location shift IS detected (rank space: magnitude-free)
    val base = (1 to 40).map(_.toDouble)
    val shifted = (21 to 60).map(_.toDouble)
    val sTest = Stats.andersonDarling(
      (base.map(("A", _)) ++ shifted.map(("B", _))).toDF("g", "v"), "g", "v")
      .collect().head
    assert(sTest.getAs[Double]("a2") == replay(base, shifted))
    assert(sTest.getAs[Boolean]("significant_05"))
    // single pooled distinct value: A² pinned to exactly 0
    val flat = Seq(("A", 1.0), ("A", 1.0), ("B", 1.0)).toDF("g", "v")
    assert(Stats.andersonDarling(flat, "g", "v").collect()
      .head.getAs[Double]("a2") == 0.0)
    val three = Seq(("A", 1.0), ("B", 1.0), ("C", 1.0)).toDF("g", "v")
    val err = intercept[Exception] { Stats.andersonDarling(three, "g", "v").collect() }
    assert(err.toString.contains("exactly 2 groups") ||
      Option(err.getCause).exists(_.toString.contains("exactly 2 groups")))
    assert(Stats.andersonDarling(
      Seq.empty[(String, Double)].toDF("g", "v"), "g", "v").count() == 0)
  }

  test("kruskalWallis: hand-pinned floor-micro H; degenerate ties; contract") {
    import spark.implicits._
    // A={1,2} B={3,4} C={5,6}: ranks 1..6, R2 = 6/14/22,
    // S = (36+196+484)e6/8 = 89_500_000; H = 12*89.5/42 - 21 = 4.571428...
    val df = (Seq(1.0, 2.0).map(("A", _)) ++ Seq(3.0, 4.0).map(("B", _)) ++
      Seq(5.0, 6.0).map(("C", _))).toDF("g", "v")
    val r = Stats.kruskalWallis(df, "g", "v").collect().head
    assert(r.getAs[Int]("n_groups") == 3 && r.getAs[Long]("n_total") == 6L)
    assert(r.getAs[Long]("sum_ties") == 0L)
    assert(r.getAs[Long]("h_ppm") == 4571428L)
    assert(r.getAs[Int]("df") == 2)
    // all values tied: tie-corrected variance is zero -> NULL H
    val tied = Seq(("A", 1.0), ("A", 1.0), ("B", 1.0), ("B", 1.0))
      .toDF("g", "v")
    val t = Stats.kruskalWallis(tied, "g", "v").collect().head
    assert(t.isNullAt(t.fieldIndex("h_ppm")))
    val one = Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v")
    val err = intercept[Exception] { Stats.kruskalWallis(one, "g", "v").collect() }
    assert(err.toString.contains("at least 2 groups") ||
      Option(err.getCause).exists(_.toString.contains("at least 2 groups")))
    assert(Stats.kruskalWallis(
      Seq.empty[(String, Double)].toDF("g", "v"), "g", "v").count() == 0)
  }

  test("cochranArmitage: hand-pinned z2; degenerate NULL; dose contract") {
    import spark.implicits._
    // doses 0,0,1,1,2,2 with y 0,0,0,1,1,1:
    // N=6 R=3 B=6 A=5 Q=10 -> z2 = 6*(30-18)^2 / (3*3*24) = 4.0
    val df = Seq((0L, 0), (0L, 0), (1L, 0), (1L, 1), (2L, 1), (2L, 1))
      .toDF("dose", "y")
    val r = Stats.cochranArmitage(df, "dose", "y").collect().head
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("n_cases") == 3L)
    assert(r.getAs[Long]("z2_ppm") == 4000000L)
    assert(r.getAs[Boolean]("significant_05")) // 4.0 > 3.841459
    // degenerate outcome (all cases): NULL, never a division blow-up
    val allCase = Seq((0L, 1), (1L, 1)).toDF("dose", "y")
    val a = Stats.cochranArmitage(allCase, "dose", "y").collect().head
    assert(a.isNullAt(a.fieldIndex("z2_ppm")))
    val neg = Seq((-1L, 0)).toDF("dose", "y")
    val err = intercept[Exception] { Stats.cochranArmitage(neg, "dose", "y").collect() }
    assert(err.toString.contains("non-negative") ||
      Option(err.getCause).exists(_.toString.contains("non-negative")))
    assert(Stats.cochranArmitage(
      Seq.empty[(Long, Int)].toDF("dose", "y"), "dose", "y").count() == 0)
  }

  test("friedman: hand-pinned blocked-rank T1; ties; listwise deletion; contracts") {
    import spark.implicits._
    // 3 subjects x 3 treatments, no ties:
    // R = {A:4, B:8, C:6} -> sum D^2 (undoubled) = 8 -> classic
    // 12*8/(3*3*4) = 2.666667 -> t1_ppm = 2666666 (floored)
    val df = Seq(
      ("u1", "A", 1.0), ("u1", "B", 2.0), ("u1", "C", 3.0),
      ("u2", "A", 2.0), ("u2", "B", 3.0), ("u2", "C", 1.0),
      ("u3", "A", 1.0), ("u3", "B", 3.0), ("u3", "C", 2.0))
      .toDF("u", "j", "v")
    val r = Stats.friedman(df, "u", "j", "v").collect().head
    assert(r.getAs[Long]("n_subjects") == 3L &&
      r.getAs[Int]("k_treatments") == 3)
    assert(r.getAs[Long]("t1_ppm") == 2666666L)
    assert(r.getAs[Int]("df") == 2)
    // within-block ties take average ranks (doubled stays integral)
    val tied = Seq(
      ("u1", "A", 1.0), ("u1", "B", 1.0), ("u1", "C", 2.0),
      ("u2", "A", 1.0), ("u2", "B", 2.0), ("u2", "C", 3.0))
      .toDF("u", "j", "v")
    val t = Stats.friedman(tied, "u", "j", "v").collect().head
    assert(t.getAs[Long]("n_subjects") == 2L)
    assert(!t.isNullAt(t.fieldIndex("t1_ppm")))
    // an incomplete subject is listwise-dropped
    val hole = df.union(Seq(("u4", "A", 9.0)).toDF("u", "j", "v"))
    assert(Stats.friedman(hole, "u", "j", "v").collect()
      .head.getAs[Long]("n_subjects") == 3L)
    // every block fully tied: zero denominator -> NULL
    val flat = Seq(("u1", "A", 1.0), ("u1", "B", 1.0),
      ("u2", "A", 2.0), ("u2", "B", 2.0)).toDF("u", "j", "v")
    val f = Stats.friedman(flat, "u", "j", "v").collect().head
    assert(f.isNullAt(f.fieldIndex("t1_ppm")))
    val dup = df.union(Seq(("u1", "A", 5.0)).toDF("u", "j", "v"))
    val err = intercept[Exception] { Stats.friedman(dup, "u", "j", "v").collect() }
    assert(err.toString.contains("duplicate") ||
      Option(err.getCause).exists(_.toString.contains("duplicate")))
    val one = Seq(("u1", "A", 1.0), ("u2", "A", 2.0)).toDF("u", "j", "v")
    val e2 = intercept[Exception] { Stats.friedman(one, "u", "j", "v").collect() }
    assert(e2.toString.contains("at least 2 treatments") ||
      Option(e2.getCause).exists(_.toString.contains("at least 2 treatments")))
    assert(Stats.friedman(
      Seq.empty[(String, String, Double)].toDF("u", "j", "v"),
      "u", "j", "v").count() == 0)
  }

  test("cronbachAlpha: perfectly consistent items; listwise deletion; contracts") {
    import spark.implicits._
    // two items in lockstep across 4 subjects -> alpha = 1.0
    val df = (1 to 4).flatMap(i =>
      Seq((s"u$i", "a", i.toDouble), (s"u$i", "b", i.toDouble)))
      .toDF("u", "i", "v")
    val r = Stats.cronbachAlpha(df, "u", "i", "v").collect().head
    assert(r.getAs[Long]("n_subjects") == 4L && r.getAs[Int]("k_items") == 2)
    assert(r.getAs[Double]("sum_item_var") == 3.333334)
    assert(r.getAs[Double]("var_total") == 6.666667)
    assert(r.getAs[Double]("cronbach_alpha") == 1.0)
    // a subject missing an item is listwise-deleted, not zero-filled
    val withHole = df.union(Seq(("u5", "a", 9.0)).toDF("u", "i", "v"))
    val h = Stats.cronbachAlpha(withHole, "u", "i", "v").collect().head
    assert(h.getAs[Long]("n_subjects") == 4L)
    // duplicate (subject, item) raises
    val dup = df.union(Seq(("u1", "a", 2.0)).toDF("u", "i", "v"))
    val err = intercept[Exception] { Stats.cronbachAlpha(dup, "u", "i", "v").collect() }
    assert(err.toString.contains("duplicate") ||
      Option(err.getCause).exists(_.toString.contains("duplicate")))
    // a single item: alpha undefined -> NULL
    val single = (1 to 3).map(i => (s"u$i", "a", i.toDouble)).toDF("u", "i", "v")
    val s1 = Stats.cronbachAlpha(single, "u", "i", "v").collect().head
    assert(s1.isNullAt(s1.fieldIndex("cronbach_alpha")))
    assert(Stats.cronbachAlpha(
      Seq.empty[(String, String, Double)].toDF("u", "i", "v"),
      "u", "i", "v").count() == 0)
  }

  test("pairedPermutationTest: exact T sums; degenerate and one-sided behavior") {
    import spark.implicits._
    // all-zero diffs: every |T_b| = |T_obs| = 0 -> p = 1e6 exactly
    val zero = (1 to 8).map(i => (s"u$i", 5.0, 5.0)).toDF("id", "a", "b")
    val z = Stats.pairedPermutationTest(zero, "id", "a", "b", 50).collect().head
    assert(z.getAs[Long]("n_pairs") == 8L &&
      z.getAs[Long]("t_obs_micro") == 0L &&
      z.getAs[Long]("n_extreme") == 50L &&
      z.getAs[Long]("p_micro") == 1000000L &&
      !z.getAs[Boolean]("significant_05"))
    // strongly one-sided: 12 pairs all +1 -> T_obs = 12e6; a replicate
    // reaches |T_obs| only on an all-same-sign draw (~2^-11 each)
    val pos = (1 to 12).map(i => (s"u$i", 2.0, 1.0)).toDF("id", "a", "b")
    val p = Stats.pairedPermutationTest(pos, "id", "a", "b", 200).collect().head
    assert(p.getAs[Long]("t_obs_micro") == 12000000L)
    assert(p.getAs[Long]("p_micro") <= 50000L &&
      p.getAs[Boolean]("significant_05"))
    // NULL sides are excluded up front
    val withNull = Seq(("u1", Some(1.0), Some(2.0)), ("u2", None, Some(3.0)))
      .toDF("id", "a", "b")
    assert(Stats.pairedPermutationTest(withNull, "id", "a", "b", 50)
      .collect().head.getAs[Long]("n_pairs") == 1L)
    assert(Stats.pairedPermutationTest(
      Seq.empty[(String, Double, Double)].toDF("id", "a", "b"),
      "id", "a", "b").count() == 0)
  }
}
