package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Governance

/** Governance screens: k-anonymity violation reporting and PSI drift
  * (bucket assignment, half-count smoothing, join-coalesce of one-sided
  * buckets). */
class GovernanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kAnonymityAudit reports exactly the classes below k, with sizes") {
    import spark.implicits._
    val rows = Seq.fill(5)(("a", 1L)) ++ Seq.fill(2)(("b", 1L)) ++ Seq(("b", 2L))
    val out = Governance.kAnonymityAudit(
        rows.toDF("qi1", "qi2"), Seq("qi1", "qi2"), k = 3)
      .orderBy("qi1", "qi2").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("b", 1L, 2L), ("b", 2L, 1L)))
  }

  test("cramersV: perfect association is 1.0 (absent cells counted), independence near 0") {
    import spark.implicits._
    // a == b: the 2×2 table is diagonal — V must be exactly 1, which
    // requires the ABSENT off-diagonal cells' (0−e)²/e = e mass
    val perfect = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")).toDF("a", "b")
    val p = Governance.cramersV(perfect, "a", "b").collect().head
    assert(p.getLong(2) == 4L && p.getLong(3) == 2L && p.getLong(4) == 2L)
    assert(p.getLong(5) == 4000000L, s"chi2_micro = ${p.getLong(5)}") // chi2 = n = 4
    assert(p.getDouble(6) == 1.0)
    // balanced independence: every cell at its expectation → V = 0
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val i = Governance.cramersV(indep, "a", "b").collect().head
    assert(i.getLong(5) == 0L && i.getDouble(6) == 0.0)
    // single-category axis → V undefined
    val one = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    assert(Governance.cramersV(one, "a", "b").collect().head.isNullAt(6))
  }

  test("nullPatterns: combinations counted, most-common first, shares sum to ~1e6") {
    import spark.implicits._
    val df = Seq(
      (Option(1), Option("a")), (Option(2), Option("b")), (Option(3), Option("c")),
      (Option(4), None), (None, None)
    ).toDF("x", "y")
    val out = Governance.nullPatterns(df, Seq("x", "y")).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (true, true, 3L, 600000L), (false, false, 1L, 200000L),
      (true, false, 1L, 200000L)))
  }

  test("refIntegrity: orphans vs NULL FKs split, ppm over non-NULL only") {
    import spark.implicits._
    val child = Seq(Option(1L), Option(1L), Option(2L), Option(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Governance.refIntegrity(child, parent, "fk", "pk", "c->p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // 5 child rows, 1 NULL FK, 1 orphan (99) of 4 non-NULL → 250000 ppm
    assert(out.toSeq == Seq(("c->p", 5L, 1L, 1L, 250000L)))
  }

  test("fdCheck: held and violated dependencies; NULL dependent is a distinct value") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("a")), (1L, Option("a")), // key 1 determines "a"
      (2L, Option("b")), (2L, Option("c")), // key 2 violates
      (3L, Option("d")), (3L, None)         // NULL vs "d" is a real violation
    ).toDF("k", "v")
    val out = Governance.fdCheck(df, "k", "v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(("k", "v", 3L, 2L, false)))
    val held = Governance.fdCheck(df.where(col("k") === 1L), "k", "v").collect()
    assert(held.head.getLong(3) == 0L && held.head.getBoolean(4))
  }

  test("keyUniqueness: dup surplus, max multiplicity, empty input") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k1", "k2")
    val out = Governance.keyUniqueness(df, Seq("k1", "k2")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // 5 rows over 3 keys; (1,a)×3 contributes 2 surplus rows → 400000 ppm
    assert(out.toSeq == Seq(("k1,k2", 5L, 3L, 2L, 3L, 400000L)))
    val empty = Governance.keyUniqueness(
      Seq.empty[(Long, String)].toDF("k1", "k2"), Seq("k1", "k2")).collect()
    assert(empty.head.getLong(1) == 0L && empty.head.isNullAt(5))
  }

  test("cardinalityProfile: counts, exact distinct, modal value with asc tie-break") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), 1, Option.empty[Int]),
      (Option("a"), 1, None),
      (Option("b"), 1, None),
      (None, 2, None)
    ).toDF("s", "i", "c")
    val out = Governance.cardinalityProfile(df, Seq("s", "i", "c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(out.toSeq == Seq(
      ("c", 4L, 0L, 0L, None, None, None),
      ("i", 4L, 4L, 2L, Some("1"), Some(3L), Some(750000L)),
      ("s", 4L, 3L, 2L, Some("a"), Some(2L), Some(666666L))))
  }

  test("benfordScreen: digits from decimal strings, all 9 rows, exact chi2") {
    import spark.implicits._
    // micro magnitudes: 1.0→1, 2.5→2, 0.19→1, 0.000001→1 (m=1), 9.0→9;
    // 0.0 excluded (m=0)
    val df = Seq(1.0, 2.5, 0.19, 0.000001, 9.0, 0.0).toDF("v")
    val out = Governance.benfordScreen(df, "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L)
    val nObs = Map(1 -> 3L, 2 -> 1L, 9 -> 1L).withDefaultValue(0L)
    val n = 5L
    // independent arithmetic path: BigInt re-derivation of the scaled chi2
    val chi2 = (1 to 9).map { dgt =>
      val o = BigInt(nObs(dgt)) * 1000000
      val e = BigInt(benford(dgt - 1)) * n
      (o - e) * (o - e) / e
    }.sum.toLong
    val expected = (1 to 9).map { dgt =>
      (dgt, nObs(dgt), nObs(dgt) * 1000000L / n, benford(dgt - 1), chi2)
    }
    assert(out.toSeq == expected)
  }

  test("benfordScreen: no qualifying values yields 9 rows of zero obs, NULL ppm/chi2") {
    import spark.implicits._
    val out = Governance.benfordScreen(Seq(0.0, 0.0).toDF("v"), "v").collect()
    assert(out.length == 9)
    assert(out.forall(r => r.getLong(1) == 0L && r.isNullAt(2) && r.isNullAt(4)))
  }

  test("nullProfile/nullDrift: planted nulls, ppm rates, signed drift") {
    import spark.implicits._
    val ref = Seq((Option(1), Option("a")), (None, Option("b")),
      (Option(3), None), (Option(4), Option("d"))).toDF("x", "y")
    val prof = graft.ops.Governance.nullProfile(ref, Seq("x", "y"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(prof.toSeq == Seq(("x", 4L, 1L, 250000L), ("y", 4L, 1L, 250000L)))
    val cur = Seq((Option(1), Option("a")), (None, Option("b")),
      (None, Option("c")), (None, Option("d"))).toDF("x", "y")
    val drift = graft.ops.Governance.nullDrift(ref, cur, Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // x: 250000 → 750000 (+500000); y: 250000 → 0 (−250000, signed)
    assert(drift.toSeq == Seq(("x", 250000L, 750000L, 500000L),
      ("y", 250000L, 0L, -250000L)))
  }

  test("krippendorffAlpha: hand-computed 4/9, perfect 1e6, single-label NULL, unit cap raises") {
    import spark.implicits._
    // u1: [a,a], u2: [b,b], u3: [a,b] → n = 6, marginals 3/3,
    // D_o = 2 (the one discordant unit, weight 1/(2−1)),
    // α = 1 − (n−1)·D_o/(n² − Σn_c²) = 1 − 10/18 = 4/9 → 444444 ppm
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"), (3L, "a"), (3L, "b"))
      .toDF("unit", "label")
    val r = graft.ops.Governance.krippendorffAlpha(df, "unit", "label").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 6L, 2L, 444444L)))
    // perfect agreement → exactly 1e6
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("unit", "label")
    assert(graft.ops.Governance.krippendorffAlpha(perfect, "unit", "label")
      .collect().head.getLong(3) == 1000000L)
    // single label everywhere → D_e = 0 → NULL α (not spuriously 1)
    val mono = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("unit", "label")
    assert(graft.ops.Governance.krippendorffAlpha(mono, "unit", "label")
      .collect().head.isNullAt(3))
    // singleton units are unpairable and silently excluded; a unit past
    // the cap refuses in-plan instead of rounding the 1/(n_u−1) weight
    val over = (1 to 20).map(i => (1L, s"l$i")).toDF("unit", "label")
    val e = intercept[Exception] {
      graft.ops.Governance.krippendorffAlpha(over, "unit", "label", maxRatingsPerUnit = 4)
        .collect()
    }
    assert(e.toString.contains("maxRatingsPerUnit") ||
      Option(e.getCause).exists(_.toString.contains("maxRatingsPerUnit")))
  }

  test("cohenKappa: hand-computed rational kappa, perfect/negative/undefined cases") {
    import spark.implicits._
    def kappa(pairs: Seq[(String, String)]): Option[Long] = {
      val r = graft.ops.Governance.cohenKappa(pairs.toDF("a", "b"), "a", "b").head()
      if (r.isNullAt(2)) None else Some(r.getLong(2))
    }
    // N=4, A=3, na=(x:2,y:2), nb=(x:1,y:3) → P=8, κ=(12−8)/(16−8)=0.5
    assert(kappa(Seq(("x", "x"), ("x", "y"), ("y", "y"), ("y", "y"))) == Some(500000L))
    assert(kappa(Seq(("x", "x"), ("y", "y"))) == Some(1000000L))
    // full systematic disagreement on balanced marginals → κ = −1
    assert(kappa(Seq(("x", "y"), ("y", "x"))) == Some(-1000000L))
    // one class on both sides: chance agreement 1, κ undefined
    assert(kappa(Seq(("x", "x"), ("x", "x"))) == None)
  }

  test("psiDrift of a snapshot against itself is zero in every bucket") {
    import spark.implicits._
    val df = Seq(0.1, 0.6, -0.3, 1.4, 0.6).toDF("value")
    val out = Governance.psiDrift(df, df, "value", Seq(0.0, 0.5, 1.0)).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(3) == 0.0, r))
  }

  test("psiDrift: buckets, one-sided coalesce, smoothing match the formula") {
    import spark.implicits._
    val ref = Seq(0.1, 0.6, 0.6).toDF("value")
    val cur = Seq(0.1, -0.7).toDF("value")
    val out = Governance.psiDrift(ref, cur, "value", Seq(0.0, 0.5))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // buckets: <0 → 0, [0,0.5) → 1, ≥0.5 → 2; bucket 0 exists only on
    // the cur side and must be coalesced in with ref_n = 0
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((0, 0L, 1L), (1, 1L, 1L), (2, 2L, 0L)))
    def term(rn: Long, cn: Long): Double = {
      val p = (rn + 0.5) / (3 + 0.5 * 3)
      val q = (cn + 0.5) / (2 + 0.5 * 3)
      BigDecimal((p - q) * math.log(p / q))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    }
    out.foreach { case (_, rn, cn, got) => assert(got == term(rn, cn), (rn, cn)) }
    // and a drifted pair is asymmetric in sign but positive in sum
    assert(out.map(_._4).sum > 0.0)
  }

  test("lDiversity: distinct sensitive values per class, meets flag") {
    import spark.implicits._
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"),  // 3 rows, 2 distinct → meets l=2
      ("b", "z"), ("b", "z"),              // 2 rows, 1 distinct → violates
      ("c", null.asInstanceOf[String])     // NULL is a (single) value
    ).toDF("qi", "sensitive")
    val out = Governance.lDiversity(df, Seq("qi"), "sensitive", l = 2L)
      .orderBy("qi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("a", 3L, 2L, true), ("b", 2L, 1L, false), ("c", 1L, 1L, false)))
  }

  test("freshnessReport: age vs high-water mark, floor buckets") {
    import spark.implicits._
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      ("a", at(95)), ("a", at(100)),  // newest key: age 0, bucket 0
      ("b", at(90)),                  // age 10 → bucket 1 at width 10
      ("c", at(81))                   // age 19 → still bucket 1
    ).toDF("k", "ts")
    val out = Governance.freshnessReport(df, "k", bucketSeconds = 10L)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 2L, 100L, 0L, 0L), ("b", 1L, 90L, 10L, 1L), ("c", 1L, 81L, 19L, 1L)))
  }

  test("sequenceAudit: dense, duplicated, shifted, and gapped groups") {
    import spark.implicits._
    val df = Seq(
      ("g1", 1L), ("g1", 2L), ("g1", 3L),  // dense 1..3
      ("g2", 1L), ("g2", 2L), ("g2", 2L),  // duplicate (span matches, not gapped)
      ("g3", 2L), ("g3", 3L),              // shifted run: not dense, NOT gapped
      ("g4", 1L), ("g4", 3L)               // internal hole → gapped, excess 1
    ).toDF("grp", "seq")
    val out = Governance.sequenceAudit(df, "grp", "seq", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(("t", 4L, 1L, 1L, 1L, 1L)))
  }

  test("tableFingerprint: identical replicas agree; one changed row flips exactly its bucket") {
    import spark.implicits._
    def fp(rows: Seq[String]) = Governance.tableFingerprint(
        rows.toDF("r"), col("r"), nBuckets = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val base = (1 to 40).map(i => s"row|$i")
    val a = fp(base)
    val b = fp(scala.util.Random.shuffle(base))  // order-independence
    assert(a == b)
    val mutated = fp(base.updated(7, "row|8-CHANGED"))
    val diff = a.toSet.diff(mutated.toSet)
    // the change moves/changes at most 2 buckets (its old and new one)
    assert(diff.nonEmpty && diff.size <= 2, diff)
    // untouched buckets are bit-identical
    assert(a.toSet.intersect(mutated.toSet).size >= a.size - 2)
  }

  test("joinCardinality: exact Σ nA·nB, hot key first, no join executed") {
    import spark.implicits._
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")       // counts: 1→3, 2→1, 3→1
    val b = Seq(1L, 1L, 2L, 9L).toDF("j")           // counts: 1→2, 2→1, 9→1
    val out = Governance.joinCardinality(a, b, "k", "j", topK = 5).collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // true join size: 3·2 + 1·1 = 7; key 9 matches nothing
    assert(out.toSeq == Seq(
      ("HOT_KEY", Some("1"), 3L, 2L, "6"),
      ("HOT_KEY", Some("2"), 1L, 1L, "1"),
      ("TOTAL", None, 4L, 3L, "7")))
    // and the real join agrees with the estimate
    assert(a.join(b, col("k") === col("j")).count() == 7L)
  }

  test("partitionBalance: simulated exchange conserves rows, integer imbalance") {
    import spark.implicits._
    val df = (1L to 100L).map(i => i % 10).toDF("k")  // 10 hot levels
    val out = Governance.partitionBalance(df, "k", nParts = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._2).sum == 100L)
    assert(out.forall(t => t._1 >= 0 && t._1 < 4))
    // shares are the integral ppm of each partition
    assert(out.forall(t => t._3 == t._2 * 1000000L / 100L))
    // one global imbalance number, consistent with the declared formula
    val mx = out.map(_._2).max; val np = out.length
    assert(out.forall(_._4 == mx * np * 1000000L / 100L))
    // determinism: same input → identical partitioning
    assert(Governance.partitionBalance(df, "k", nParts = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == out.map(t => (t._1, t._2)).toSeq)
  }

  test("mutualInformation: independence is 0, identity is H(A), per-cell terms") {
    import spark.implicits._
    // independent balanced 2×2 → every term ln(1) = 0
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val i = Governance.mutualInformation(indep, "a", "b").collect()
    assert(i.forall(_.getDouble(3) == 0.0) && i.head.getDouble(4) == 0.0)
    // perfect dependence with balanced classes: MI = H(A) = ln 2
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")).toDF("a", "b")
    val d = Governance.mutualInformation(dep, "a", "b").collect()
    val ln2 = BigDecimal(0.5 * math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d.forall(_.getDouble(3) == ln2))
    assert(math.abs(d.head.getDouble(4) - math.log(2.0)) < 2e-6)
  }

  test("mcnemar: discordant counts, exact chi2 ppm, no-evidence NULLs") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val df = Seq(
      (1L, 1L, 1L),   // both right
      (1L, 1L, 0L),   // a only
      (1L, 1L, 0L),   // a only
      (1L, 0L, 1L),   // b only
      (1L, 0L, 0L)    // both wrong
    ).toDF("t", "a", "b")
    val r = graft.ops.Governance.mcnemar(df, "t", "a", "b").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((5L, 1L, 1L, 2L, 1L)))
    // χ² = (2−1)²/3 → 333333 ppm; far below the 3.841 critical value
    assert(r.getLong(5) == 333333L && !r.getBoolean(6))
    // perfectly concordant raters: no discordant evidence → NULLs
    val conc = Seq((1L, 1L, 1L), (2L, 0L, 0L)).toDF("t", "a", "b")
    val c = graft.ops.Governance.mcnemar(conc, "t", "a", "b").collect()(0)
    assert(c.isNullAt(5) && c.isNullAt(6))
  }

  test("tCloseness: mirroring class scores 0, skewed classes exact 250000 ppm, zero cells counted") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "x"), ("B", "y"), ("B", "y"), ("B", "y"),
      ("C", "x"), ("C", "x"), ("C", "y"), ("C", "y")
    ).toDF("qi", "s")
    val out = graft.ops.Governance.tCloseness(df, Seq("qi"), "s", tPpm = 200000L)
      .orderBy("qi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // global 6x/6y, N=12; A: |36−24|+|12−24| = 24 → 24e6/96 = 250000
    assert(out.toSeq == Seq(
      ("A", 4L, 250000L, false), ("B", 4L, 250000L, false),
      ("C", 4L, 0L, true)))
    // a class missing a sensitive value entirely pays the zero-cell term
    val skew = Seq(("D", "x"), ("D", "x"), ("E", "y"), ("E", "y")).toDF("qi", "s")
    val o2 = graft.ops.Governance.tCloseness(skew, Seq("qi"), "s", tPpm = 999999L)
      .orderBy("qi").collect().map(r => (r.getString(0), r.getLong(2)))
    // D holds only x vs global 50/50 → t = ½(|1−½|+|0−½|) = ½ → 500000
    assert(o2.toSeq == Seq(("D", 500000L), ("E", 500000L)))
  }

  test("adjustedRand: sklearn-checked value, identity = 1e6, trivial-vs-any = 0, undefined = NULL") {
    import spark.implicits._
    def ari(pairs: Seq[(String, String)]): (Long, Option[Long]) = {
      val r = graft.ops.Governance.adjustedRand(pairs.toDF("a", "b"), "a", "b").collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
    }
    // sklearn.metrics.adjusted_rand_score([0,0,1,1],[0,0,1,2]) = 0.5714…
    assert(ari(Seq(("0", "0"), ("0", "0"), ("1", "1"), ("1", "2"))) ==
      ((4L, Some(571428L))))
    // identical partitions → exactly 1e6; label names don't matter
    assert(ari(Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"), ("z", "r"))) ==
      ((5L, Some(1000000L))))
    // one-block partition vs anything → 0 (chance level, the known result)
    assert(ari(Seq(("k", "x"), ("k", "x"), ("k", "y"), ("k", "y"), ("k", "z"))) ==
      ((5L, Some(0L))))
    // both partitions all-singletons → denominator 0 → NULL (undefined)
    assert(ari(Seq(("1", "a"), ("2", "b"), ("3", "c"))) == ((3L, None)))
    // below-chance case floors toward -inf (negative ppm, never toward 0):
    // A splits {1,2}{3,4}, B splits {1,3}{2,4} → ARI = -0.5
    assert(ari(Seq(("p", "m"), ("p", "n"), ("q", "m"), ("q", "n"))) ==
      ((4L, Some(-500000L))))
    // empty input: zero-count row, NULL index (krippendorff convention)
    assert(ari(Seq.empty) == ((0L, None)))
  }

  test("disparateImpact: ppm rates, max reference with lexicographic tiebreak, 80% rule") {
    import spark.implicits._
    // rates: a 3/4 = 750000, b 1/2 = 500000, c 3/4 = 750000
    // ref rate 750000, ref group 'a' (lexicographic among ties);
    // b ratio = 500000*1e6 div 750000 = 666666 -> fails four-fifths
    val df = (Seq.fill(3)(("a", 1)) ++ Seq(("a", 0)) ++
      Seq(("b", 1), ("b", 0)) ++
      Seq.fill(3)(("c", 1)) ++ Seq(("c", 0))).toDF("g", "y")
    val out = Governance.disparateImpact(df, "g", "y")
      .select("group", "n", "n_pos", "rate_ppm", "ref_group",
        "ratio_vs_ref_ppm", "four_fifths_fail")
      .as[(String, Long, Long, Long, String, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("a", 4L, 3L, 750000L, "a", 1000000L, false),
      ("b", 2L, 1L, 500000L, "a", 666666L, true),
      ("c", 4L, 3L, 750000L, "a", 1000000L, false)))
    // nothing positive anywhere: NULL ratios, conservative false flags
    val zero = Seq(("a", 0), ("b", 0)).toDF("g", "y")
    val z = Governance.disparateImpact(zero, "g", "y").collect()
    assert(z.forall(r => r.isNullAt(r.fieldIndex("ratio_vs_ref_ppm")) &&
      !r.getAs[Boolean]("four_fifths_fail")))
    val badLabel = Seq(("a", 2)).toDF("g", "y")
    val err = intercept[Exception] {
      Governance.disparateImpact(badLabel, "g", "y").collect()
    }
    assert(err.toString.contains("positive flag") ||
      Option(err.getCause).exists(_.toString.contains("positive flag")))
    assert(Governance.disparateImpact(
      Seq.empty[(String, Int)].toDF("g", "y"), "g", "y").count() == 0)
  }
}
