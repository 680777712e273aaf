package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

/** F14: Ratcliff/Obershelp parity with Python difflib.SequenceMatcher
  * (golden values computed with CPython difflib) + metric properties
  * (seeded random strings — deterministic). */
class SimilaritySpec extends AnyFunSuite {

  private val golden = Seq(
    ("DERCO S.A.", "DERCO", 0.6666666666666666),
    ("KAUFMANN", "KAUFMAN SA", 0.7777777777777778),
    ("PORSCHE CHILE", "PORSCHECHILESPA", 0.8571428571428571),
    ("ABCD", "ABCD", 1.0),
    ("", "", 1.0),
    ("A", "", 0.0),
    ("GILDEMEISTER", "GILDEMEISTERSPA", 0.8888888888888888),
    ("SALFA", "SALAZAR", 0.6666666666666666),
    ("ABCDEF", "DEFABC", 0.5))

  test("matches difflib golden ratios") {
    golden.foreach { case (a, b, expected) =>
      assert(math.abs(Similarity.ratio(a, b) - expected) < 1e-12, s"ratio($a, $b)")
    }
  }

  test("elements are code points, like Python 3 strings (astral parity)") {
    // golden values from CPython difflib on the same strings: a
    // supplementary-plane char is ONE element, not a UTF-16 surrogate pair
    assert(math.abs(Similarity.ratio("😀", "😀a") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(Similarity.ratio("😀😀😀😀a", "😀😀😀😀b") - 0.8) < 1e-12)
    assert(math.abs(Similarity.ratio("𝕏ray", "Xray") - 0.75) < 1e-12)
    assert(Similarity.ratio("😀😀😀", "😀😀😀") == 1.0)
  }

  test("null-safe") {
    assert(Similarity.ratio(null, "x") == 0.0)
    assert(Similarity.ratio("x", null) == 0.0)
  }

  test("property: range, identity, symmetry") {
    val rnd = new scala.util.Random(42)
    def randStr(): String =
      (0 until rnd.nextInt(13)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 500).foreach { _ =>
      val a = randStr(); val b = randStr()
      val r = Similarity.ratio(a, b)
      assert(r >= 0.0 && r <= 1.0)
      assert(Similarity.ratio(a, a) == 1.0)
      // like difflib, the metric is not exactly symmetric (tie-break
      // asymmetry in block selection); but it can only differ slightly
      assert(math.abs(r - Similarity.ratio(b, a)) < 0.25)
    }
  }

  test("jaroWinkler: census-linkage textbook values (DuckDB-probed)") {
    def jw(a: String, b: String) =
      BigDecimal(Similarity.jaroWinkler(a, b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(jw("MARTHA", "MARHTA") == 0.961111)   // jaro 0.944444, prefix 3
    assert(jw("DIXON", "DICKSONX") == 0.813333)  // jaro 0.766667, prefix 2
    assert(jw("DWAYNE", "DUANE") == 0.84)
    assert(jw("abc", "abc") == 1.0)
    // empty-side convention: 0.0, even for two empties (no evidence)
    assert(Similarity.jaroWinkler("", "abc") == 0.0)
    assert(Similarity.jaroWinkler("", "") == 0.0)
    assert(Similarity.jaroWinkler(null, "x") == 0.0)
    // the 0.7 boost threshold: same 1-char prefix, low jaro → NO boost
    assert(jw("aXXXXX", "aYYYYY") == 0.444444)
    assert(jw("abcdXXXX", "abcdYYYY") == 0.666667)
    // above threshold the prefix caps at 4 even with 5 shared chars
    assert(jw("abcdeX", "abcdeY") == 0.933333)
    // disjoint-window characters never match
    assert(Similarity.jaroWinkler("ab", "ba") == 0.0)
  }

  test("jaroWinkler property: range and symmetry (fully symmetric, unlike ratio)") {
    val rnd = new scala.util.Random(7)
    def randStr(): String =
      (0 until rnd.nextInt(11)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    (1 to 500).foreach { _ =>
      val a = randStr(); val b = randStr()
      val r = Similarity.jaroWinkler(a, b)
      assert(r >= 0.0 && r <= 1.0)
      assert(r == Similarity.jaroWinkler(b, a))
      if (a.nonEmpty) assert(Similarity.jaroWinkler(a, a) == 1.0)
    }
  }
}
