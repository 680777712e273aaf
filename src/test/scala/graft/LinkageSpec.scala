package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FuzzyJoin

/** Fellegi–Sunter probabilistic record linkage: hand-replayed exact
  * rational likelihood ratios, the missing-field convention, the
  * three-way decision rule, and the no-all-pairs blocking contract. */
class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fields = Seq(
    ("phone", 900000L, 100000L), // agree 9×, disagree (1e5/9e5) = 1/9
    ("city", 800000L, 400000L))  // agree 2×, disagree (2e5/6e5) = 1/3

  test("fellegiSunter: hand-computed ratios, missing fields carry no evidence, decisions split on thresholds") {
    val a = Seq(
      (1L, "b1", "555", "lyon"),
      (2L, "b1", "777", "nice"),
      (3L, "b2", "111", null.asInstanceOf[String])
    ).toDF("id", "blk", "phone", "city")
    val b = Seq(
      (10L, "b1", "555", "lyon"),  // vs 1: both agree → 9 × 2 = 18×
      (11L, "b1", "555", "nice"),  // vs 1: phone agree, city disagree → 9 × 1/3 = 3×
      (30L, "b2", "111", "rome")   // vs 3: phone agree, city MISSING → 9×
    ).toDF("id", "blk", "phone", "city")
    val out = FuzzyJoin.fellegiSunter(a, b, "id", "id", "blk", fields,
        lowerPpm = 4000000L, upperPpm = 10000000L)
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    // block b1 pairs all of {1,2} × {10,11}; block b2 pairs 3 × 30 only
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 30L)))
    val m = out.map(t => (t._1, t._2) -> t).toMap
    // 1–10: agree both → lr = (9/1)·(2/1) = 18 → 18e6 ppm, match
    assert(m((1L, 10L)) == ((1L, 10L, 2L, 0L, 18000000L, "match")))
    // 1–11: 9 · 1/3 = 3 → 3e6, below lower → non_match
    assert(m((1L, 11L)) == ((1L, 11L, 1L, 1L, 3000000L, "non_match")))
    // 2–10/2–11: phone disagrees → (1/9)·(1/3) = 37037 ppm or (1/9)·2
    assert(m((2L, 10L)) == ((2L, 10L, 0L, 2L, 37037L, "non_match")))
    assert(m((2L, 11L)) == ((2L, 11L, 1L, 1L, 222222L, "non_match")))
    // 3–30: city missing on the A side → factor 1, evidence is phone
    // alone: 9 → 9e6, inside [lower, upper) → possible
    assert(m((3L, 30L)) == ((3L, 30L, 1L, 0L, 9000000L, "possible")))
  }

  test("fellegiSunter: rows in different blocks are never paired (no all-pairs path)") {
    val a = Seq((1L, "b1", "555", "lyon")).toDF("id", "blk", "phone", "city")
    val b = Seq((9L, "zz", "555", "lyon")).toDF("id", "blk", "phone", "city")
    // identical fields but disjoint blocks → zero candidates by design
    assert(FuzzyJoin.fellegiSunter(a, b, "id", "id", "blk", fields).collect().isEmpty)
  }

  test("fellegiSunter: field-count and ppm-range guards") {
    val df = Seq((1L, "b", "x")).toDF("id", "blk", "f")
    intercept[IllegalArgumentException] {
      FuzzyJoin.fellegiSunter(df, df, "id", "id", "blk",
        (1 to 6).map(i => (s"f$i", 900000L, 1000L)))
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.fellegiSunter(df, df, "id", "id", "blk",
        Seq(("f", 1000000L, 1000L))) // m_ppm = 1e6 → zero disagreement den
    }
  }
}
