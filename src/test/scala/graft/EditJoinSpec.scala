package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FuzzyJoin

/** Deletion-neighborhood (SymSpell) edit-distance-1 join: exactness of
  * the blocking rule in all three edit modes, false-positive rejection,
  * and dist-0 duplicate handling. */
class EditJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)]): Set[(Long, Long, Int)] =
    FuzzyJoin.editNeighbors(rows.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("substitution, insertion, deletion neighbors all surface; far pairs don't") {
    val out = pairs(Seq(
      1L -> "karen", 2L -> "caren",  // substitution
      3L -> "karens",               // insertion vs 1
      4L -> "kren",                 // deletion vs 1
      5L -> "zzzzz"                 // unrelated
    ))
    assert(out == Set((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1)))
  }

  test("shared deletion variant at distance 2 is verified away") {
    // "ab" and "ba" share deletion variants "a" and "b" but dist = 2
    assert(pairs(Seq(1L -> "ab", 2L -> "ba")).isEmpty)
  }

  test("exact duplicates pair at dist 0, once") {
    assert(pairs(Seq(1L -> "same", 2L -> "same")) == Set((1L, 2L, 0)))
  }

  test("matches brute force on a numbered-name corpus") {
    val names = (0 until 60).map(i => i.toLong -> f"Supplier#$i%04d")
    val brute = (for {
      (ia, sa) <- names; (ib, sb) <- names if ia < ib
      d = {
        // classic DP Levenshtein
        val m = Array.tabulate(sa.length + 1, sb.length + 1) { (x, y) =>
          if (x == 0) y else if (y == 0) x else 0 }
        for (x <- 1 to sa.length; y <- 1 to sb.length)
          m(x)(y) = math.min(math.min(m(x - 1)(y) + 1, m(x)(y - 1) + 1),
            m(x - 1)(y - 1) + (if (sa(x - 1) == sb(y - 1)) 0 else 1))
        m(sa.length)(sb.length)
      } if d <= 1
    } yield (ia, ib, d)).toSet
    assert(pairs(names) == brute)
    assert(brute.nonEmpty) // the corpus really has single-digit neighbors
  }
}
