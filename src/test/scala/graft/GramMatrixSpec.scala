package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GramMatrixAgg

/** Native Gram-matrix aggregate: exact BigInt equality against a
  * driver-side reference (including negative components — the 128-bit
  * carry path), invariance to partitioning, and the ragged-vector
  * raise. */
class GramMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gram(vecs: Seq[Array[Long]], parts: Int): Seq[BigInt] = {
    val df = vecs.map(Tuple1(_)).toDF("x").repartition(parts)
    df.agg(toCol(GramMatrixAgg(toExpr(col("x"))).toAggregateExpression()).as("g"))
      .first().getSeq[java.math.BigDecimal](0)
      .map(bd => BigInt(bd.toBigInteger))
  }

  private def reference(vecs: Seq[Array[Long]]): Seq[BigInt] = {
    val d = vecs.head.length
    for (i <- 0 until d; j <- i until d) yield
      vecs.foldLeft(BigInt(0))((acc, v) => acc + BigInt(v(i)) * BigInt(v(j)))
  }

  test("exact on mixed-sign vectors, any partitioning") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(200)(Array.fill(5)(rnd.nextLong() % 1000000L))
    val want = reference(vecs)
    assert(gram(vecs, 1) == want)
    assert(gram(vecs, 13) == want) // partial-merge path must agree
  }

  test("128-bit carry: products past 2^63 accumulate exactly") {
    // each product is ~4e18·4e18/4 ≈ 4e36 — far beyond a long; the sum
    // of two such rows exercises hi-word accumulation and the carry
    val big = 2000000000000000000L // 2e18
    val vecs = Seq(Array(big, -big), Array(big, big))
    assert(gram(vecs, 2) == reference(vecs))
  }

  test("overflow past DECIMAL(38,0) raises loudly") {
    val big = 9000000000000000000L // 9e18; 9e18² = 8.1e37, ×2 rows > 1e38
    val vecs = Seq(Array(big), Array(big), Array(big))
    val e = intercept[Exception] {
      gram(vecs, 1)
    }
    assert(e.toString.contains("gram_matrix") ||
      Option(e.getCause).exists(_.toString.contains("gram_matrix")))
  }

  test("ragged vectors raise, never mis-index") {
    val df = Seq(Tuple1(Array(1L, 2L)), Tuple1(Array(1L, 2L, 3L))).toDF("x")
    val e = intercept[Exception] {
      df.agg(toCol(GramMatrixAgg(toExpr(col("x"))).toAggregateExpression()))
        .collect()
    }
    // the raise may surface from update ("ragged") or, when the rows
    // land in different partitions, from merge ("merging buffers")
    assert(e.toString.contains("gram_matrix") ||
      Option(e.getCause).exists(_.toString.contains("gram_matrix")))
  }
}
