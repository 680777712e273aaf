package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Eval

/** Exact ROC/PR curve: hand-pinned suffix counts and ppm rates. */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rocPrCurve: suffix confusion counts per distinct score; contracts") {
    import spark.implicits._
    // scores: 900000 (pos), 700000 (pos, neg), 200000 (neg)
    val df = Seq(
      (900000L, 1), (700000L, 1), (700000L, 0), (200000L, 0))
      .toDF("s", "y")
    val out = Eval.rocPrCurve(df, "s", "y")
      .select("threshold_micro", "n_pos_ge", "n_neg_ge", "tpr_ppm",
        "fpr_ppm", "precision_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (900000L, 1L, 0L, 500000L, 0L, 1000000L),
      (700000L, 2L, 1L, 1000000L, 500000L, 666666L),
      (200000L, 2L, 2L, 1000000L, 1000000L, 500000L)))
    // one-class input raises rather than emitting division garbage
    val onesided = Seq((500000L, 1), (400000L, 1)).toDF("s", "y")
    val err = intercept[Exception] { Eval.rocPrCurve(onesided, "s", "y").collect() }
    assert(err.toString.contains("both classes") ||
      Option(err.getCause).exists(_.toString.contains("both classes")))
    val bad = Seq((2000000L, 1)).toDF("s", "y")
    val e2 = intercept[Exception] { Eval.rocPrCurve(bad, "s", "y").collect() }
    assert(e2.toString.contains("score_micro") ||
      Option(e2.getCause).exists(_.toString.contains("score_micro")))
    assert(Eval.rocPrCurve(
      Seq.empty[(Long, Int)].toDF("s", "y"), "s", "y").count() == 0)
  }
}
