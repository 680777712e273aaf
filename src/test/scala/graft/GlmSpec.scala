package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Glm

/** Logistic-regression trainer: exact replay of the pinned integer
  * trajectory, separability direction, and the loud contracts. */
class GlmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The op's exact arithmetic, replayed: micro features (intercept
    * prepended), round-6 logit off the BigInt dot, floored micro
    * sigmoid, integer residual gradient, re-signed floored update. */
  private def replay(
      rows: Seq[(Int, Seq[Double])],
      iters: Int,
      lrMicro: Long): Array[Long] = {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val feats = rows.map { case (y, xs) =>
      (y.toLong, 1000000L +: xs.map(x => math.floor(x * 1000000.0).toLong))
    }
    val d = feats.head._2.length
    val n = feats.length.toLong
    val den = BigInt("1000000000000") * n
    val w = Array.fill(d)(0L)
    for (_ <- 1 to iters) {
      val g = Array.fill(d)(BigInt(0))
      feats.foreach { case (y, xs) =>
        val dot = xs.zip(w).map { case (x, wj) => BigInt(x) * wj }.sum
        val z = r6(dot.toDouble / 1.0e12)
        val p = math.floor(1000000.0 / (1.0 + math.exp(-z))).toLong
        val r = y * 1000000L - p
        (0 until d).foreach(j => g(j) += BigInt(r) * xs(j))
      }
      (0 until d).foreach { j =>
        val num = BigInt(lrMicro) * g(j)
        val delta = if (num.signum >= 0) num / den else -((-num) / den)
        w(j) = w(j) + delta.toLong
      }
    }
    w
  }

  test("logisticFit: matches the BigInt trajectory replay; learns the separating direction") {
    import spark.implicits._
    // y = 1 iff x1 > 0.5, x2 is noise
    val data = Seq(
      (1, Seq(0.9, 0.2)), (1, Seq(0.8, 0.7)), (1, Seq(0.7, 0.1)),
      (1, Seq(0.95, 0.5)), (0, Seq(0.1, 0.6)), (0, Seq(0.2, 0.1)),
      (0, Seq(0.3, 0.8)), (0, Seq(0.05, 0.3)))
    val df = data.toDF("y", "x")
    val fit = Glm.logisticFit(df, "x", "y", iters = 10, lrMicro = 2000000L)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expect = replay(data, iters = 10, lrMicro = 2000000L)
    assert(fit == expect.zipWithIndex.map { case (wv, j) => j -> wv }.toMap)
    assert(fit(1) > 0L)            // the separating feature gets weight
    assert(math.abs(fit(2)) < fit(1)) // noise stays smaller
    // the fitted scores separate the classes
    val w = expect
    def score(xs: Seq[Double]): Double = {
      val xq = 1000000L +: xs.map(x => math.floor(x * 1000000.0).toLong)
      val dot = xq.zip(w).map { case (x, wj) => BigInt(x) * wj }.sum
      1.0 / (1.0 + math.exp(-dot.toDouble / 1.0e12))
    }
    assert(score(Seq(0.9, 0.5)) > score(Seq(0.1, 0.5)))
  }

  test("logisticScore: serve-time scores replay the training arithmetic exactly; contracts") {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w = Seq(-100000L, 2000000L, -500000L) // intercept + 2 features
    val data = Seq(Seq(0.9, 0.2), Seq(0.1, 0.6), Seq(0.5, 0.5))
    val out = Glm.logisticScore(data.map(Tuple1(_)).toDF("x"), "x", w)
      .select(col("score_micro")).collect().map(_.getLong(0)).toSeq
    val expect = data.map { xs =>
      val xq = 1000000L +: xs.map(x => math.floor(x * 1000000.0).toLong)
      val dot = xq.zip(w).map { case (x, wj) => BigInt(x) * wj }.sum
      val z = r6(dot.toDouble / 1.0e12)
      math.floor(1000000.0 / (1.0 + math.exp(-z))).toLong
    }
    assert(out == expect)
    val short = Glm.logisticScore(Seq(Tuple1(Seq(1.0))).toDF("x"), "x", w)
    val err = intercept[Exception] { short.collect() }
    assert(err.toString.contains("expected 3 features") ||
      Option(err.getCause).exists(_.toString.contains("expected 3 features")))
  }

  test("logisticFit: n_rows and intercept-only fit; loud contracts; empty input") {
    import spark.implicits._
    // no intercept, single feature, all-positive labels: weight climbs
    val pos = Seq((1, Seq(1.0)), (1, Seq(2.0))).toDF("y", "x")
    val f = Glm.logisticFit(pos, "x", "y", iters = 2, addIntercept = false)
      .collect()
    assert(f.length == 1 && f.head.getLong(2) == 2L && f.head.getLong(1) > 0L)
    val bad = Seq((2, Seq(1.0))).toDF("y", "x")
    val e1 = intercept[Exception] { Glm.logisticFit(bad, "x", "y", iters = 1) }
    assert(e1.toString.contains("label must be 0 or 1") ||
      Option(e1.getCause).exists(_.toString.contains("label must be 0 or 1")))
    val ragged = Seq((1, Seq(1.0)), (0, Seq(1.0, 2.0))).toDF("y", "x")
    val e2 = intercept[Exception] { Glm.logisticFit(ragged, "x", "y", iters = 1) }
    assert(e2.toString.contains("ragged"))
    assert(Glm.logisticFit(Seq.empty[(Int, Seq[Double])].toDF("y", "x"),
      "x", "y").count() == 0)
    // NULL feature vectors raise (train/serve symmetry with
    // logisticScore), never a silent drop that shrinks the gradient n
    val withNull = Seq((1, Seq(1.0)), (0, null: Seq[Double])).toDF("y", "x")
    val e3 = intercept[Exception] { Glm.logisticFit(withNull, "x", "y", iters = 1) }
    assert(e3.toString.contains("NULL feature vector") ||
      Option(e3.getCause).exists(_.toString.contains("NULL feature vector")))
  }

  test("calibrationReport: exact integer bins, rates and Brier; contracts") {
    import spark.implicits._
    // scores pinned by hand: bin = min(bins-1, s*4 div 1e6) at bins=4
    val rows = Seq(
      (100000L, 0), (200000L, 0),  // bin 0: mean 150000, rate 0, brier (1e10+4e10)/(2e6)=25000
      (600000L, 1), (700000L, 0),  // bin 2: mean 650000, rate 500000ppm
      (1000000L, 1))               // s*4 div 1e6 = 4 -> clamped to bin 3; perfect -> brier 0
      .toDF("s", "y")
    val out = Glm.calibrationReport(rows, "s", "y", bins = 4)
      .select("bin", "n", "mean_score_micro", "event_rate_ppm", "brier_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // bin2 brier: (0.6-1)^2 + (0.7-0)^2 = (16e10 + 49e10)/(2e6) = 325000
    assert(out == Seq(
      (0L, 2L, 150000L, 0L, 25000L),
      (2L, 2L, 650000L, 500000L, 325000L),
      (3L, 1L, 1000000L, 1000000L, 0L)))
    val e1 = intercept[Exception] {
      Glm.calibrationReport(Seq((1000001L, 1)).toDF("s", "y"), "s", "y").collect()
    }
    assert(e1.toString.contains("score_micro") ||
      Option(e1.getCause).exists(_.toString.contains("score_micro")))
    val e2 = intercept[Exception] {
      Glm.calibrationReport(Seq((5000L, 7)).toDF("s", "y"), "s", "y").collect()
    }
    assert(e2.toString.contains("label must be 0 or 1") ||
      Option(e2.getCause).exists(_.toString.contains("label must be 0 or 1")))
    assert(Glm.calibrationReport(
      Seq.empty[(Long, Int)].toDF("s", "y"), "s", "y").count() == 0)
  }
}
