package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pca

/** Fixed-point power-iteration PCA: the dominant direction orders
  * projections correctly, and the trajectory is reshuffle-stable. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("projections order along the dominant axis of an anisotropic cloud") {
    // variance overwhelmingly along (1,1): projections must order the
    // points by their position on that axis (sign of the direction is
    // init-dependent, so compare up to global flip)
    val vecs = Seq(
      (1L, Array(-10.0f, -10.2f)), (2L, Array(-5.0f, -4.9f)),
      (3L, Array(0.1f, 0.0f)), (4L, Array(5.2f, 5.0f)), (5L, Array(10.0f, 10.1f))
    ).toDF("vec_id", "embedding")
    val out = Pca.pcaTop1(vecs, "vec_id", "embedding", iters = 3)
      .orderBy("vec_id").collect().map(_.getLong(1))
    val ordered = out.zip(out.tail).forall { case (a, b) => a < b }
    val reversed = out.zip(out.tail).forall { case (a, b) => a > b }
    assert(ordered || reversed, out.mkString(","))
  }

  test("deterministic across repartition; degenerate constant corpus projects to zero") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(-1.0f, 0.0f, 1.0f)),
      (3L, Array(2.0f, -2.0f, 0.5f)), (4L, Array(0.0f, 1.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val a = Pca.pcaTop1(vecs, "vec_id", "embedding").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Pca.pcaTop1(vecs.repartition(5), "vec_id", "embedding").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)

    val const = Seq((1L, Array(2.0f, 2.0f)), (2L, Array(2.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = Pca.pcaTop1(const, "vec_id", "embedding").collect().map(_.getLong(1))
    assert(out.forall(_ == 0L))
  }

  test("dimProfile: constant dim scores zero variance and the last rank") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.0f, 2.0f)), (2L, Array(0.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val out = Pca.dimProfile(vecs, "embedding").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // dim 1: mean 3e6 micro, var (2·2e13 − 3.6e13)/4 = 1e12 micro²
    assert(out.toSeq == Seq(
      (0, 2L, 0L, 0L, 2L),
      (1, 2L, 3000000L, 1000000000000L, 1L)))
  }
}
