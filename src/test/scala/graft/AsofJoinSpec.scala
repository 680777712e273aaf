package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsofJoin

/** As-of join: inclusive most-recent-prior semantics, left-join nulls,
  * per-key isolation, and the single-shuffle plan shape. */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def left = Seq(
    (1L, "u1", 10L, "a"),
    (2L, "u1", 20L, "b"),
    (3L, "u1", 9L, "c"),
    (4L, "u2", 5L, "d"),
    (5L, "u3", 100L, "e") // key with no right rows at all
  ).toDF("id", "user", "ts", "tag")

  private def right = Seq(
    ("u1", 10L, 1.0),
    ("u1", 15L, 2.0),
    ("u2", 50L, 9.0)
  ).toDF("user", "ts", "v")

  test("latest right row at or before each left row, per key; nulls when none") {
    val out = AsofJoin.asofJoin(left, right, Seq("user"), "ts", Seq("v"))
      .orderBy("id").collect()
    def v(i: Int): Option[Double] = {
      val idx = out(i).fieldIndex("asof_v")
      if (out(i).isNullAt(idx)) None else Some(out(i).getDouble(idx))
    }
    assert(v(0).contains(1.0), "equal timestamps match (inclusive)")
    assert(v(1).contains(2.0), "latest prior, not first")
    assert(v(2).isEmpty, "right row strictly after must not match")
    assert(v(3).isEmpty, "other user's rows invisible")
    assert(v(4).isEmpty, "key absent from right side")
    // every left row and column survives
    assert(out.length == 5 && out(0).getString(out(0).fieldIndex("tag")) == "a")
  }

  test("plan: one hash shuffle on the by-key, no cartesian or range join") {
    val p = AsofJoin.asofJoin(left, right, Seq("user"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("asofNearest: closer side wins, equidistant tie takes the earlier row") {
    val r2 = Seq(
      ("u1", 8L, 0.5), ("u1", 10L, 1.0), ("u1", 15L, 2.0),
      ("u2", 50L, 9.0)
    ).toDF("user", "ts", "v")
    val out = AsofJoin.asofNearest(left, r2, Seq("user"), "ts", Seq("v"))
      .orderBy("id").collect()
    def row(i: Int): (Option[Double], Option[Long], Option[Int]) = {
      def opt[T](n: String, get: Int => T): Option[T] = {
        val idx = out(i).fieldIndex(n)
        if (out(i).isNullAt(idx)) None else Some(get(idx))
      }
      (opt("near_v", out(i).getDouble), opt("near_dt_us", out(i).getLong),
        opt("near_dir", out(i).getInt))
    }
    assert(row(0) == (Some(1.0), Some(0L), Some(-1)), "exact hit is backward dt=0")
    assert(row(1) == (Some(2.0), Some(5L), Some(-1)), "only backward exists")
    assert(row(2) == (Some(0.5), Some(1L), Some(-1)),
      "ts=9 equidistant to 8 and 10 → earlier (backward) wins")
    assert(row(3) == (Some(9.0), Some(45L), Some(1)), "only forward exists")
    assert(row(4) == (None, None, None), "key absent from right side")
  }

  test("asofNearest plan: both directional passes ride one hash shuffle") {
    val p = AsofJoin.asofNearest(left, right, Seq("user"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }
}
