package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ffill

/** W1: forward-fill semantics + blocked-fill equivalence. */
class FfillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def data(n: Int, nullEvery: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map { i =>
      (i.toLong, if (i % nullEvery == 0) Some(s"v$i") else None)
    }.toDF("idx", "v").repartition(7)

  test("blocked fill is bit-identical to the global window") {
    val df = data(5000, 13)
    val global = Ffill.ffillGlobalWindow(df, "idx", Seq("v"))
      .orderBy("idx").collect().map(_.toSeq)
    val blocked = Ffill.ffillBlocked(df, "idx", Seq("v"), blockSize = 256)
      .orderBy("idx").collect().map(_.toSeq)
    assert(global.sameElements(blocked))
  }

  test("leading nulls stay null; carries cross many empty blocks") {
    val df = Seq(
      (0L, None), (1L, None), (2L, Some("a")),
      (3L, None), (4L, None), (5L, None), (6L, None),
      (7L, Some("b")), (8L, None)).toDF("idx", "v")
    val out = Ffill.ffillBlocked(df, "idx", Seq("v"), blockSize = 2)
      .orderBy("idx").select("v").collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(None, None, Some("a"), Some("a"), Some("a"),
      Some("a"), Some("a"), Some("b"), Some("b")))
  }

  test("partitioned fill restarts per group") {
    val df = Seq(
      ("u1", 0L, Some("x")), ("u1", 1L, None),
      ("u2", 2L, None), ("u2", 3L, Some("y")), ("u2", 4L, None))
      .toDF("u", "idx", "v")
    val out = Ffill.ffill(df, "idx", Seq("v"), partitionCols = Seq("u"))
      .orderBy("idx").select("v").collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("x"), Some("x"), None, Some("y"), Some("y")))
  }

  test("multi-column fill fills each independently") {
    val df = Seq(
      (0L, Some("a"), Option.empty[String]),
      (1L, None, Some("p")),
      (2L, None, None)).toDF("idx", "v1", "v2")
    val out = Ffill.ffillBlocked(df, "idx", Seq("v1", "v2"), blockSize = 2)
      .orderBy("idx").collect()
      .map(r => (Option(r.getString(1)), Option(r.getString(2))))
    assert(out.toSeq == Seq(
      (Some("a"), None), (Some("a"), Some("p")), (Some("a"), Some("p"))))
  }
}
