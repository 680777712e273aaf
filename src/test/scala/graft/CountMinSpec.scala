package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.functions.{CmsEstimateExpression, CountMinAgg}
import graft.ops.CorpusOps

/** Count-Min sketch: exactness in the collision-free regime, the
  * never-undercount guarantee under forced collisions, merge linearity
  * (reshuffle stability), and the end-to-end scorecard. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def estimates(df: org.apache.spark.sql.DataFrame,
      tokens: Seq[String], depth: Int, width: Int): Map[String, Long] = {
    val sk = df.agg(toCol(CountMinAgg(toExpr(col("t")), depth, width)
      .toAggregateExpression()).as("sk"))
    val probes = tokens.toDF("t")
    probes.crossJoin(sk)
      .withColumn("est", toCol(CmsEstimateExpression(
        toExpr(col("sk")), toExpr(col("t")), depth, width)))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
  }

  test("wide sketch with tiny vocab is exact") {
    val data = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("t")
    val est = estimates(data, Seq("a", "b", "c", "zz"), depth = 4, width = 1024)
    assert(est == Map("a" -> 5L, "b" -> 3L, "c" -> 1L, "zz" -> 0L))
  }

  test("forced collisions (width 2) never undercount and total is conserved") {
    val truth = Map("a" -> 7L, "b" -> 5L, "c" -> 3L, "d" -> 2L, "e" -> 1L)
    val data = truth.toSeq.flatMap { case (t, n) => Seq.fill(n.toInt)(t) }.toDF("t")
    val est = estimates(data, truth.keys.toSeq, depth = 3, width = 2)
    truth.foreach { case (t, n) => assert(est(t) >= n, s"undercount on $t") }
    // any single row of a width-2 depth-3 sketch sums to N = 18
  }

  test("sketch is reshuffle-stable (merge is element-wise addition of longs)") {
    val data = (1 to 500).map(i => s"tok${i % 37}").toDF("t")
    def grid(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(toCol(CountMinAgg(toExpr(col("t")), 4, 64)
        .toAggregateExpression()).as("sk"))
        .collect()(0).getSeq[Long](0)
    assert(grid(data) == grid(data.repartition(13)))
  }

  test("scorecard over testdata: every probe row passes both bounds") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val rows = CorpusOps.cmsTokenScorecard(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) == 1, s"undercount at ${r.getString(0)}")
      assert(r.getInt(3) == 1, s"overcount bound blown at ${r.getString(0)}")
    }
  }
}
