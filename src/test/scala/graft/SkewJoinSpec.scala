package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.ops.SkewJoin

/** Salted skew-join: result-equal to the plain join, key spread over
  * salts. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals plain join; hot key spreads across salts") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val dim = orders.select("o_orderpriority").distinct()
      .withColumn("tag", concat(lit("t_"), col("o_orderpriority")))

    val plain = orders.join(dim, Seq("o_orderpriority"))
      .groupBy("o_orderpriority", "tag").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedJoin(orders, dim, Seq("o_orderpriority"),
        col("o_orderkey"), salts = 8)
      .groupBy("o_orderpriority", "tag").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(plain == salted)

    // the hot key's rows really do carry multiple salt values
    val spread = orders
      .withColumn("_salt", pmod(xxhash64(col("o_orderkey")), lit(8)).cast("int"))
      .where(col("o_orderpriority") === orders.select("o_orderpriority").first().getString(0))
      .select("_salt").distinct().count()
    assert(spread > 1)
  }

  test("keySkewReport: hand-computed shares, salt = skew multiple rounded up") {
    import spark.implicits._
    // a×6, b×2, c×2 → total 10, 3 keys, mean 10/3
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c")).toDF("k")
    val out = SkewJoin.keySkewReport(df, "k", topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 6L, 600000L, 1800000L, 2L),
      ("b", 2L, 200000L, 600000L, 1L))) // cnt tie b/c breaks on key
  }

  test("keySkewReport plan: TakeOrdered top-k, no global sort") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 7).toString).toDF("k")
    val p = SkewJoin.keySkewReport(df, "k", topK = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
