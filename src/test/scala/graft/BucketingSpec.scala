package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.ops.Bucketing

/** Bucketed co-located join: same bucket spec on both sides ⇒ join plan
  * with zero shuffle exchanges. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of same-bucketed tables plans without an Exchange") {
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables(spark, dir, "orders"), "b_orders", Seq("o_custkey"), 8)
    Bucketing.writeBucketed(
      Tables(spark, dir, "customer")
        .withColumnRenamed("c_custkey", "o_custkey"), "b_customer", Seq("o_custkey"), 8)

    // disable broadcast so the co-location (not a broadcast) is what
    // removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customer", Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables(spark, dir, "orders").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
