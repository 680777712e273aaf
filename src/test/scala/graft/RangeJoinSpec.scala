package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

/** Bucketized point-in-interval join: exact semantics vs a brute-force
  * BETWEEN join, boundary inclusivity, and the equi-join plan shape. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("matches brute-force BETWEEN join; boundaries inclusive") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00.0")),
      (2L, ts("2024-01-01 10:30:00.0")),
      (3L, ts("2024-01-01 12:00:00.0")),  // exactly at an interval end
      (4L, ts("2024-01-01 13:59:59.999")),
      (5L, ts("2024-01-02 00:00:00.0"))
    ).toDF("pid", "ts")
    val intervals = Seq(
      (10L, ts("2024-01-01 10:00:00.0"), ts("2024-01-01 12:00:00.0")),
      (11L, ts("2024-01-01 13:00:00.0"), ts("2024-01-01 14:00:00.0")),
      (12L, ts("2024-01-03 00:00:00.0"), ts("2024-01-03 01:00:00.0")) // empty
    ).toDF("iid", "w_start", "w_end")
    val got = RangeJoin.intervalJoin(points, "ts", intervals, "w_start", "w_end")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = points.crossJoin(intervals)
      .where(col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (4L, 11L)))
  }

  test("plans an equi-join on the bucket key, not a nested loop") {
    val points = Seq((1L, ts("2024-01-01 10:00:00.0"))).toDF("pid", "ts")
    val intervals = Seq((10L, ts("2024-01-01 09:00:00.0"), ts("2024-01-01 11:00:00.0")))
      .toDF("iid", "w_start", "w_end")
    val p = RangeJoin.intervalJoin(points, "ts", intervals, "w_start", "w_end")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("intervals spanning many buckets still match with a small bucket") {
    val points = Seq((1L, ts("2024-01-01 17:30:00.0"))).toDF("pid", "ts")
    val intervals = Seq((10L, ts("2024-01-01 00:00:00.0"), ts("2024-01-02 00:00:00.0")))
      .toDF("iid", "w_start", "w_end")
    val out = RangeJoin.intervalJoin(points, "ts", intervals, "w_start", "w_end",
      bucketSeconds = 600L)
    assert(out.count() == 1)
  }
}
