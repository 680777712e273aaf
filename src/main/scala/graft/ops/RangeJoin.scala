package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cartesian. Spark's planner
  * turns a raw `p.ts BETWEEN i.start AND i.end` join condition into
  * BroadcastNestedLoop (or worse); bucketizing both sides to a coarse
  * time grain turns it into an EQUI-join: each interval explodes into
  * the buckets it covers, points carry their single bucket, the join
  * runs hash-partitioned on the bucket key, and the exact BETWEEN runs
  * as a post-filter on co-located candidates only. Shuffle ∝ points +
  * Σ(interval span / bucket); pick `bucketSeconds` near the typical
  * interval length so most intervals explode into ~2 buckets.
  */
object RangeJoin {

  def intervalJoin(
      points: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bm = bucketSeconds * 1000000L
    // backtick-quoted so column names with spaces/dots resolve; `div`
    // (integral, truncating) is monotone, which is all bucketing needs
    def bucket(c: String) = expr(s"unix_micros(`$c`) div $bm")
    val p = points.withColumn("_bk", bucket(tsCol))
    val iv = intervals
      .withColumn("_bk", explode(sequence(bucket(startCol), bucket(endCol))))
    p.join(iv, Seq("_bk"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bk")
  }
}
