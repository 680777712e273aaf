package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage for co-located joins: both sides pre-hashed into the
  * same bucket count on the join key at WRITE time, so repeated joins on
  * that key skip the shuffle entirely — the standard way to amortize the
  * big-fact-join shuffle across a 100 TB pipeline's many runs.
  */
object Bucketing {

  /** Write `df` as a bucketed managed parquet table (bucket pruning +
    * shuffle-free joins for any later reader of `table`). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys. With matching
    * bucket specs Catalyst plans a SortMergeJoin with NO Exchange on
    * either side. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
