package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the incremental-ETL primitive: given yesterday's and
  * today's snapshot of a keyed table, classify every key as `added`,
  * `removed`, or `changed` (content fingerprint differs). One full outer
  * join hash-partitioned on the key; content is compared through a
  * fixed-width fingerprint so wide rows shuffle as (key, 16-byte hash)
  * instead of full payloads. Unchanged keys are dropped by default —
  * at 100 TB the diff output is the small side, never the snapshots.
  */
object SnapshotDiff {

  /** Fingerprint of the content columns. Each value is length-prefixed
    * (len:value) and NULL encodes as a bare marker - column boundaries
    * cannot shift even when a value contains the separator, and NULL vs
    * empty string is a real change, not a collision. */
  private def fp(contentCols: Seq[String]) =
    sha2(concat_ws("\u0001", contentCols.map { c =>
      val s = col(c).cast("string")
      when(s.isNull, lit("n"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }: _*), 256)

  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      contentCols: Seq[String],
      keepUnchanged: Boolean = false): DataFrame = {
    val o = oldSnap.select(col(keyCol), fp(contentCols).as("_fp_old"))
    val n = newSnap.select(col(keyCol), fp(contentCols).as("_fp_new"))
    val joined = o.join(n, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("_fp_old").isNull, "added")
          .when(col("_fp_new").isNull, "removed")
          .when(col("_fp_old") =!= col("_fp_new"), "changed")
          .otherwise("unchanged"))
    (if (keepUnchanged) joined else joined.where(col("status") =!= "unchanged"))
      .select(col(keyCol), col("status"))
  }
}
