package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark's built-ins don't provide: for each
  * left row, the most recent right row with `tsCol` at or before the left
  * row's, per `byCols` (event attribution, slowly-changing lookups,
  * quote-to-trade alignment).
  *
  * Implementation is the scalable union-window form, NOT a range join:
  * tag both sides, union them, and run ONE window partitioned by the
  * by-key ordered by (ts, side) where right rows sort before left rows at
  * equal timestamps (the join is inclusive). `last(payload, ignoreNulls)`
  * then carries each right payload forward to every later left row.
  * Cost: a single hash shuffle of |left|+|right| rows and a per-key sort
  * — no range-bucket explosion, no per-row lookups, no broadcast
  * requirement on either side. Left rows with no prior right row keep
  * NULL payloads (left-join semantics).
  *
  * Ties among right rows sharing (byCols, tsCol) are resolved by which
  * sorts last — pre-aggregate the right side to one row per (by, ts)
  * when deterministic output matters (the p26 gate does).
  */
object AsofJoin {

  /** `right` must contain `byCols`, `tsCol`, and `payloadCols`; payload
    * columns arrive on the output as `prefix + name`. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      byCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val l = left
      .withColumn("_side", lit(1))
      .select(
        (left.columns.toIndexedSeq.map(col) :+ col("_side")) ++
          payloadCols.map(c =>
            lit(null).cast(right.schema(c).dataType).as(prefix + c)): _*)
    val leftOnly = left.columns.filterNot(c => byCols.contains(c) || c == tsCol)
    val r = right.select(
      ((byCols :+ tsCol).toIndexedSeq.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_side")) ++
        payloadCols.map(c => col(c).as(prefix + c)): _*)

    val w = Window.partitionBy(byCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(l.unionByName(r)) { (d, c) =>
      d.withColumn(prefix + c, last(col(prefix + c), ignoreNulls = true).over(w))
    }
    carried.where(col("_side") === 1).drop("_side")
  }
}
