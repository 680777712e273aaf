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

  /** NEAREST-neighbor as-of join: for each left row, the right row whose
    * `tsCol` is closest in EITHER direction per `byCols`, equidistant
    * ties resolved toward the EARLIER (backward) row — sensor/stream
    * alignment where "most recent" is wrong half the time.
    *
    * Same scalable union-window shape as [[asofJoin]], run in both
    * directions over ONE hash shuffle: the ascending pass carries the
    * latest right payload+timestamp at-or-before each left row, the
    * descending pass (same partitioning — the exchange is reused, only
    * a second per-partition sort) carries the earliest at-or-after, and
    * a map-side comparison picks the closer side. No range explosion,
    * no broadcast requirement.
    *
    * Right rows sharing (byCols, tsCol) are resolved by which sorts
    * last — pre-aggregate the right side to one row per (by, ts) for
    * deterministic output (the p110 gate does).
    *
    * Output: every left column, then `prefix+payload` columns from the
    * chosen right row, `prefix+dt_us` (non-negative microsecond gap)
    * and `prefix+dir` (−1 backward, +1 forward, NULL no right row). */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      byCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      prefix: String = "near_"): DataFrame = {
    val l = left
      .withColumn("_side", lit(1))
      .select(
        (left.columns.toIndexedSeq.map(col) :+ col("_side")) ++
          payloadCols.map(c =>
            lit(null).cast(right.schema(c).dataType).as("_pay_" + c)) :+
          lit(null).cast(left.schema(tsCol).dataType).as("_rts"): _*)
    val leftOnly = left.columns.filterNot(c => byCols.contains(c) || c == tsCol)
    val r = right.select(
      ((byCols :+ tsCol).toIndexedSeq.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_side")) ++
        payloadCols.map(c => col(c).as("_pay_" + c)) :+
        col(tsCol).as("_rts"): _*)

    val wb = Window.partitionBy(byCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(byCols.map(col): _*)
      .orderBy(col(tsCol).desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(
      l.unionByName(r)
        .withColumn("_bts", last(col("_rts"), ignoreNulls = true).over(wb))
        .withColumn("_fts", last(col("_rts"), ignoreNulls = true).over(wf))) {
      (d, c) =>
        d.withColumn("_b_" + c, last(col("_pay_" + c), ignoreNulls = true).over(wb))
          .withColumn("_f_" + c, last(col("_pay_" + c), ignoreNulls = true).over(wf))
    }
    // gap in microseconds for timestamps, raw units for numeric order
    // columns (the op is generic over any orderable time axis)
    def micros(c: org.apache.spark.sql.Column) =
      left.schema(tsCol).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c.cast("long")
      }
    val dtB = micros(col(tsCol)) - micros(col("_bts"))
    val dtF = micros(col("_fts")) - micros(col(tsCol))
    val takeBack = col("_bts").isNotNull &&
      (col("_fts").isNull || dtB <= dtF)
    val chosen = payloadCols.map(c =>
      when(takeBack, col("_b_" + c))
        .when(col("_fts").isNotNull, col("_f_" + c))
        .as(prefix + c))
    carried.where(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++ chosen :+
        when(takeBack, dtB).when(col("_fts").isNotNull, dtF).as(prefix + "dt_us") :+
        when(takeBack, lit(-1)).when(col("_fts").isNotNull, lit(1))
          .cast("int").as(prefix + "dir"): _*)
  }
}
