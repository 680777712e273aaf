package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1: forward-fill over an explicit order column — the Spark form of the
  * reference's `df[col].ffill()` over file order
  * (/root/reference/src/transform_pipeline.py:39,51), where `'-'` means
  * "same as previous row".
  *
  * Scale design (SURVEY §4, VERDICT round-1 flag): a bare
  * `Window.orderBy(order)` serializes the whole table through ONE task.
  * With natural partitions (user, sheet, year-block) we partition the
  * window. Without them, [[ffillBlocked]] does a two-pass fill: (1)
  * within-block fill over `floor(order / blockSize)` blocks in parallel,
  * (2) a per-block "last non-null" summary — thousands of rows, not
  * billions — cascaded with a tiny driver-safe window and broadcast back.
  * Result is bit-identical to the global window (property-tested) but
  * every wide stage is partition-parallel.
  */
object Ffill {

  /** Forward-fill `cols` ordered by `orderCol`. With `partitionCols` the
    * fill restarts per partition group (pandas `groupby().ffill()`);
    * without, uses the scalable blocked fill. */
  def ffill(
      df: DataFrame,
      orderCol: String,
      cols: Seq[String],
      partitionCols: Seq[String] = Nil,
      blockSize: Long = 1L << 20): DataFrame = {
    if (partitionCols.nonEmpty) {
      val w = Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    } else ffillBlocked(df, orderCol, cols, blockSize)
  }

  /** Single-task global-window fill; reference shape, kept for tests and
    * provably tiny inputs. */
  def ffillGlobalWindow(df: DataFrame, orderCol: String, cols: Seq[String]): DataFrame = {
    val w = Window.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Two-pass partition-parallel fill (see object doc). `orderCol` must be
    * numeric and globally ordered (e.g. the scan's `_row_idx`). */
  def ffillBlocked(
      df: DataFrame,
      orderCol: String,
      cols: Seq[String],
      blockSize: Long = 1L << 20): DataFrame = {
    val blk = "_ffill_blk"
    // integral division — floor(double) misassigns blocks past 2^53
    // (monotonically_increasing_id puts partition bits in the high bits)
    val withBlk = df.withColumn(blk, expr(s"`$orderCol` div $blockSize"))

    val wIn = Window.partitionBy(col(blk)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = cols.foldLeft(withBlk)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(wIn)))

    // Per-block last non-null value of each col: max_by ignores rows whose
    // ordering expression is null, so nulls never win.
    val lastAggs = cols.map(c =>
      max_by(col(c), when(col(c).isNotNull, col(orderCol))).as(s"_last_$c"))
    val blockSummary = withBlk.groupBy(col(blk)).agg(lastAggs.head, lastAggs.tail: _*)

    // Cascade across blocks: carry(blk) = last non-null among all blocks
    // strictly before blk. The summary has (#rows / blockSize) rows — a
    // few thousand rows at 100 TB, not a bottleneck (WindowExec's global-
    // window warning is a false positive on this bounded input).
    val wCarry = Window.orderBy(col(blk))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = cols.foldLeft(blockSummary)((d, c) =>
      d.withColumn(s"_carry_$c", last(col(s"_last_$c"), ignoreNulls = true).over(wCarry)))
      .select(col(blk) +: cols.map(c => col(s"_carry_$c")): _*)

    val joined = within.join(broadcast(carry), Seq(blk), "left")
    val filled = cols.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(c), col(s"_carry_$c"))))
    filled.drop(blk +: cols.map(c => s"_carry_$c"): _*)
  }
}
