package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The exact-percentile RANK LADDER, shared by every op that needs
  * Spark-`Percentile`-identical linear-interpolation quantiles WITHOUT
  * the aggregate's per-group value multiset buffer (the 100 TB OOM
  * class — the buffer grows with group size, so a corpus-sized group
  * kills the executor rather than merely slowing it).
  *
  * Recipe (proven bit-identical in `winsorize`/`temporalSplit`, round
  * 10): collapse values to a (value → count) table — bounded by the
  * DISTINCT-value span, not the row count — rank by a running sum over
  * that bounded table, select the two bracketing order statistics with
  * conditional-min folds, and blend with Spark's exact interpolation
  * (same IEEE operand order, same two short-circuits as
  * `Percentile.getPercentile`: lo==hi → v_lo, v_lo==v_hi → v_lo,
  * otherwise (hi−pos)·v_lo + (pos−lo)·v_hi with pos = p·(n−1)).
  *
  * Callers build the ranked table as
  * {{{
  *   src.groupBy(groupCols :+ col("_v")).agg(count(lit(1)).as("_c"))
  *      .withColumn("_cum", sum("_c").over(Window...orderBy("_v")))
  *      .withColumn("_n",   sum("_c").over(Window...))   // group total
  * }}}
  * then aggregate `cumFolds(p, tag)` columns and project `blend(tag)`.
  * NULL values must be filtered out first (the `Percentile` aggregate
  * ignores them; a NULL `_v` would sort first and shift every rank).
  */
private[graft] object RankLadder {

  /** Position of quantile `p` in the (n−1)-indexed order: p·(n−1), the
    * exact double Spark's `Percentile` uses. `_n` = group row count. */
  private def pos(p: Double): Column =
    (col("_n") - lit(1L)).cast("double") * lit(p)

  /** Fold columns over a cum-ranked (value → count) table with columns
    * `_v` (double value), `_cum` (running count ordered by `_v`) and
    * `_n` (group total): multiset rank r lives at the first distinct
    * value whose running count reaches r, so `min(_v | _cum ≥ r)`
    * selects order statistics without materializing rows. Five
    * aggregate columns per quantile, `tag`-suffixed so several
    * quantiles coexist in one aggregation. */
  def cumFolds(p: Double, tag: String): Seq[Column] = Seq(
    min(when(col("_cum") >= floor(pos(p)) + lit(1L), col("_v"))).as(s"_vlo$tag"),
    min(when(col("_cum") >= ceil(pos(p)) + lit(1L), col("_v"))).as(s"_vhi$tag"),
    max(pos(p)).as(s"_pos$tag"),
    max(floor(pos(p))).as(s"_flo$tag"),
    max(ceil(pos(p))).as(s"_fhi$tag"))

  /** Spark-`Percentile`-exact interpolation over one quantile's fold
    * columns: identical short-circuit order and IEEE operand order, so
    * the result is bit-for-bit the `percentile` aggregate's. */
  def blend(tag: String): Column =
    when(col(s"_fhi$tag") === col(s"_flo$tag"), col(s"_vlo$tag"))
      .when(col(s"_vhi$tag") === col(s"_vlo$tag"), col(s"_vlo$tag"))
      .otherwise((col(s"_fhi$tag").cast("double") - col(s"_pos$tag")) * col(s"_vlo$tag")
        + (col(s"_pos$tag") - col(s"_flo$tag").cast("double")) * col(s"_vhi$tag"))
}
