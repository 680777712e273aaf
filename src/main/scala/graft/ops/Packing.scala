package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining ("concat and chunk"): documents
  * are laid out contiguously in a global order, and each fixed-size
  * context window of `maxLen` tokens is one training sequence; a document
  * belongs to the sequence where it STARTS. The core computation is a
  * global running token offset.
  *
  * Scale design: a bare global-window cumsum serializes the corpus
  * through one task, so this uses the same two-pass trick as
  * [[Ffill.ffillBlocked]] — per-block local prefix sums in parallel, a
  * tiny global window over per-block totals (rows/blockSize entries:
  * thousands at 100 TB), block bases broadcast back. Bit-identical to
  * the global window (PackingSpec) with every wide stage parallel.
  */
object Packing {

  /** One row per input doc: `start_offset` (global token offset where the
    * doc begins), `seq_id` (training sequence index), `offset_in_seq`.
    * `orderCol` must be numeric and globally ordered; `tokensCol` long. */
  def packSequences(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      maxLen: Long,
      blockSize: Long = 1L << 20): DataFrame = {
    val blk = "_pack_blk"
    // integral division: orderCol can exceed 2^53 (e.g. ids from
    // monotonically_increasing_id carry partition bits in the high
    // bits), where floor(double) misassigns blocks
    val withBlk = df.withColumn(blk, expr(s"`$orderCol` div $blockSize"))

    // pass 1 (parallel): local exclusive prefix sum within each block
    val wIn = Window.partitionBy(col(blk)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = withBlk.withColumn("_local_off",
      coalesce(sum(col(tokensCol)).over(wIn), lit(0L)))

    // pass 2: block base offsets — single-partition window over block
    // SUMMARIES only (#rows / blockSize rows; WindowExec's global-window
    // warning is a false positive here — the input is bounded, not data-
    // sized). A constant partition key doesn't help: Catalyst folds
    // foldable partition expressions right back out.
    val sums = withBlk.groupBy(col(blk)).agg(sum(col(tokensCol)).as("_blk_sum"))
    val wCarry = Window.orderBy(col(blk))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = sums
      .withColumn("_base", coalesce(sum(col("_blk_sum")).over(wCarry), lit(0L)))
      .select(col(blk), col("_base"))

    within.join(broadcast(bases), Seq(blk))
      .withColumn("start_offset", col("_base") + col("_local_off"))
      .select(
        col(orderCol), col(tokensCol), col("start_offset"),
        expr(s"start_offset div $maxLen").as("seq_id"),
        (col("start_offset") % lit(maxLen)).as("offset_in_seq"))
  }

  /** Reference shape: the same layout via one global window (tests and
    * provably tiny inputs only). */
  def packSequencesGlobal(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      maxLen: Long): DataFrame = {
    val w = Window.orderBy(col(orderCol)).rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_offset", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .select(
        col(orderCol), col(tokensCol), col("start_offset"),
        expr(s"start_offset div $maxLen").as("seq_id"),
        (col("start_offset") % lit(maxLen)).as("offset_in_seq"))
  }
}
