package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * content-addressed split assignment and length-distribution profiling
  * (the inputs to quality-cutoff decisions). Pure expressions / partial
  * aggregations — map-only or one-shuffle at any scale.
  */
object CorpusOps {

  /** Deterministic train/val/test assignment from the CONTENT fingerprint
    * (first hex nibble of the whitespace-normalized SHA-256): 14/16
    * train, 1/16 val, 1/16 test. Content addressing means byte-identical
    * duplicates always land in the same split — composed after near-dup
    * removal it prevents eval leakage; and the split is stable across
    * reshuffles, repartitions, and reruns (no RNG, no row order). */
  def contentSplit(textCol: Column, valNibble: String = "e", testNibble: String = "f"): Column = {
    val nib = TextAnalysis.fingerprint(textCol, 1) // already the first hex char

    when(nib === valNibble, "val")
      .when(nib === testNibble, "test")
      .otherwise("train")
  }

  def withSplit(df: DataFrame, textCol: String = "text", outCol: String = "split"): DataFrame =
    df.withColumn(outCol, contentSplit(col(textCol)))

  /** Per-group EXACT token-length quantiles (p50/p90/p99) + count — the
    * distribution profile behind length-cutoff filters. Exact
    * `percentile` (not approx) so results are oracle-checkable; at 100 TB
    * swap in `percentile_approx` for a single-pass sketch when exactness
    * isn't required (same call shape). */
  def lengthQuantiles(
      docs: DataFrame,
      groupCol: String = "lang",
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("_n", TextAnalysis.tokenCount(col(textCol)))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        (round(expr("percentile(_n, 0.5D)"), 4) + 0.0).as("p50"),
        (round(expr("percentile(_n, 0.9D)"), 4) + 0.0).as("p90"),
        (round(expr("percentile(_n, 0.99D)"), 4) + 0.0).as("p99"))
      .orderBy(groupCol)
}
