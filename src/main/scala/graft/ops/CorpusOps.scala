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

  /** Global vocabulary top-k: most frequent lowercase whitespace tokens.
    * Explode → partial-agg count (map-side combine keeps the shuffle at
    * |vocab|, not |corpus tokens|) → TakeOrderedAndProject. Deterministic
    * tie-break on the token itself. */
  def vocabTopK(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Per-document top term: highest term frequency, ties broken by rarer
    * corpus document frequency, then alphabetically — INTEGER-only
    * ranking (a float tf·idf score invites cross-engine argmax flips; df
    * as tiebreak keeps the idf intent without the hazard). Two shuffles:
    * (doc, term) counts and the term→df join. */
  def topTermPerDoc(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .where(col("token") =!= "")
    val tf = terms.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(dfreq, Seq("token"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col(idCol), col("token").as("top_term"), col("tf"), col("df"))
  }

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
