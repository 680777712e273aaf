package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier evaluation over score tables — the exact, engine-
  * deterministic companions to [[Glm.calibrationReport]]: with a
  * trainer ([[Glm.logisticFit]]), a serve pass ([[Glm.logisticScore]])
  * and a calibration audit in-engine, the ROC/PR operating curve is
  * the remaining number a model report needs. */
object Eval {

  /** EXACT ROC + precision curve at every observed threshold — one row
    * per distinct score: predicting positive at `score ≥ threshold`
    * yields the row's confusion counts, TPR/FPR (the ROC point,
    * Fawcett 2006) and precision (the PR point). No sampling, no
    * fixed-grid interpolation — two engines can disagree on an
    * interpolated curve, never on suffix counts.
    *
    * INTEGER-EXACT: scores arrive in micro ([0, 10⁶] — the
    * [[Glm.calibrationReport]] contract; out-of-range or NULL raises,
    * as does a label outside {0, 1}); counts are suffix sums over the
    * score-keyed table and every rate is a floored ppm division.
    * BOTH classes must be present — a one-class "curve" raises in-plan
    * rather than emitting division garbage.
    *
    * Shape: ONE (score) partial agg collapses the corpus to the
    * distinct-score-bounded count table (the [[Stats.mannWhitney]]
    * recipe); the descending suffix cums ride a window over that
    * bounded table only (score_micro has ≤ 10⁶+1 distinct values by
    * contract, so the ladder is bounded by construction). Empty
    * input → empty output.
    *
    * Returns (threshold_micro, n_pos_ge, n_neg_ge, tpr_ppm, fpr_ppm,
    * precision_ppm) ordered by threshold_micro DESC (the conventional
    * curve order: (0,0) corner first). */
  def rocPrCurve(
      df: DataFrame,
      scoreMicroCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(
      when(col(scoreMicroCol).isNull || col(scoreMicroCol) < 0 ||
          col(scoreMicroCol) > 1000000L,
        raise_error(lit("rocPrCurve: score_micro must be in [0, 1e6]")))
        .otherwise(col(scoreMicroCol).cast("long")).as("_s"),
      when(col(labelCol).isNull || !col(labelCol).cast("int").isin(0, 1),
        raise_error(lit("rocPrCurve: label must be 0 or 1")))
        .otherwise(col(labelCol).cast("long")).as("_y"))
    val perS = rows.groupBy(col("_s"))
      .agg(sum(col("_y")).as("_np"),
        sum(lit(1L) - col("_y")).as("_nn"))
    val tot = perS.agg(sum(col("_np")).as("_p"), sum(col("_nn")).as("_n"))
    // unpartitioned cum ladder over the distinct-score table: ≤ 10⁶+1
    // rows by the [0, 1e6] micro contract RAISED above — never corpus
    val wDesc = Window.orderBy(col("_s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perS
      .withColumn("_tp", sum(col("_np")).over(wDesc))
      .withColumn("_fp", sum(col("_nn")).over(wDesc))
      .crossJoin(broadcast(tot))
      .select(
        when(col("_p") === 0L || col("_n") === 0L,
          raise_error(lit("rocPrCurve: need both classes present")))
          .otherwise(col("_s")).as("threshold_micro"),
        col("_tp").as("n_pos_ge"), col("_fp").as("n_neg_ge"),
        expr("_tp * 1000000 div _p").as("tpr_ppm"),
        expr("_fp * 1000000 div _n").as("fpr_ppm"),
        expr("_tp * 1000000 div (_tp + _fp)").as("precision_ppm"))
      .orderBy(col("threshold_micro").desc)
  }
}
