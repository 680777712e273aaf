package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** In-engine generalized-linear model fitting — the missing primitive
  * between the feature ops ([[CorpusOps.hashingVectorizer]],
  * [[CorpusOps.targetEncoding]], [[TextAnalysis.profile]]) and the
  * estimators that CONSUME a fitted score ([[Stats.ipwAte]] and
  * [[Stats.nnMatchAtt]] take a propensity; quality-filter pipelines
  * take a classifier): a quality/propensity model trained without
  * leaving the engine. */
object Glm {

  /** LOGISTIC REGRESSION by fixed-step gradient ascent — the
    * quality-classifier / propensity-model trainer. `iters` full-batch
    * steps of w ← w + η/n · Σ (y − σ(w·x))·x; the output is the pinned
    * K-step iterate, bit-identical on any engine, not a convergence
    * claim (the [[Stats.bradleyTerry]] contract — pick `iters`/η for
    * the data, the gate pins the trajectory).
    *
    * Determinism: features floor-quantize to micro ([[Clustering
    * .quantized]]); each row's logit is ONE division of the exact
    * DECIMAL(38,0) dot product (round-6, pinned literal 10¹²);
    * σ floors to micro off that pinned double; the residual
    * `y·10⁶ − σ_micro` is an exact integer, so the gradient
    * Σ residual·x_micro is an exact DECIMAL sum — aggregation-order-
    * invariant, never a float sum across partitions — and the weight
    * update is a re-signed integral division. The only floats anywhere
    * are the per-row round-6 logit and its exp.
    *
    * Shape (the [[Clustering.kmeans]] trainer contract): the feature
    * frame is persisted, each step is one map-only score pass + ONE
    * dim-bounded gradient partial agg, and only the ≤ `maxDim`
    * gradient cells reach the driver per step — the corpus never does.
    * Eager by design: a trainer runs its loop when called (the Lloyd
    * precedent), then hands back a lazy, bounded result. Ragged
    * feature vectors, NULL feature vectors and labels outside {0, 1}
    * all fail loudly (the train/serve symmetry: any frame that trains
    * is a frame [[logisticScore]] will serve). Empty input → empty
    * output.
    *
    * Returns one row per coefficient (idx, weight_micro, n_rows)
    * ordered by idx — idx 0 is the intercept when `addIntercept`. */
  def logisticFit(
      df: DataFrame,
      featuresCol: String,
      labelCol: String,
      iters: Int = 8,
      lrMicro: Long = 500000L,
      addIntercept: Boolean = true,
      maxDim: Int = 64): DataFrame = {
    require(iters >= 1 && iters <= 100,
      s"logisticFit: iters must be in [1, 100], got $iters")
    require(lrMicro > 0L && lrMicro <= 100000000L,
      s"logisticFit: lrMicro must be in (0, 1e8], got $lrMicro")
    require(maxDim >= 1 && maxDim <= 256,
      s"logisticFit: maxDim must be in [1, 256], got $maxDim")
    val spark = df.sparkSession
    import spark.implicits._
    val rawX = Clustering.quantized(col(featuresCol))
    val xq = if (addIntercept) concat(array(lit(1000000L)), rawX) else rawX
    // NULL feature vectors raise in-plan, matching [[logisticScore]] —
    // a silent drop would shrink the gradient denominator without trace
    // and let a frame that trains cleanly fail at serve time
    val q = df
      .select(
        when(col(labelCol).isNull || !col(labelCol).cast("int").isin(0, 1),
          raise_error(lit("logisticFit: label must be 0 or 1")))
          .otherwise(col(labelCol).cast("long")).as("_y"),
        when(col(featuresCol).isNull,
          raise_error(lit("logisticFit: NULL feature vector")))
          .otherwise(xq).as("_xq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val head = q.agg(count(lit(1)).as("n"), min(size(col("_xq"))).as("dmin"),
      max(size(col("_xq"))).as("dmax")).collect()(0)
    val n = head.getAs[Long]("n")
    if (n == 0L) {
      q.unpersist(blocking = false)
      return Seq.empty[(Int, Long, Long)].toDF("idx", "weight_micro", "n_rows")
    }
    val d = head.getAs[Int]("dmax")
    require(head.getAs[Int]("dmin") == d,
      s"logisticFit: ragged feature vectors (${head.getAs[Int]("dmin")} vs $d)")
    require(d >= 1 && d <= maxDim,
      s"logisticFit: dim $d outside [1, maxDim=$maxDim]")
    val den = BigInt("1000000000000") * n
    val w = Array.fill(d)(0L)
    for (_ <- 1 to iters) {
      val grads = q
        .withColumn("_w", typedLit(w.toSeq))
        .withColumn("_z", expr(
          "round(CAST(aggregate(zip_with(_xq, _w, (x, wj) -> " +
            "CAST(x AS DECIMAL(38,0)) * wj), CAST(0 AS DECIMAL(38,0)), " +
            "(acc, t) -> acc + t) AS DOUBLE) / 1000000000000.0, 6) + 0.0"))
        .withColumn("_r", col("_y") * lit(1000000L) -
          expr("CAST(floor(1000000.0 / (1.0 + exp(-_z))) AS BIGINT)"))
        .select(col("_r"), posexplode(col("_xq")).as(Seq("_pos", "_x")))
        .groupBy(col("_pos"))
        .agg(sum((col("_r").cast(DecimalType(38, 0)) * col("_x"))
          .cast(DecimalType(38, 0))).as("_g"))
        .collect()
      grads.foreach { r =>
        val j = r.getInt(0)
        val g = BigInt(r.getDecimal(1).toBigInteger)
        val num = BigInt(lrMicro) * g
        val delta = if (num.signum >= 0) num / den else -((-num) / den)
        w(j) = w(j) + delta.toLong
      }
    }
    q.unpersist(blocking = false)
    (0 until d).map(j => (j, w(j), n)).toDF("idx", "weight_micro", "n_rows")
      .orderBy("idx")
  }

  /** Score rows with a fitted [[logisticFit]] weight vector — the
    * map-only inference half of the trainer: appends `score_micro`,
    * the floored micro sigmoid of the round-6 logit, computed with the
    * EXACT arithmetic of the training pass (micro-quantized features,
    * DECIMAL dot, one pinned division) so a row scores identically at
    * train and serve time on any engine. Lazy, no shuffle, no state —
    * at 100 TB this is the scan itself.
    *
    * `weights` is the `weight_micro` column of [[logisticFit]] in idx
    * order (collect it — it is ≤ maxDim rows by contract). Rows whose
    * feature vector is NULL or of the wrong length raise in-plan. */
  def logisticScore(
      df: DataFrame,
      featuresCol: String,
      weights: Seq[Long],
      addIntercept: Boolean = true): DataFrame = {
    require(weights.nonEmpty && weights.length <= 256,
      s"logisticScore: need 1..256 weights, got ${weights.length}")
    val d = weights.length
    val rawX = Clustering.quantized(col(featuresCol))
    val xq = if (addIntercept) concat(array(lit(1000000L)), rawX) else rawX
    df
      .withColumn("_xq",
        when(col(featuresCol).isNull,
          raise_error(lit("logisticScore: NULL feature vector")))
          .otherwise(xq))
      .withColumn("_xq",
        when(size(col("_xq")) =!= d, raise_error(concat(
          lit(s"logisticScore: expected $d features (incl. intercept), got "),
          size(col("_xq")).cast("string")))).otherwise(col("_xq")))
      .withColumn("_w", typedLit(weights))
      .withColumn("score_micro", expr(
        "CAST(floor(1000000.0 / (1.0 + exp(-(round(CAST(aggregate(" +
          "zip_with(_xq, _w, (x, wj) -> CAST(x AS DECIMAL(38,0)) * wj), " +
          "CAST(0 AS DECIMAL(38,0)), (acc, t) -> acc + t) AS DOUBLE) / " +
          "1000000000000.0, 6) + 0.0)))) AS BIGINT)"))
      .drop("_xq", "_w")
  }

  /** CALIBRATION REPORT + per-bin Brier score for a probability
    * scorer — the standard audit of [[logisticScore]]'s output (and of
    * any score in micro units): bucket rows by predicted probability,
    * compare the bucket's mean prediction to its OBSERVED event rate
    * (a calibrated model's reliability diagram hugs the diagonal —
    * DeGroot & Fienberg 1983), and report the per-bin Brier score
    * (Brier 1950), whose n-weighted mean is the corpus Brier.
    *
    * INTEGER-EXACT end to end: scores arrive in micro ([0, 10⁶] —
    * anything else raises in-plan, as does a label outside {0, 1});
    * bin = min(bins−1, score·bins div 10⁶); mean_score_micro and
    * event_rate_ppm are floored integral divisions; per-row squared
    * error (score − y·10⁶)² ≤ 10¹² rides DECIMAL(38,0) (10¹⁰-row
    * corpus → ≤ 10²² total) and brier_micro = Σerr² div (n·10⁶) —
    * micro units of the [0,1]-scale Brier.
    *
    * Shape: ONE bins-bounded partial agg over the corpus; the report
    * IS the group-by. Empty input → empty output.
    *
    * Returns one row per non-empty bin (bin, n, mean_score_micro,
    * event_rate_ppm, brier_micro) ordered by bin. */
  def calibrationReport(
      df: DataFrame,
      scoreMicroCol: String,
      labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000,
      s"calibrationReport: bins must be in [2, 1000], got $bins")
    val d38 = DecimalType(38, 0)
    val rows = df.select(
      when(col(scoreMicroCol).isNull || col(scoreMicroCol) < 0 ||
          col(scoreMicroCol) > 1000000L,
        raise_error(lit("calibrationReport: score_micro must be in " +
          "[0, 1e6]"))).otherwise(col(scoreMicroCol).cast("long")).as("_s"),
      when(col(labelCol).isNull || !col(labelCol).cast("int").isin(0, 1),
        raise_error(lit("calibrationReport: label must be 0 or 1")))
        .otherwise(col(labelCol).cast("long")).as("_y"))
    rows
      .withColumn("bin", least(lit(bins - 1L),
        expr(s"_s * $bins div 1000000")))
      .withColumn("_err", col("_s") - col("_y") * lit(1000000L))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("_s")).as("_ss"),
        sum(col("_y")).as("_sy"),
        sum((col("_err").cast(d38) * col("_err")).cast(d38)).cast(d38)
          .as("_se2"))
      .select(col("bin"), col("n"),
        expr("_ss div n").as("mean_score_micro"),
        expr("_sy * 1000000 div n").as("event_rate_ppm"),
        expr("CAST(_se2 div (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
          .as("brier_micro"))
      .orderBy("bin")
  }
}
