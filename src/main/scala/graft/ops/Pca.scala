package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Top principal component by FIXED-POINT power iteration — the
  * embedding post-processing shape (whitening / dominant-direction
  * projection), deterministic and engine-portable end to end:
  *
  *   - vectors quantize to BIGINT micro-units ([[Clustering.quantized]]);
  *     the mean is `floor(sum/n)` per dimension (kmeans precedent), so
  *     centered vectors are exact integers;
  *   - the covariance accumulation Σ xcᵢ·xcⱼ is the ONLY data-sized
  *     work: ONE pass of [[graft.functions.GramMatrixAgg]] — each
  *     partition folds its rows into a single dim(dim+1)/2-cell
  *     128-bit triangle buffer (primitive-long multiply-accumulate, no
  *     intermediate rows) and only #partitions triangles shuffle; the
  *     integer sums are exact and order-independent at any row count
  *     and any embedding width;
  *   - power iterations run on the DRIVER over the collected dim²
  *     matrix (bounded, kilobytes) in BigInt — exact, overflow-free;
  *     each iterate renormalizes by a truncating division by 2^k
  *     (k = bitLength(max|w|) − 10), and BigInt `/` truncates toward
  *     zero exactly like DuckDB's `//`, so the trajectory replays
  *     bit-for-bit in SQL;
  *   - the final projection is a map-only exact-integer dot product
  *     against the literal direction.
  *
  * v₀ = (1,…,1); convergence is not the point of the gate — the pinned
  * trajectory is. */
object Pca {

  /** Returns (idCol, proj): each vector's exact integer projection onto
    * the `iters`-step power-iteration estimate of the top principal
    * direction of the quantized, centered corpus. */
  def pcaTop1(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      iters: Int = 2): DataFrame = {
    require(iters > 0, "pcaTop1: need at least one iteration")
    val q = vecs.select(col(idCol).as("_id"), Clustering.quantized(col(vecCol)).as("_xq"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-dimension floor(sum/n) mean — exact ints after centering
    val dimSums = q.select(posexplode(col("_xq")).as(Seq("_i", "_x")))
      .groupBy("_i").agg(sum("_x").as("_s"), count(lit(1)).as("_n"))
      .collect()
    require(dimSums.nonEmpty, "pcaTop1: empty input")
    val dim = dimSums.length
    val mu = new Array[Long](dim)
    dimSums.foreach { r =>
      mu(r.getInt(0)) = math.floor(r.getLong(1).toDouble / r.getLong(2)).toLong
    }
    val muLit = array(mu.map(lit).toIndexedSeq: _*)
    def centered(xq: Column): Column = zip_with(xq, muLit, (x, m) => x - m)

    // covariance cells: one Gram-matrix aggregate over the centered
    // vectors (the matrix is symmetric — the aggregate carries the flat
    // row-major upper triangle; mirror on the driver)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val cells = q
      .withColumn("_xc", centered(col("_xq")))
      .agg(toCol(graft.functions.GramMatrixAgg(toExpr(col("_xc")))
        .toAggregateExpression()).as("g"))
      .first().getSeq[java.math.BigDecimal](0)
    require(cells.length == dim * (dim + 1) / 2,
      s"pcaTop1: expected ${dim * (dim + 1) / 2} gram cells, got ${cells.length}")
    val cov = Array.ofDim[BigInt](dim, dim)
    var t = 0
    for (i <- 0 until dim; j <- i until dim) {
      val v = BigInt(cells(t).toBigInteger)
      cov(i)(j) = v
      cov(j)(i) = v
      t += 1
    }

    // driver power iterations in BigInt; BigInt `/` truncates toward
    // zero — the same semantics as DuckDB's `//`
    var v = Array.fill(dim)(BigInt(1))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((acc, j) => acc + cov(i)(j) * v(j)))
      val m = w.map(_.abs).max
      val k = if (m == 0) 0 else math.max(m.bitLength - 10, 0)
      v = w.map(_ / (BigInt(1) << k))
    }
    val vLit = array(v.map(x => lit(x.toLong)).toIndexedSeq: _*)

    q.unpersist(blocking = false)
    q.select(col("_id").as(idCol),
      aggregate(
        zip_with(centered(col("_xq")), vLit, (x, d) => x * d),
        lit(0L), (acc, t) => acc + t).as("proj"))
  }

  /** DIMENSION VARIANCE PROFILE — which embedding coordinates carry
    * signal? The pre-flight audit for [[pcaTop1]], [[graft.ops.Pq]]
    * subspace splits and feature pruning: per dimension, the exact
    * population mean and variance of the micro-quantized coordinate,
    * ranked by variance (a near-zero-variance dim is dead weight in
    * every distance computation downstream).
    *
    * Integer-exact: mean as the re-signed integral micro division,
    * variance as `(n·Σx² − (Σx)²) div n²` in DECIMAL(38,0) micro².
    * ONE posexplode pass, a dim-bounded aggregate, one rank window
    * over the dim-sized table. Returns (dim, n, mean_micro,
    * var_micro2, var_rank), dim-ordered. */
  def dimProfile(
      vecs: DataFrame,
      vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDim = vecs
      .select(posexplode(transform(col(vecCol),
        e => floor(e.cast("double") * lit(1000000.0d)).cast("long")))
        .as(Seq("dim", "_x")))
    val agg = byDim.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(_x AS DECIMAL(38,0))")).as("_sx"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * _x")).as("_sxx"))
      .selectExpr("dim", "n",
        "CAST(CASE WHEN _sx >= 0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(abs(_sx) div n AS BIGINT) AS mean_micro",
        "CAST((CAST(n AS DECIMAL(38,0)) * _sxx - _sx * _sx) div " +
          "(CAST(n AS DECIMAL(38,0)) * n) AS BIGINT) AS var_micro2")
    agg
      .withColumn("var_rank", row_number().over( // dim-bounded ladder
        Window.orderBy(col("var_micro2").desc, col("dim").asc)).cast("long"))
      .orderBy("dim")
  }
}
