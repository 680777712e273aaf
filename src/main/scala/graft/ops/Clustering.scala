package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column, DETERMINISTIC
  * and engine-portable by construction:
  *
  *   - components quantize to exact BIGINT micro-units
  *     (`floor(x·10⁶)` — float→double is exact, the multiply and floor
  *     are the same IEEE ops on any engine), so every distance is
  *     integer arithmetic with zero rounding;
  *   - seeds are the k smallest ids (no RNG);
  *   - the centroid update is `floor(sum/n)` — one IEEE double division
  *     of exactly-representable integers — so centroids stay integral
  *     and the whole trajectory is reproducible bit-for-bit, run to
  *     run and engine to engine.
  *
  * Scale shape (the reason this is the 100 TB layout): vectors never
  * leave the executors — per iteration the data-sized work is ONE
  * map-only codegen'd argmin (k literal centroids folded into the
  * expression, no join) plus ONE partial aggregate shuffling
  * k·dim·partitions pre-combined rows; only the k·dim centroid sums
  * (kilobytes) ever reach the driver, the same bounded-collect
  * precedent as [[Ivf]]'s quantizer. Empty clusters keep their previous
  * centroid. */
object Clustering {

  /** Exact BIGINT micro-unit quantization of a float/double vector. */
  def quantized(vecCol: Column): Column =
    transform(vecCol, e => floor(e.cast("double") * lit(1000000.0d)).cast("long"))

  /** Σ (xᵢ−cᵢ)² against a literal centroid — exact BIGINT. */
  private def dist2(xq: Column, c: Array[Long]): Column =
    aggregate(
      zip_with(xq, array(c.map(lit).toIndexedSeq: _*), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)

  /** All k distances as one array; argmin =
    * `array_position(d, array_min(d)) − 1` — first match, so exact-tie
    * distances break to the smaller cluster id (integer equality, no
    * float hazard). */
  private def distArray(xq: Column, cents: Seq[Array[Long]]): Column =
    array(cents.map(dist2(xq, _)): _*)

  private def argmin(d: Column): Column =
    (array_position(d, array_min(d)) - 1).cast("int")

  /** Returns (idCol, cluster, dist2) after `iters` Lloyd iterations
    * from the k-smallest-id seeds. */
  def kmeans(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    require(k > 0, "kmeans: k must be positive")
    require(iters > 0, "kmeans: need at least one iteration")
    val q = vecs.select(col(idCol).as("_id"), quantized(col(vecCol)).as("_xq"))

    var cents: Seq[Array[Long]] = q.orderBy("_id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray).toSeq
    require(cents.length == k, s"kmeans: need at least $k vectors")
    val dim = cents.head.length

    for (_ <- 1 to iters) {
      val sums = q
        .select(argmin(distArray(col("_xq"), cents)).as("_cid"),
          posexplode(col("_xq")).as(Seq("_pos", "_x")))
        .groupBy("_cid", "_pos")
        .agg(sum("_x").as("_s"), count(lit(1)).as("_n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = (0 until k).map { c =>
        byCluster.get(c) match {
          case None => cents(c) // empty cluster: centroid survives
          case Some(rows) =>
            val arr = new Array[Long](dim)
            rows.foreach { r =>
              arr(r.getInt(1)) = math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong
            }
            arr
        }
      }
    }

    q.withColumn("_d", distArray(col("_xq"), cents))
      .select(col("_id").as(idCol),
        argmin(col("_d")).as("cluster"),
        array_min(col("_d")).as("dist2"))
  }
}
