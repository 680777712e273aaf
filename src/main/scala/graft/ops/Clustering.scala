package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

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
  * map-only argmin kernel (k literal centroids folded into the
  * expression, no join) plus ONE partial aggregate shuffling
  * k·dim·partitions pre-combined rows; only the k·dim centroid sums
  * (kilobytes) ever reach the driver, the same bounded-collect
  * precedent as [[Ivf]]'s quantizer. The quantized vectors persist
  * (memory-and-disk) across iterations — the standard iterative-ML
  * trade: one materialization instead of `iters` source re-scans.
  * The assignment is [[NearestCentroidExpression]], a tight pre-compiled
  * long loop over k×dim: the per-iteration plan carries new centroid
  * literals, and a kernel costs nothing to "recompile" where a
  * zip_with/aggregate expression tree pays a fresh janino pass every
  * iteration. Empty clusters keep their previous centroid. */
object Clustering {

  /** Exact BIGINT micro-unit quantization of a float/double vector. */
  def quantized(vecCol: Column): Column =
    transform(vecCol, e => floor(e.cast("double") * lit(1000000.0d)).cast("long"))

  private def nearest(xq: Column, cents: Seq[Array[Long]]): Column =
    toCol(NearestCentroidExpression(toExpr(xq), cents.map(_.toSeq)))

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
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cents = lloydLoop(q, k, iters)
    // the iterations (eager collects) are what the cache exists for; the
    // final assignment recomputes the map-only lineage once so we can
    // release the blocks before handing back a lazy result
    q.unpersist(blocking = false)
    q.withColumn("_a", nearest(col("_xq"), cents))
      .select(col("_id").as(idCol),
        col("_a")("cid").as("cluster"),
        col("_a")("dist2").as("dist2"))
  }

  /** The Lloyd trajectory on a prepared (_id, _xq) frame: k-smallest-id
    * seeds, `iters` rounds of map-only argmin + one k·dim partial agg,
    * floor(sum/n) updates, empty clusters keep their centroid. Only the
    * kilobyte centroid sums reach the driver each round. */
  private def lloydLoop(
      q: DataFrame,
      k: Int,
      iters: Int): Seq[Array[Long]] = {
    var cents: Seq[Array[Long]] = q.orderBy("_id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray).toSeq
    require(cents.length == k, s"kmeans: need at least $k vectors")
    val dim = cents.head.length
    for (_ <- 1 to iters) {
      val sums = q
        .select(nearest(col("_xq"), cents)("cid").as("_cid"),
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
    cents
  }

  /** CLUSTER-QUALITY SCORECARD for the [[kmeans]] partition — the "is k
    * right / did Lloyd converge somewhere sane" one-pager, computed
    * WITHOUT any pairwise pass: the simplified silhouette (Hruschka et
    * al.: centroid distances in place of mean pairwise distances — the
    * only silhouette that exists at 100 TB) and the Davies–Bouldin
    * per-cluster worst ratio.
    *
    * Per point, over the SAME exact integer micro² distances the Lloyd
    * trajectory used: a² = nearest-centroid distance, b² = second
    * nearest (sorted once). s = (√b²−√a²)·10⁶ / max(√a²,√b²), floored
    * to ppm — sqrt/sub/div are single correctly-rounded IEEE ops, so
    * any engine replays the integer exactly; s ≥ 0 by construction
    * (b ≥ a), so plain integral division is floor-safe everywhere.
    * Per cluster: n, mean silhouette ppm (Σs div n), mean centroid
    * distance S in micro (Σ⌊√a²⌋ div n), and the Davies–Bouldin
    * R_i = max_j (S_i+S_j)·10⁶ div ⌊√Σ(c_i−c_j)²⌋ over the k² (driver-
    * side, kilobyte) centroid pair table — NULL if every other centroid
    * collapsed onto this one.
    *
    * Shape: one map-only kernel (k literal centroids folded in — k·dim
    * doubles as expression literals), ONE k-sized partial agg, then
    * k-bounded joins. The corpus is touched once after the Lloyd loop.
    * Returns (cluster, n, mean_sil_ppm, s_micro, max_r_ppm); empty
    * clusters are absent (no members to score). */
  def clusterQuality(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    require(k >= 2, "clusterQuality: need k >= 2 (silhouette undefined for k = 1)")
    require(iters > 0, "clusterQuality: need at least one iteration")
    val q = vecs.select(col(idCol).as("_id"), quantized(col(vecCol)).as("_xq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cents = lloydLoop(q, k, iters)
    q.unpersist(blocking = false)
    val dCols = cents.zipWithIndex.map { case (c, j) =>
      aggregate(
        zip_with(col("_xq"), typedLit(c.toSeq), (x, cc) => (x - cc) * (x - cc)),
        lit(0L), (acc, e) => acc + e).as(s"_d$j")
    }
    val bestStructs = (0 until k).map(j =>
      struct(col(s"_d$j").as("d"), lit(j).as("cid")))
    val pt = q.select(col("_id") +: dCols: _*)
      .withColumn("_sorted", array_sort(array((0 until k).map(j => col(s"_d$j")): _*)))
      .select(
        least(bestStructs: _*)("cid").as("cluster"),
        element_at(col("_sorted"), 1).as("_a2"),
        element_at(col("_sorted"), 2).as("_b2"))
    val sa = sqrt(col("_a2").cast("double"))
    val sb = sqrt(col("_b2").cast("double"))
    val mx = greatest(sa, sb)
    val scored = pt.select(col("cluster"),
      when(mx === 0.0d, lit(0L))
        .otherwise(floor((sb - sa) * lit(1000000.0d) / mx).cast("long"))
        .as("_s"),
      floor(sa).cast("long").as("_df"))
    val st = scored.groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum(col("_s")).as("_ssum"),
        sum(col("_df")).as("_dsum"))
      .select(col("cluster"), col("n"),
        expr("CAST(_ssum div n AS BIGINT)").as("mean_sil_ppm"),
        expr("CAST(_dsum div n AS BIGINT)").as("s_micro"))
    // centroid pair distances: k² rows, exact integer micro (driver-side
    // Long arithmetic, sqrt of an exactly-representable sum)
    import vecs.sparkSession.implicits._
    val pairRows = for {
      i <- 0 until k; j <- 0 until k if i != j
    } yield {
      // BigInt accumulation (the labelSeparation idiom): a micro-unit
      // coordinate gap above ~3e9 would silently overflow dd*dd in Long
      var s = BigInt(0)
      var p = 0
      while (p < cents(i).length) {
        val dd = BigInt(cents(i)(p) - cents(j)(p)); s += dd * dd; p += 1
      }
      (i, j, math.floor(math.sqrt(s.toDouble)).toLong)
    }
    val cm = pairRows.toDF("_ci", "_cj", "_m")
    val r = broadcast(cm.where(col("_m") > 0))
      .join(st.select(col("cluster").as("_ci"), col("s_micro").as("_si")), Seq("_ci"))
      .join(st.select(col("cluster").as("_cj"), col("s_micro").as("_sj")), Seq("_cj"))
      .groupBy(col("_ci").as("cluster"))
      .agg(max(expr("CAST((_si + _sj) * 1000000 div _m AS BIGINT)")).as("max_r_ppm"))
    st.join(r, Seq("cluster"), "left")
      .orderBy("cluster")
  }

  /** LABEL-SEPARATION GEOMETRY — the "are these classes even separable
    * in this embedding space" audit a labeling effort runs before
    * training anything: per label pair, the centroid distance against
    * the two classes' internal scatter ([[clusterQuality]]'s
    * Davies–Bouldin shape, driven by GIVEN labels instead of Lloyd
    * assignments). sep_ratio ≫ 1 means a linear probe will work;
    * ≈ 1 means the labels are tangled in this space.
    *
    * Exact integers throughout: micro-quantized vectors, label
    * centroids by the k-means floor(sum/n) rule (computed
    * distributedly, only the labels×dim table — kilobytes — reaches
    * the driver, the bounded-collect precedent), per-point distances
    * via one (label, pos)-keyed broadcast join, S = Σ⌊√d²⌋ div n in
    * micro, M = ⌊√Σ(cᵢ−cⱼ)²⌋, ratio = M·10⁶ div (S_a + S_b) (NULL
    * when both classes are points). Returns one row per unordered
    * label pair (label_a, label_b, n_a, n_b, m_micro, s_a_micro,
    * s_b_micro, sep_ratio_ppm), pair-ordered. */
  def labelSeparation(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame = {
    val q = vecs
      .where(col(labelCol).isNotNull)
      .select(col(idCol).as("_id"), col(labelCol).cast("long").as("_l"),
        quantized(col(vecCol)).as("_xq"))
    val byDim = q.select(col("_id"), col("_l"),
      posexplode(col("_xq")).as(Seq("_pos", "_x")))
    val cents = byDim.groupBy(col("_l"), col("_pos"))
      .agg(expr("CAST(floor(CAST(sum(_x) AS DOUBLE) / count(1)) AS BIGINT)").as("_c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-point squared distance to the OWN centroid: one broadcast join
    // on (label, dim) — the centroid table is labels×dim-bounded
    val scatter = byDim.join(broadcast(cents), Seq("_l", "_pos"))
      .groupBy(col("_l"), col("_id"))
      .agg(sum(expr("CAST((_x - _c) AS DECIMAL(38,0)) * (_x - _c)")).as("_d2"))
      .groupBy(col("_l"))
      .agg(count(lit(1)).as("_n"),
        sum(expr("CAST(floor(sqrt(CAST(_d2 AS DOUBLE))) AS BIGINT)")).as("_sd"))
      .selectExpr("_l", "_n", "CAST(_sd div _n AS BIGINT) AS _s")
    // centroid pair distances: labels×dim collect (kilobytes), exact
    // Long arithmetic, one correctly-rounded sqrt per pair
    val centRows = cents.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val labels = centRows.keys.map(_._1).toSeq.distinct.sorted
    val dims = centRows.keys.map(_._2).toSeq.distinct.sorted
    val pairRows = for {
      i <- labels.indices; j <- (i + 1) until labels.size
    } yield {
      var s = BigInt(0)
      dims.foreach { p =>
        val dd = BigInt(centRows((labels(i), p)) - centRows((labels(j), p)))
        s += dd * dd
      }
      (labels(i), labels(j), math.floor(math.sqrt(s.toDouble)).toLong)
    }
    import vecs.sparkSession.implicits._
    val cm = pairRows.toDF("label_a", "label_b", "m_micro")
    cm
      .join(scatter.select(col("_l").as("label_a"), col("_n").as("n_a"),
        col("_s").as("s_a_micro")), Seq("label_a"))
      .join(scatter.select(col("_l").as("label_b"), col("_n").as("n_b"),
        col("_s").as("s_b_micro")), Seq("label_b"))
      .withColumn("sep_ratio_ppm",
        when(col("s_a_micro") + col("s_b_micro") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST(CAST(m_micro AS DECIMAL(38,0)) * 1000000 " +
              "div (s_a_micro + s_b_micro) AS BIGINT)")))
      .select("label_a", "label_b", "n_a", "n_b", "m_micro",
        "s_a_micro", "s_b_micro", "sep_ratio_ppm")
      .orderBy("label_a", "label_b")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication = cluster the embedding space, then prune
    * within-cluster pairs above a cosine threshold — the clusters bound
    * the quadratic so the corpus never sees an all-pairs join.
    *
    * Composition: [[kmeans]] assigns every vector; a per-cluster
    * self-join (a < b) scores candidate pairs with the rank-rounded
    * cosine recipe ([[Ann.cosine]] round-4 — the proven engine-portable
    * score); a row is pruned when ANY smaller-id member of its cluster
    * sits at or above `tau`, and `dup_of` names the smallest such id.
    *
    * Scale shape: the only data-sized shuffles are the k-means kernel
    * passes and one hash partition by cluster id; pair work is
    * Σ|cluster|² — SemDeDup's own design point (pick k so clusters are
    * ~√n). Keeps the SMALLEST id per duplicate set (deterministic, no
    * RNG); the paper's farthest-from-centroid keeper is a one-line
    * ORDER BY swap on the same plan.
    *
    * Output: (idCol, cluster, keep, dup_of?) — `dup_of` NULL on kept
    * rows. */
  def semDeDup(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      tau: Double): DataFrame = {
    val assign = kmeans(vecs, idCol, vecCol, k, iters)
      .select(col(idCol).as("_sid"), col("cluster"))
    val v = vecs.select(col(idCol).as("_sid"), col(vecCol).as("_vec"))
      .join(assign, Seq("_sid"))
    val a = v.select(col("cluster"), col("_sid").as("_a"), col("_vec").as("_va"))
    val b = v.select(col("cluster"), col("_sid").as("_b"), col("_vec").as("_vb"))
    val pruned = a.join(b, Seq("cluster"))
      .where(col("_a") < col("_b"))
      .where(round(Ann.cosine(col("_va"), col("_vb")), 4) >= tau)
      .groupBy(col("_b"))
      .agg(min(col("_a")).as("dup_of"))
    v.join(pruned, col("_sid") === col("_b"), "left")
      .select(col("_sid").as(idCol), col("cluster"),
        col("dup_of").isNull.as("keep"), col("dup_of"))
  }

  /** Cluster-balanced (diversity) sampling: [[kmeans]] partitions the
    * embedding space, then each cluster contributes its `quota` most
    * REPRESENTATIVE members — centroid-proximal first (`dist2` asc, id
    * tie-break), the prototype-selection recipe — so the sample spans
    * every region of the space instead of letting the dominant mode
    * swamp it (the failure of uniform sampling on skewed corpora).
    * Deterministic end to end: integer distances, no RNG.
    *
    * Scale shape: clustering is the [[kmeans]] kernel (vectors never
    * leave executors); the quota cut is ONE window partitioned by
    * cluster — a partial `WindowGroupLimit` prunes to quota rows per
    * partition map-side before the exchange, so the shuffle carries
    * ~k·quota survivors, not the corpus.
    *
    * Returns (idCol, cluster, dist2, rk ∈ 1..quota). */
  def clusterQuotaSample(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      quota: Int): DataFrame = {
    require(quota > 0, "clusterQuotaSample: quota must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("dist2").asc, col(idCol).asc)
    kmeans(vecs, idCol, vecCol, k, iters)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= quota)
      .select(col(idCol), col("cluster"), col("dist2"), col("rk"))
  }
}

/** Kernel: (nearest centroid id, exact squared L2 distance) for a
  * quantized BIGINT vector against k literal centroids — one tight
  * pre-compiled long loop over k×dim per row (no per-row array
  * allocation, nothing for janino to recompile when the centroid
  * literals change between iterations). Strict `<` keeps the smallest
  * cluster id on exact-tie distances — integer equality, no float
  * hazard. */
case class NearestCentroidExpression(
    child: Expression,
    centroids: Seq[Seq[Long]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("dist2", LongType, nullable = false)))
  private lazy val cents: Array[Array[Long]] = centroids.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    var bestC = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(dims, cent.length)
      var d = 0L
      var j = 0
      while (j < n) { val t = arr.getLong(j) - cent(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; bestC = c }
      c += 1
    }
    InternalRow(bestC, bestD)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
}
