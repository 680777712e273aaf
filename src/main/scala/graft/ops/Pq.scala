package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._

/** Product quantization — the memory side of billion-scale ANN (the PQ
  * in Faiss's IVF-PQ): split each `dim`-vector into `m` subspaces, train
  * a k-entry codebook per subspace, and store each vector as `m` small
  * codes. At dim 64 / m 8 / k 16 a 256-byte float vector compresses to
  * 8 codes (32×) — the difference between an index that fits executor
  * memory at 100 TB and one that doesn't.
  *
  * Search is ADC (asymmetric distance computation): per query, a tiny
  * `m × k` lookup table of exact query-to-centroid sub-distances;
  * a candidate's approximate squared L2 is `m` table adds — no float
  * vector is ever touched at scan time. On unit-norm embeddings L2
  * ranking coincides with cosine ranking (‖a−b‖² = 2 − 2cos).
  *
  * Scale shape mirrors [[Ivf]]: training is driver-side Lloyd's per
  * subspace over one bounded deterministic sample (codebooks are m×k×
  * (dim/m) doubles — kilobytes); encoding is ONE map-only kernel pass;
  * scoring is map-only over the code column with the (small, bounded)
  * query set folded into the kernel as literals — candidates never
  * shuffle and no query×candidate join materializes vectors. Compose
  * with [[Ivf]] cells to prune candidates first when queries are many. */
object Pq {

  /** `codebooks(j)(c)` = centroid `c` of subspace `j` (length dim/m). */
  case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def subDim: Int = codebooks.head.head.length
  }

  /** Deterministic per-subspace Lloyd's on a bounded sample (first
    * `sampleN` rows by id; evenly-spread sample indexes as seeds — the
    * [[Ivf.train]] construction applied per subspace). */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 8,
      sampleN: Int = 4096): Model = {
    require(m > 0 && k > 1, s"pq: need m > 0 and k > 1, got m=$m k=$k")
    val sample = df.orderBy(col(idCol)).limit(sampleN)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "pq: empty training sample")
    val dims = sample.head.length
    require(dims % m == 0, s"pq: m=$m must divide dim=$dims")
    val sub = dims / m
    val codebooks = Array.tabulate(m) { j =>
      val slice = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      val kEff = math.min(k, slice.length)
      var cents = Array.tabulate(kEff)(i =>
        slice((i.toLong * slice.length / kEff).toInt).clone())
      (1 to iters).foreach { _ =>
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Long](cents.length)
        slice.foreach { v =>
          val c = nearestSub(v, cents)
          counts(c) += 1
          var d = 0
          while (d < sub) { sums(c)(d) += v(d); d += 1 }
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
        }.toArray
      }
      cents
    }
    Model(codebooks)
  }

  private def nearestSub(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var j = 0
      val cent = cents(c)
      while (j < cent.length) { val t = v(j) - cent(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** `m` codebook codes for a vector — one kernel pass. */
  def encode(vec: Column, model: Model): Column =
    toCol(PqEncodeExpression(toExpr(vec),
      model.codebooks.map(_.map(_.toSeq).toSeq).toSeq))

  /** (idCol, codes) for a corpus — the stored index payload. */
  def encodeAll(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    df.select(col(idCol), encode(col(vecCol), model).as("codes"))

  /** ADC approximate top-k with exact refinement: the compressed scan
    * shortlists `refine` candidates per query by ADC distance, then ONLY
    * the shortlist (queries × refine rows — bounded, tiny) joins real
    * vectors for an exact cosine rerank to `k` — Faiss's refine stage,
    * and the standard answer to ADC distortion on hard (uniform)
    * corpora: the corpus-sized scan touches codes only; float vectors
    * are fetched for ≤ 50×32 rows, not 50×N. Output shape =
    * [[Ann.bruteTopK]] (qid, rank, nid, score = rank-rounded cosine).
    * `refine = 0` skips refinement and returns raw ADC ranks with
    * score = negated approx squared L2.
    * The query set is driver-collected (bounded by `maxQueries` — query
    * batches are small by definition; candidates stay distributed). */
  def adcTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      k: Int,
      refine: Int = 32,
      maxQueries: Int = 4096): DataFrame = {
    require(refine == 0 || refine >= k,
      s"pq.adcTopK: refine=$refine must be 0 (off) or >= k=$k")
    val qRows = queries.select(col(idCol), col(vecCol)).collect()
    require(qRows.length <= maxQueries,
      s"pq.adcTopK: ${qRows.length} queries exceed maxQueries=$maxQueries — " +
        "batch the query set or prune candidates with Ivf cells instead")
    require(qRows.nonEmpty, "pq.adcTopK: empty query set")
    val qids = qRows.map(_.getLong(0))
    val sub = model.subDim
    val luts: Array[Array[Array[Double]]] = qRows.map { r =>
      val qv = r.getSeq[Float](1).map(_.toDouble).toArray
      Array.tabulate(model.m) { j =>
        Array.tabulate(model.k) { c =>
          val cent = model.codebooks(j)(c)
          var d = 0.0; var t = 0
          while (t < sub && j * sub + t < qv.length) {
            val x = qv(j * sub + t) - cent(t); d += x * x; t += 1
          }
          d
        }
      }
    }
    val scoredAll = encodeAll(candidates, idCol, vecCol, model)
      .select(col(idCol).as("nid"),
        explode(toCol(PqAdcExpression(toExpr(col("codes")),
          qids.toSeq, luts.map(_.map(_.toSeq).toSeq).toSeq))).as("_s"))
      .select(col("_s")("qid").as("qid"), col("nid"),
        (round(-col("_s")("dist"), 4) + 0.0).as("score"))
      .where(col("qid") =!= col("nid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    if (refine == 0) {
      scoredAll.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("qid", "rank", "nid", "score")
    } else {
      val shortlist = scoredAll.withColumn("rank", row_number().over(w))
        .where(col("rank") <= refine)
        .select("qid", "nid")
      val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("_qv"))
      val cv = candidates.select(col(idCol).as("nid"), col(vecCol).as("_cv"))
      val exact = shortlist.join(qv, Seq("qid")).join(cv, Seq("nid"))
        .withColumn("score", round(Ann.cosine(col("_qv"), col("_cv")), 4) + 0.0)
      exact.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("qid", "rank", "nid", "score")
    }
  }

  /** IVF-PQ: the composed billion-scale index — [[Ivf]] cells prune the
    * corpus to the query's `nProbe` nearest cells, PQ-ADC scores ONLY
    * cell members from codes, and the exact refine stage reranks the
    * bounded shortlist. The scan cost at 100 TB: cell assignment is one
    * map-only kernel pass at index-build time, per query the ADC touches
    * ~corpus·(nProbe/cells) code rows via the cell equi-join, and float
    * vectors are fetched for ≤ queries × refine rows. Output shape =
    * [[Ann.bruteTopK]]. */
  def ivfPqTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      ivfModel: Ivf.Model,
      pqModel: Model,
      k: Int,
      nProbe: Int = 4,
      refine: Int = 32,
      maxQueries: Int = 4096): DataFrame = {
    require(refine >= k, s"pq.ivfPqTopK: refine=$refine must be >= k=$k")
    val qRows = queries.select(col(idCol), col(vecCol)).collect()
    require(qRows.length <= maxQueries,
      s"pq.ivfPqTopK: ${qRows.length} queries exceed maxQueries=$maxQueries")
    require(qRows.nonEmpty, "pq.ivfPqTopK: empty query set")
    // driver-side probe of each query's nProbe cells (centroids are tiny)
    val qCells: Map[Long, Seq[Int]] = qRows.map { r =>
      val qv = r.getSeq[Float](1).map(_.toDouble).toArray
      val dists = ivfModel.centroids.zipWithIndex.map { case (cent, i) =>
        var d = 0.0; var j = 0
        val n = math.min(qv.length, cent.length)
        while (j < n) { val t = qv(j) - cent(j); d += t * t; j += 1 }
        (d, i)
      }
      r.getLong(0) -> dists.sortBy(identity).take(nProbe).map(_._2).toSeq
    }.toMap
    val sub = pqModel.subDim
    val qids = qRows.map(_.getLong(0))
    val luts: Array[Array[Array[Double]]] = qRows.map { r =>
      val qv = r.getSeq[Float](1).map(_.toDouble).toArray
      Array.tabulate(pqModel.m) { j =>
        Array.tabulate(pqModel.k) { c =>
          val cent = pqModel.codebooks(j)(c)
          var d = 0.0; var t = 0
          while (t < sub && j * sub + t < qv.length) {
            val x = qv(j * sub + t) - cent(t); d += x * x; t += 1
          }
          d
        }
      }
    }
    // index side: one kernel pass assigns the cell AND the codes
    val indexed = candidates.select(col(idCol).as("nid"),
      element_at(Ivf.probeCells(col(vecCol), ivfModel, 1), 1).as("_cell"),
      encode(col(vecCol), pqModel).as("codes"))
    // ADC over members of probed cells only: the broadcast (qid, cell)
    // probe list fans each member row out to EXACTLY the queries probing
    // its cell, and the binary kernel scores one (codes, qid) pair by
    // LUT lookup — work = Σ_cell |members| × |queries probing the cell|,
    // the true IVF-PQ scan cost, not |survivors| × |all queries|
    val spark = candidates.sparkSession
    import spark.implicits._
    val probePairs = qCells.toSeq
      .flatMap { case (qid, cells) => cells.map(c => (qid, c)) }
      .toDF("qid", "_cell")
    val scored = indexed
      .join(broadcast(probePairs), Seq("_cell"))
      .select(col("qid"), col("nid"),
        (round(-toCol(PqAdcOneExpression(toExpr(col("codes")), toExpr(col("qid")),
          qids.toSeq, luts.map(_.map(_.toSeq).toSeq).toSeq)), 4) + 0.0).as("score"))
      .where(col("qid") =!= col("nid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    val shortlist = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= refine)
      .select("qid", "nid")
    val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("_qv"))
    val cv = candidates.select(col(idCol).as("nid"), col(vecCol).as("_cv"))
    shortlist.join(qv, Seq("qid")).join(cv, Seq("nid"))
      .withColumn("score", round(Ann.cosine(col("_qv"), col("_cv")), 4) + 0.0)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "score")
  }
}

/** Kernel: PQ codes for a float/double vector — argmin per subspace
  * (strict `<`: ties keep the smaller code, deterministic). */
case class PqEncodeExpression(
    child: Expression,
    codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val m = cbs.length
    val sub = cbs(0)(0).length
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val cents = cbs(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var t = 0
        while (t < sub && j * sub + t < dims) {
          val x = (if (isFloat) arr.getFloat(j * sub + t).toDouble
                   else arr.getDouble(j * sub + t)) - cent(t)
          d += x * x
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** Kernel: ADC distance of one (codes, qid) pair — the per-row LUT is
  * found by qid in the literal batch; `m` adds per row. Used by the
  * IVF-PQ path, where the cell join already decided which queries see
  * which rows. */
case class PqAdcOneExpression(
    left: Expression,
    right: Expression,
    qids: Seq[Long],
    luts: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  private lazy val lutByQid: java.util.HashMap[Long, Array[Array[Double]]] = {
    val m = new java.util.HashMap[Long, Array[Array[Double]]]()
    qids.zip(luts).foreach { case (q, l) => m.put(q, l.map(_.toArray).toArray) }
    m
  }
  override protected def nullSafeEval(codesAny: Any, qidAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData].toIntArray()
    val lut = lutByQid.get(qidAny.asInstanceOf[Long])
    if (lut == null)
      throw new IllegalStateException(s"pq_adc_one: unknown qid $qidAny")
    var d = 0.0
    var j = 0
    while (j < codes.length && j < lut.length) { d += lut(j)(codes(j)); j += 1 }
    d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc_one"
}

/** Kernel: ADC distances of one code row against EVERY query LUT —
  * emits array<struct(qid, dist)>, `m` adds per query. Join-free: the
  * whole (bounded) query batch rides in the expression literals. */
case class PqAdcExpression(
    child: Expression,
    qids: Seq[Long],
    luts: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("dist", DoubleType, nullable = false))), containsNull = false)
  private lazy val qa: Array[Long] = qids.toArray
  private lazy val la: Array[Array[Array[Double]]] =
    luts.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData].toIntArray()
    val out = new Array[Any](qa.length)
    var q = 0
    while (q < qa.length) {
      val lut = la(q)
      var d = 0.0
      var j = 0
      while (j < codes.length && j < lut.length) { d += lut(j)(codes(j)); j += 1 }
      out(q) = InternalRow(qa(q), d)
      q += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_adc"
}
