package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** IVF-style approximate nearest neighbor: a coarse k-means quantizer
  * partitions the corpus into cells; a query probes only its `nProbe`
  * nearest cells and reranks exactly. The complementary scale path to
  * hyperplane LSH (Ann.lshTopK) — IVF adapts to the data distribution,
  * which prunes far better on clustered embedding corpora.
  *
  * Training is driver-side Lloyd's over a bounded deterministic sample
  * (centroids are tiny: k × dims doubles); assignment/probing run as one
  * native kernel pass per row; candidate generation is an equi-join on
  * the cell id — shuffle ∝ corpus × 1 and queries × nProbe, never
  * all-pairs.
  */
object Ivf {

  case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Deterministic Lloyd's k-means on a bounded sample (first `sampleN`
    * rows by id; seeded index-spread init). */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 8,
      sampleN: Int = 4096): Model = {
    val sample = df.orderBy(col(idCol)).limit(sampleN)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dims = sample.head.length
    // init: evenly spread sample indexes (deterministic)
    var centroids = Array.tabulate(math.min(k, sample.length))(i =>
      sample((i.toLong * sample.length / math.min(k, sample.length)).toInt).clone())
    (1 to iters).foreach { _ =>
      val sums = Array.fill(centroids.length)(new Array[Double](dims))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var j = 0
        while (j < dims) { sums(c)(j) += v(j); j += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    Model(centroids)
  }

  private def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var j = 0
      val cent = cents(c)
      val n = math.min(v.length, cent.length)
      while (j < n) { val t = v(j) - cent(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** `nProbe` nearest cell ids for a vector, one kernel pass. */
  def probeCells(vec: Column, model: Model, nProbe: Int): Column =
    toCol(CentroidProbeExpression(toExpr(vec), model.centroids.map(_.toSeq).toSeq, nProbe))

  /** Exact top-k over IVF candidates. Output shape = Ann.bruteTopK. */
  def topK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      k: Int,
      nProbe: Int = 4): DataFrame = {
    val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("_qv"))
    val cv = candidates.select(col(idCol).as("nid"), col(vecCol).as("_cv"))
    val q = qv.withColumn("_cell", explode(probeCells(col("_qv"), model, nProbe)))
      .select("qid", "_cell")
    val c = cv.withColumn("_cell", element_at(probeCells(col("_cv"), model, 1), 1))
      .select("nid", "_cell")
    val pairs = q.join(c, Seq("_cell"))
      .where(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    val scored = pairs.join(qv, Seq("qid")).join(cv, Seq("nid"))
      .withColumn("score", round(Ann.cosine(col("_qv"), col("_cv")), 4) + 0.0)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "score")
  }
}

/** Kernel: indices of the `nProbe` nearest centroids (L2), ascending by
  * distance — a tight loop over (dims × k) per row. */
case class CentroidProbeExpression(
    child: Expression,
    centroids: Seq[Seq[Double]],
    nProbe: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private lazy val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val v = new Array[Double](dims)
    var i = 0
    while (i < dims) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val dists = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var j = 0
      val cent = cents(c)
      val n = math.min(dims, cent.length)
      while (j < n) { val t = v(j) - cent(j); d += t * t; j += 1 }
      dists(c) = d
      c += 1
    }
    val order = dists.zipWithIndex.sortBy { case (d, idx) => (d, idx) }
      .take(math.min(nProbe, cents.length)).map(_._2)
    new GenericArrayData(order)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "centroid_probe"
}
