package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native vector kernels. Spark's higher-order functions (zip_with /
  * aggregate) are interpreted per element — a 64-dim cosine via
  * expression trees walks ~200 nodes per pair, and hyperplane hashing
  * walks it ×(tables×bits). These expressions do the same arithmetic in
  * a tight JVM loop over the unsafe array data, with IDENTICAL
  * left-to-right double accumulation (bit-compatible with both the
  * higher-order formulation and DuckDB's list_cosine_similarity).
  */
object VectorKernels {
  /** dot/(|a||b|) with sequential double accumulation. */
  def cosine(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** `cosine_sim(a, b)` over array<float>/array<double>. */
case class CosineSimExpression(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Hyperplane-LSH bucket keys: for L tables × H planes, emits one long
  * per table — `(table << 48) | signBits` — in a single pass over the
  * vector. Planes are baked in as literals (deterministic seed). */
case class HyperplaneBucketsExpression(
    child: Expression,
    planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  // flattened for cache-friendly eval: planesFlat(t)(h) = Array[Double]
  private lazy val planesFlat: Array[Array[Array[Double]]] =
    planes.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dims = vec.numElements()
    val v = new Array[Double](dims)
    var i = 0
    while (i < dims) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val out = new Array[Long](planesFlat.length)
    var t = 0
    while (t < planesFlat.length) {
      var bits = 0L
      val tbl = planesFlat(t)
      var h = 0
      while (h < tbl.length) {
        val p = tbl(h)
        var d = 0.0
        var j = 0
        val n = math.min(dims, p.length)
        while (j < n) { d += v(j) * p(j); j += 1 }
        if (d >= 0) bits |= (1L << h)
        h += 1
      }
      out(t) = (t.toLong << 48) | bits
      t += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_buckets"
}

object VectorFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimExpression(expression(a), expression(b)))
  def hyperplane_buckets(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    column(HyperplaneBucketsExpression(expression(vec), planes))
}
