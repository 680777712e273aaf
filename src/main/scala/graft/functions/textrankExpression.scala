package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TextRank (Mihalcea & Tarau 2004) per-document keyword scores as ONE
  * map-only kernel: the word co-occurrence graph, its degrees, and the
  * damped power iterations all live inside a single document's token
  * array, so shuffling (doc, word) rows across the cluster — the naive
  * join-per-iteration formulation, measured 2.8 s in-suite and
  * cluster-wide data motion at 100 TB — buys nothing. This expression
  * computes the identical INTEGER-EXACT recurrence
  * `r' = 150000 + (850 * Σ_u (r(u)·cnt(u,v)) div wdeg(u)) div 1000`
  * locally (integer sums are order-free, so per-doc locality cannot
  * change any result), and emits the top-k (rank, word, score) structs.
  *
  * Edges are adjacent-token pairs, symmetric, self-loops dropped;
  * ties break (score desc, word asc); docs with < 2 tokens emit an
  * empty array (explode then drops them, matching the join
  * formulation's size filter).
  */
case class TextRankExpression(child: Expression, k: Int, iters: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && iters >= 1, "textrank: k and iters must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("word", StringType, nullable = false),
    StructField("score", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    // overflow envelope: score mass is bounded by n·10^6 (the damped
    // update conserves-then-shrinks total mass), edge counts by n, so
    // r(src)·cnt ≤ n²·10^6 — safe in Long up to n = 3·10^6 tokens.
    // Past that, raise loudly rather than wrap silently.
    require(n <= 3000000,
      s"textrank: document has $n tokens (> 3e6) — integer score envelope would overflow")
    // word interning: id by first occurrence
    val idOf = mutable.HashMap.empty[String, Int]
    val words = mutable.ArrayBuffer.empty[String]
    val seq = new Array[Int](n)
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i).toString
      seq(i) = idOf.getOrElseUpdate(w, { words += w; words.length - 1 })
      i += 1
    }
    val nw = words.length
    // symmetric adjacent-pair counts, keyed src * nw + dst
    val cnt = mutable.HashMap.empty[Long, Long]
    val wdeg = new Array[Long](nw)
    i = 0
    while (i < n - 1) {
      val a = seq(i); val b = seq(i + 1)
      if (a != b) {
        cnt.updateWith(a.toLong * nw + b)(c => Some(c.getOrElse(0L) + 1))
        cnt.updateWith(b.toLong * nw + a)(c => Some(c.getOrElse(0L) + 1))
        wdeg(a) += 1; wdeg(b) += 1
      }
      i += 1
    }
    var r = Array.fill(nw)(1000000L)
    var it = 0
    while (it < iters) {
      val s = new Array[Long](nw)
      cnt.foreach { case (key, c) =>
        val src = (key / nw).toInt; val dst = (key % nw).toInt
        s(dst) += r(src) * c / wdeg(src) // wdeg(src) > 0: src has an edge
      }
      val next = new Array[Long](nw)
      var v = 0
      while (v < nw) { next(v) = 150000L + 850L * s(v) / 1000L; v += 1 }
      r = next
      it += 1
    }
    val order = (0 until nw).sortBy(v => (-r(v), words(v)))
    val out = order.take(k).zipWithIndex.map { case (v, rk) =>
      InternalRow(rk + 1, UTF8String.fromString(words(v)), r(v)): Any
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "textrank"
}

object TextRankFunctions {
  def textrank(tokens: Column, k: Int, iters: Int): Column =
    column(TextRankExpression(expression(tokens), k, iters))
}
