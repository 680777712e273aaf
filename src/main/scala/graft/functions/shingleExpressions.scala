package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling + MinHash kernels. The higher-order formulations
  * (`transform(sequence(...), i => substr...)`, 64× `array_min(transform
  * (...))`) are interpreted per element; these do the identical set
  * construction / hashing in tight loops. Set semantics match
  * `array_distinct` (first-occurrence order) so downstream
  * array_intersect/array_union sizes are unchanged. */

/** Distinct character n-grams of the (already-normalized) input string;
  * inputs shorter than n yield the whole string, like the composed form. */
case class CharShinglesExpression(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.length < n) return new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    val seen = new java.util.LinkedHashSet[String](s.length * 2)
    var i = 0
    val last = s.length - n
    while (i <= last) { seen.add(s.substring(i, i + n)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "char_shingles"
}

/** Distinct n-token shingles (tokens joined by one space) of a token
  * array; fewer than n tokens yield the space-joined whole. */
case class WordShinglesExpression(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val toks = new Array[String](m)
    var i = 0
    while (i < m) {
      val u = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      toks(i) = if (u == null) "" else u.toString // null element ≡ empty token
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String](m * 2)
    if (m < n) seen.add(toks.mkString(" "))
    else {
      var j = 0
      val last = m - n
      while (j <= last) {
        val sb = new java.lang.StringBuilder()
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(j + k)); k += 1 }
        seen.add(sb.toString); j += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var j2 = 0
    while (it.hasNext) { out(j2) = UTF8String.fromString(it.next()); j2 += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** MULTIPLICITY-PRESERVING word n-grams (strict: fewer than n tokens →
  * empty array) — repetition statistics need duplicate grams, which the
  * set-semantics [[WordShinglesExpression]] collapses. Same tight-loop
  * rationale: the `transform(sequence(...), i => ...)` form is
  * interpreted per element (measured 3× slower at sf0.1). */
case class WordNgramsExpression(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[String](m)
    var i = 0
    while (i < m) {
      val u = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      toks(i) = if (u == null) "" else u.toString // null element ≡ empty token
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    var j = 0
    val last = m - n
    while (j <= last) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(j + k)); k += 1 }
      out(j) = UTF8String.fromString(sb.toString); j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "word_ngrams"
}

/** k MinHash values over a shingle array in ONE pass (shingles outer,
  * seeds inner, XXH64 over the raw UTF-8 bytes). */
case class MinHashSignatureExpression(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      val base = s.getBaseObject; val off = s.getBaseOffset; val len = s.numBytes
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashUnsafeBytes(base, off, len, k)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** 64-bit SimHash over a token array: per-bit majority vote of XXH64
  * token hashes, multiplicity-preserving — one pass, map-only (the
  * explode + 64-conditional-sums groupBy formulation shuffles
  * |corpus|×|tokens| rows). */
case class SimHashExpression(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "simhash"
}

/** Per-shingle XXH64 hashes, SORTED ascending and deduplicated — the slim
  * verify payload for candidate pairs: set intersection/union sizes come
  * from an O(n) merge over 8-byte longs instead of `array_intersect` over
  * whole shingle strings (and the pair joins shuffle ~8 bytes per shingle
  * instead of the string). Sizes are exact modulo 64-bit hash collisions
  * (~n²/2⁶⁴ per document — negligible even at 100 TB). Seed 7 keeps these
  * hashes independent of the MinHash seeds 0..k-1 and SimHash's 42. */
case class SortedShingleHashesExpression(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      hs(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 7L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // input shingle arrays are already distinct; dedupe only collapses
    // intra-document hash collisions so the merge can count set-wise
    var n = 0
    var j = 0
    while (j < m) {
      if (j == 0 || hs(j) != hs(j - 1)) { hs(n) = hs(j); n += 1 }
      j += 1
    }
    val out = new Array[Any](n)
    var k = 0
    while (k < n) { out(k) = java.lang.Long.valueOf(hs(k)); k += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "sorted_shingle_hashes"
}

/** |A ∩ B| of two SORTED distinct long arrays via a single merge pass. */
case class SortedIntersectSizeExpression(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Integer.valueOf(n)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_size"
}

object ShingleFunctions {
  def char_shingles(norm: Column, n: Int): Column =
    column(CharShinglesExpression(expression(norm), n))
  def word_shingles(tokens: Column, n: Int): Column =
    column(WordShinglesExpression(expression(tokens), n))
  def word_ngrams(tokens: Column, n: Int): Column =
    column(WordNgramsExpression(expression(tokens), n))
  def minhash_signature(shingles: Column, k: Int): Column =
    column(MinHashSignatureExpression(expression(shingles), k))
  def sorted_shingle_hashes(shingles: Column): Column =
    column(SortedShingleHashesExpression(expression(shingles)))
  def sorted_intersect_size(a: Column, b: Column): Column =
    column(SortedIntersectSizeExpression(expression(a), expression(b)))
  def simhash(tokens: Column): Column =
    column(SimHashExpression(expression(tokens)))
  def rolling_window_hashes(tokens: Column, n: Int): Column =
    column(RollingWindowHashesExpression(expression(tokens), n))
  def term_counts(tokens: Column): Column =
    column(TermCountsExpression(expression(tokens)))
}

/** Per-document term frequencies as a MAP-ONLY kernel: token array →
  * sorted array<struct<term, tf>>. A document's tokens live in one row,
  * so its term histogram needs no shuffle at all — `groupBy(doc, term)`
  * hash-partitions every corpus token to compute a fact that was
  * already partition-local. Term-ascending order makes the output a
  * deterministic value (and downstream explodes reshuffle-stable).
  * Empty tokens are dropped (the tokenizer's artifact, not a term). */
case class TermCountsExpression(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val counts = new java.util.TreeMap[String, Long]()
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      if (s != null && s.numBytes > 0) {
        val t = s.toString
        val c = counts.get(t)
        counts.put(t, if (c == null) 1L else c + 1L)
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "term_counts"
}

/** 64-bit hash of every n-token window of a token array in ONE O(len)
  * pass: each token hashes once (XXH64 of its UTF-8 bytes, seed 11 —
  * independent of the MinHash/SimHash/sorted-hash seeds), windows
  * combine as the degree-(n−1) polynomial Σ th(i+k)·B^(n−1−k) mod 2⁶⁴
  * and slide in O(1): h' = (h − th(i)·Bⁿ⁻¹)·B + th(i+n). Replaces
  * "materialize the n-token gram string, then hash it" — O(n) bytes
  * copied + hashed PER POSITION — as the repeated-window key; downstream
  * keys are 8-byte longs instead of md5 strings. Collisions: window
  * hashes are polynomial mixes of strongly-hashed tokens, so distinct
  * windows collide with ~m²/2⁶⁴ probability corpus-wide (the
  * [[SortedShingleHashesExpression]] envelope — negligible and
  * deterministic). Strict: fewer than n tokens → empty array. */
case class RollingWindowHashesExpression(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "rolling_window_hashes: n must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private val B = 0x100000001b3L // odd ⇒ invertible mod 2⁶⁴
  private lazy val bPow: Long = { // B^(n-1) mod 2⁶⁴
    var p = 1L; var i = 1; while (i < n) { p *= B; i += 1 }; p
  }
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      th(i) = if (s == null) 0L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 11L)
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    var h = 0L
    var k = 0
    while (k < n) { h = h * B + th(k); k += 1 }
    out(0) = java.lang.Long.valueOf(h)
    var j = 1
    while (j <= m - n) {
      h = (h - th(j - 1) * bPow) * B + th(j + n - 1)
      out(j) = java.lang.Long.valueOf(h)
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "rolling_window_hashes"
}
