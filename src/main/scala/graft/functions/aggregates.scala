package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native Catalyst aggregate —
  * the bounded-memory, single-pass, MERGEABLE answer to "top terms" at
  * 100 TB: each partition keeps at most `capacity` counters (classic
  * decrement rule), partial summaries merge by counter addition
  * followed by a rank-(capacity+1) subtraction (Agrawal/Cormode
  * mergeable-summaries construction), and the final state is at most
  * `capacity` (token, lower-bound count) pairs.
  *
  * Guarantees (standard MG): every token with true frequency
  * > n/(capacity+1) survives, and each reported count underestimates
  * the true count by at most n/(capacity+1). When the live vocabulary
  * never exceeds `capacity` no decrement ever fires and the counts are
  * EXACT — which also makes the result partition-order-independent
  * (the p70 gate runs in that regime; eviction behavior is spec-pinned
  * instead, since evicted counters are legitimately order-dependent).
  *
  * Compare `CorpusOps.vocabTopK`: exact but shuffles the full vocab;
  * this shuffles at most `capacity` counters per partition. */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(capacity > 0, "misra_gries: capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None => // decrement step: all counters down one, drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1
            if (c == 0) dead += k else buf.update(k, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { k =>
        val c = buf(k) - cut
        if (c <= 0) dead += k else buf.update(k, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.asInstanceOf[Array[Any]])
  }

  // Tokens serialize as length-prefixed UTF-8 byte arrays, NOT
  // DataOutputStream.writeUTF — writeUTF throws UTFDataFormatException
  // past 65535 encoded bytes, so one pathological unbroken-text token
  // would kill the job with an obscure shuffle-time error.
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (1 to n).foreach { _ =>
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

/** Mutable per-partition Gram-matrix buffer: the upper triangle of
  * Σ x·xᵀ over long vectors, each cell an EXACT signed 128-bit
  * accumulator split into (hi, lo) word arrays. `dim = -1` marks a
  * buffer that has seen no rows yet (empty partitions merge as
  * identity). */
final class GramBuffer(var dim: Int, var hi: Array[Long], var lo: Array[Long])

/** Gram / scatter matrix of a long-vector column as a native Catalyst
  * aggregate — the 100 TB covariance path: each partition folds its rows
  * into ONE dim(dim+1)/2-cell triangle (update is a tight primitive-long
  * loop: `Math.multiplyHigh` + 64→128-bit carry add, no allocation, no
  * BigInt), partials merge cellwise, and only #partitions × triangle
  * cells ever shuffle — the input rows never leave the map side. This
  * replaces the earlier per-row dim² pair-explode, which materialized
  * ~dim²/2 intermediate rows PER INPUT ROW (at dim 1024: ~524k rows per
  * vector — a scale-killer the plan audit rightly flagged).
  *
  * Exactness: a signed 128-bit accumulator cannot wrap — each product of
  * two longs is < 2^126 in magnitude and n adds reach 2^127 only past
  * n·max|x|² ≈ 1.7e38 rows·units², where [[eval]] raises LOUDLY (the
  * valueOutliers precedent) instead of silently truncating. Output is
  * the flat row-major upper triangle (i ≤ j) as DECIMAL(38,0): exact,
  * order-independent, and bit-identical to a DuckDB HUGEINT sum.
  * Ragged input vectors raise rather than mis-index cells. */
case class GramMatrixAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(38, 0), containsNull = false)

  override def createAggregationBuffer(): GramBuffer =
    new GramBuffer(-1, null, null)

  // 128-bit += (addHi, addLo); index t. Two's-complement carry: the low
  // word sum wraps iff it is unsigned-smaller than either operand.
  // Signed 128-bit overflow (result sign differs from both operands')
  // RAISES — a wrapped accumulator between 2^127 and the eval() decimal
  // bound would otherwise read back as a small in-range value.
  @inline private def add128(b: GramBuffer, t: Int, addHi: Long, addLo: Long): Unit = {
    val oldHi = b.hi(t)
    val newLo = b.lo(t) + addLo
    val carry = if (java.lang.Long.compareUnsigned(newLo, addLo) < 0) 1L else 0L
    val newHi = oldHi + addHi + carry
    if (((oldHi ^ newHi) & (addHi ^ newHi)) < 0)
      throw new IllegalStateException(
        "gram_matrix: 128-bit accumulator overflow (n·max|x|² past 2^127) " +
          "— rescale the input")
    b.lo(t) = newLo
    b.hi(t) = newHi
  }

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData].toLongArray()
      val d = x.length
      if (buf.dim < 0) {
        buf.dim = d
        val cells = d * (d + 1) / 2
        buf.hi = new Array[Long](cells)
        buf.lo = new Array[Long](cells)
      } else if (buf.dim != d)
        throw new IllegalStateException(
          s"gram_matrix: ragged vectors (dim ${buf.dim} vs $d)")
      var i = 0
      var t = 0
      while (i < d) {
        val xi = x(i)
        var j = i
        while (j < d) {
          add128(buf, t, Math.multiplyHigh(xi, x(j)), xi * x(j))
          j += 1
          t += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    if (other.dim < 0) buf
    else if (buf.dim < 0) {
      // adopt the (freshly deserialized, never reused) partial wholesale
      buf.dim = other.dim; buf.hi = other.hi; buf.lo = other.lo
      buf
    } else {
      if (buf.dim != other.dim)
        throw new IllegalStateException(
          s"gram_matrix: merging buffers of dim ${buf.dim} vs ${other.dim}")
      var t = 0
      while (t < buf.lo.length) {
        add128(buf, t, other.hi(t), other.lo(t))
        t += 1
      }
      buf
    }
  }

  private val decMax = BigInt(10).pow(38)

  override def eval(buf: GramBuffer): Any = {
    if (buf.dim < 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](buf.lo.length)
      var t = 0
      while (t < buf.lo.length) {
        val v = (BigInt(buf.hi(t)) << 64) + (BigInt(buf.lo(t)) & ((BigInt(1) << 64) - 1))
        if (v.abs >= decMax)
          throw new IllegalStateException(
            "gram_matrix: cell exceeds the exact DECIMAL(38,0) domain " +
              "(n·max|x|² past 1e38) — rescale the input")
        out(t) = Decimal(scala.math.BigDecimal(v), 38, 0)
        t += 1
      }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dim)
    if (buf.dim >= 0) {
      var t = 0
      while (t < buf.lo.length) {
        out.writeLong(buf.hi(t)); out.writeLong(buf.lo(t)); t += 1
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    if (d < 0) new GramBuffer(-1, null, null)
    else {
      val cells = d * (d + 1) / 2
      val hi = new Array[Long](cells)
      val lo = new Array[Long](cells)
      var t = 0
      while (t < cells) { hi(t) = in.readLong(); lo(t) = in.readLong(); t += 1 }
      new GramBuffer(d, hi, lo)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "gram_matrix"
}

/** Shared Count-Min hashing: row `i`'s bucket for a token is an
  * FNV-1a-64 fold of the token's UTF-8 bytes from a per-row seeded
  * basis, reduced mod `width`. Pure integer ops on fixed constants —
  * deterministic across JVMs, partitions, and engines. */
object CmsHash {
  private val FnvPrime = 0x100000001b3L
  private val FnvBasis = 0xcbf29ce484222325L
  // distinct per-row bases via a golden-ratio odd-constant scramble
  def bucket(bytes: Array[Byte], row: Int, width: Int): Int = {
    var h = FnvBasis ^ (0x9e3779b97f4a7c15L * (row + 1))
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= FnvPrime; i += 1 }
    val m = (h % width).toInt
    if (m < 0) m + width else m
  }
}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native Catalyst
  * aggregate — the fixed-memory, MERGEABLE frequency table for token
  * streams where even the vocabulary doesn't fit: each partition folds
  * its tokens into a depth×width long grid, partials merge by
  * element-wise addition (the sketch is a linear transform of the
  * input), and point queries read `min_i grid[i][h_i(token)]` via
  * [[CmsEstimateExpression]].
  *
  * Guarantees: estimates never undercount, and overcount each token by
  * at most e·N/width with probability 1 − e^(−depth) (N = total
  * updates, recoverable from the sketch itself as the sum of any one
  * row — no second pass). Memory is depth·width·8 bytes regardless of
  * corpus size: the 100 TB shuffle is #partitions × one grid, vs a
  * vocab-sized exact aggregation. */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(depth > 0 && depth <= 16, "count_min: depth must be in [1,16]")
  require(width > 0, "count_min: width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var r = 0
      while (r < depth) {
        buf(r * width + CmsHash.bucket(bytes, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box).asInstanceOf[Array[Any]])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "count_min"
}

/** Point query against a [[CountMinAgg]] sketch: min over the depth
  * rows of the token's buckets. Evaluated on the handful of probe rows
  * only — interpreted eval is fine here. */
case class CmsEstimateExpression(
    sketch: Expression,
    token: Expression,
    depth: Int,
    width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def left: Expression = sketch
  override def right: Expression = token
  override def dataType: DataType = LongType

  override protected def nullSafeEval(sk: Any, tok: Any): Any = {
    val grid = sk.asInstanceOf[ArrayData]
    val bytes = tok.asInstanceOf[UTF8String].getBytes
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = grid.getLong(r * width + CmsHash.bucket(bytes, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(sketch = l, token = r)
  override def prettyName: String = "cms_estimate"
}

/** Bloom filter as a native Catalyst aggregate — the fixed-memory,
  * MERGEABLE set membership structure for decontamination at corpus
  * scale: the benchmark/eval side can't be joined against 100 TB of
  * corpus fingerprints, but a one-pass fold of the corpus into an
  * m-bit filter (partials merge by OR — 8 KB per partition at m=2¹⁶,
  * 1 MB at m=2²³) broadcasts to any probe site for O(1) membership.
  *
  * Bit positions are `k` disjoint `hexChars`-wide windows of the
  * child's sha256 HEX string (child must be `sha2(x, 256)` — lowercase
  * 64-hex), each parsed as an integer in [0, 16^hexChars). Windowing
  * the hex keeps the construction ENGINE-PORTABLE: an external checker
  * reproduces the exact bit set with string ops alone (`substr(hex)`),
  * no 64-bit hash arithmetic required. No false negatives ever; false
  * positive rate ≈ (1 − e^(−kn/m))^k, deterministic for a fixed corpus.
  */
case class BloomFilterAgg(
    child: Expression,
    hexChars: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(hexChars >= 2 && hexChars <= 8, "bloom: hexChars must be in [2,8]")
  require(k >= 1 && hexChars * k <= 64, "bloom: k windows must fit in 64 hex chars")

  private val mBits = 1 << (4 * hexChars)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits >> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String].toString
      require(hex.length >= hexChars * k,
        s"bloom: child must be a sha2 hex string (got length ${hex.length})")
      var j = 0
      while (j < k) {
        var idx = 0
        var c = hexChars * j
        val end = c + hexChars
        while (c < end) {
          val d = Character.digit(hex.charAt(c), 16)
          require(d >= 0, s"bloom: non-hex char '${hex.charAt(c)}' in child value")
          idx = (idx << 4) | d
          c += 1
        }
        buf(idx >>> 6) |= 1L << (idx & 63)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box).asInstanceOf[Array[Any]])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_build"
}

/** Bradley–Terry preference strengths as a native Catalyst aggregate —
  * the bounded-kernel shape for an iterative fixed point over an
  * item-bounded model: each partition folds its (winner, loser) rows
  * into a ≤ items² win-count map (map-side combine — the corpus never
  * shuffles), partials merge by addition, and [[eval]] runs the Hunter
  * (2004) MM recursion `iterations` rounds in exact BigInt integer
  * arithmetic (floored divisions, mean-10⁶ renormalization per round —
  * bit-identical to the unrolled-SQL replay the p291 oracle runs).
  *
  * Compare the unrolled-DataFrame formulation this replaced: 12 rounds
  * × ~5 exchanges of pure stage overhead on a 5-item table cost 14 s;
  * the kernel is ONE exchange of ≤ items² counters. The `maxItems`
  * contract raises LOUDLY from update/merge the moment the counter map
  * exceeds maxItems² keys (memory bound) and from eval on the exact
  * distinct-item count — the items² working set is the declared
  * contract, not a hope. */
case class BradleyTerryAgg(
    winner: Expression,
    loser: Expression,
    iterations: Int,
    maxItems: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[(String, String), Long]] {
  require(iterations >= 1 && iterations <= 50,
    "bradley_terry: iterations must be in [1, 50]")
  require(maxItems >= 2 && maxItems <= 10000,
    "bradley_terry: maxItems must be in [2, 10000]")

  override def children: Seq[Expression] = Seq(winner, loser)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("wins", LongType, nullable = false),
    StructField("comparisons", LongType, nullable = false),
    StructField("strength_micro", LongType, nullable = false))),
    containsNull = false)

  private def boundCheck(buf: mutable.HashMap[(String, String), Long]): Unit =
    if (buf.size > maxItems.toLong * maxItems)
      throw new IllegalStateException(
        s"bradleyTerry: more than $maxItems items — raise maxItems only " +
          "with the items^2 working set in mind")

  override def createAggregationBuffer(): mutable.HashMap[(String, String), Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[(String, String), Long],
      input: InternalRow): mutable.HashMap[(String, String), Long] = {
    val w = winner.eval(input)
    val l = loser.eval(input)
    if (w != null && l != null) {
      val key = (w.asInstanceOf[UTF8String].toString,
        l.asInstanceOf[UTF8String].toString)
      if (key._1 != key._2) {
        buf.update(key, buf.getOrElse(key, 0L) + 1L)
        boundCheck(buf)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[(String, String), Long],
      other: mutable.HashMap[(String, String), Long])
      : mutable.HashMap[(String, String), Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    boundCheck(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[(String, String), Long]): Any = {
    if (buf.isEmpty) return new GenericArrayData(Array.empty[Any])
    val items = (buf.keysIterator.map(_._1) ++ buf.keysIterator.map(_._2))
      .toSeq.distinct.sorted
    if (items.size > maxItems)
      throw new IllegalStateException(
        s"bradleyTerry: more than $maxItems items (${items.size}) — raise " +
          "maxItems only with the items^2 working set in mind")
    def w(i: String, j: String): Long = buf.getOrElse((i, j), 0L)
    // symmetric neighbor sets off the observed keys only
    val nbrs: Map[String, Seq[String]] = {
      val m = mutable.HashMap.empty[String, mutable.TreeSet[String]]
      buf.keysIterator.foreach { case (i, j) =>
        m.getOrElseUpdate(i, mutable.TreeSet.empty) += j
        m.getOrElseUpdate(j, mutable.TreeSet.empty) += i
      }
      m.view.mapValues(_.toSeq).toMap
    }
    val bigW = items.map(i => i -> nbrs(i).map(j => w(i, j)).sum).toMap
    val ncmp = items.map(i => i -> nbrs(i).map(j => w(i, j) + w(j, i)).sum).toMap
    val scale = BigInt("1000000000000")
    val m = BigInt(items.size) * 1000000
    var pi = items.map(_ -> BigInt(1000000)).toMap
    var k = 0
    while (k < iterations) {
      val d = items.map { i =>
        i -> nbrs(i).map { j =>
          BigInt(w(i, j) + w(j, i)) * scale / (pi(i) + pi(j)).max(BigInt(1))
        }.sum
      }.toMap
      val praw = items.map { i =>
        i -> BigInt(bigW(i)) * scale / d(i).max(BigInt(1))
      }.toMap
      val s = praw.values.sum.max(BigInt(1))
      pi = items.map(i => i -> praw(i) * m / s).toMap
      k += 1
    }
    val rows = items
      .map(i => (i, bigW(i), ncmp(i), pi(i).toLong))
      .sortBy { case (i, _, _, p) => (-p, i) }
      .map { case (i, wn, nc, p) =>
        InternalRow(UTF8String.fromString(i), wn, nc, p)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(
      buf: mutable.HashMap[(String, String), Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case ((i, j), c) =>
      val ib = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val jb = j.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(ib.length); out.write(ib)
      out.writeInt(jb.length); out.write(jb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.HashMap[(String, String), Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[(String, String), Long]
    (1 to n).foreach { _ =>
      val ib = new Array[Byte](in.readInt()); in.readFully(ib)
      val jb = new Array[Byte](in.readInt()); in.readFully(jb)
      buf.update((new String(ib, java.nio.charset.StandardCharsets.UTF_8),
        new String(jb, java.nio.charset.StandardCharsets.UTF_8)), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BradleyTerryAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BradleyTerryAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(winner = newChildren(0), loser = newChildren(1))
  override def prettyName: String = "bradley_terry"
}
