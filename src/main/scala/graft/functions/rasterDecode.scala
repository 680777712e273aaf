package graft.functions

import java.util.zip.{DataFormatException, Inflater}

/** Pixel decoders for the perceptual-hash path ([[DHash64Expression]]):
  * compressed raster formats decoded just far enough to produce the
  * 9×8 luma sample grid dHash consumes. Public-spec constructions only:
  * PNG per RFC 2083 / the W3C PNG spec (zlib inflate +
  * the five scanline filter types), baseline JPEG per ITU T.81 (Huffman
  * entropy decode, DC coefficients only — the standard ⅛-scale
  * "DC thumbnail", no IDCT). Reference anchor: the reference pipeline
  * downloads image assets wholesale (reference `downloader.py` fetch
  * loop); decoding for near-dup keys is the 100 TB generalization.
  *
  * Contract shared with the triage expressions: HOSTILE BYTES ARE
  * DATA. Every malformed, truncated, lying-header or zip-bomb input
  * returns null — never an exception, never unbounded work. Work is
  * capped by `MaxPixels` (decode cost is linear in true pixel count;
  * a crafted header claiming more triages to null before any inflate).
  */
object PngLuma {

  /** Decode-work ceiling: images above this TRUE pixel count return
    * null rather than spend unbounded CPU/memory on one record. 16M
    * pixels covers every thumbnail-worthy crawl image (4096×4096); a
    * corpus wanting poster-size decode raises it at the call site. */
  val MaxPixels: Long = 1L << 24
  /** Scanline width ceiling — bounds the two row buffers. */
  val MaxWidth: Int = 1 << 20

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** 72 luma samples (8 rows × 9 cols, row-major, each 0..255) of the
    * dHash grid over the decoded image, or null when the payload is
    * not a decodable PNG under the caps. Supports bit depth 8 and 16
    * (high byte) for color types 0/2/4/6 and bit depth 1/2/4/8 for
    * type 0 (grayscale) and type 3 (palette); interlaced (Adam7)
    * images return null (a triage pass does not reorder subimages —
    * rare on crawls and cheap to revisit). */
  def sampleGrid(b: Array[Byte]): Array[Int] = {
    try sampleGridUnsafe(b)
    catch {
      // belt over suspenders: any slip in the bounds reasoning must
      // degrade to "not an image", never kill the task
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: DataFormatException => null
      case _: OutOfMemoryError => null
    }
  }

  private def sampleGridUnsafe(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 45) return null // sig + IHDR + IEND minimum
    if (!(u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a &&
        u8(b, 7) == 0x0a)) return null
    // IHDR must be the first chunk
    if (be32(b, 8) != 13 || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' ||
        b(15) != 'R') return null
    val w = be32(b, 16)
    val h = be32(b, 20)
    val depth = u8(b, 24)
    val colorType = u8(b, 25)
    val compression = u8(b, 26)
    val filterMethod = u8(b, 27)
    val interlace = u8(b, 28)
    if (w < 1 || h < 1 || w > MaxWidth || compression != 0 ||
        filterMethod != 0 || interlace != 0) return null
    if (w.toLong * h > MaxPixels) return null
    // channels per pixel by color type; palette is 1 index channel
    val channels = colorType match {
      case 0 => 1 case 2 => 3 case 3 => 1 case 4 => 2 case 6 => 4
      case _ => return null
    }
    val depthOk = colorType match {
      case 0 => depth == 1 || depth == 2 || depth == 4 || depth == 8 || depth == 16
      case 3 => depth == 1 || depth == 2 || depth == 4 || depth == 8
      case _ => depth == 8 || depth == 16
    }
    if (!depthOk) return null
    val bitsPerPixel = channels * depth
    val rowBytes = ((w.toLong * bitsPerPixel + 7) / 8).toInt
    // filter arithmetic works on byte units: ceil(bpp/8), min 1
    val bppBytes = math.max(1, bitsPerPixel / 8)

    // one pass over the chunk table: PLTE (palette) + IDAT spans
    var palette: Array[Int] = null // packed 0xRRGGBB
    val idatOff = new java.util.ArrayList[Int]()
    val idatLen = new java.util.ArrayList[Int]()
    var p = 8
    var sawEnd = false
    while (!sawEnd && p + 8 <= b.length) {
      val len = be32(b, p)
      if (len < 0 || len > b.length - p - 12) return null // hostile length
      val t0 = b(p + 4); val t1 = b(p + 5); val t2 = b(p + 6); val t3 = b(p + 7)
      if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
        idatOff.add(p + 8); idatLen.add(len)
      } else if (t0 == 'P' && t1 == 'L' && t2 == 'T' && t3 == 'E') {
        if (len % 3 != 0 || len > 768) return null
        palette = new Array[Int](len / 3)
        var k = 0
        while (k < palette.length) {
          palette(k) = (u8(b, p + 8 + k * 3) << 16) |
            (u8(b, p + 8 + k * 3 + 1) << 8) | u8(b, p + 8 + k * 3 + 2)
          k += 1
        }
      } else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
        sawEnd = true
      }
      p += 12 + len // len + type + payload + CRC (CRC not validated: triage)
    }
    if (idatOff.isEmpty) return null
    if (colorType == 3 && palette == null) return null

    // streaming inflate, two-row window: prev + cur scanlines
    val inflater = new Inflater()
    try {
      var chunkIdx = 0
      inflater.setInput(b, idatOff.get(0), idatLen.get(0))
      val prev = new Array[Byte](rowBytes)
      val cur = new Array[Byte](rowBytes)
      val rowWithFilter = new Array[Byte](rowBytes + 1)

      /** Fill `out` completely from the inflate stream; false = the
        * stream ended / went bad before `out` filled. */
      def fill(out: Array[Byte]): Boolean = {
        var got = 0
        while (got < out.length) {
          val n = inflater.inflate(out, got, out.length - got)
          if (n > 0) got += n
          else if (inflater.finished()) return false
          else if (inflater.needsInput()) {
            chunkIdx += 1
            if (chunkIdx >= idatOff.size()) return false
            inflater.setInput(b, idatOff.get(chunkIdx), idatLen.get(chunkIdx))
          } else if (inflater.needsDictionary()) return false
        }
        true
      }

      // the 8 sampled grid rows (may repeat when h < 8)
      val ys = Array.tabulate(8)(r => if (h == 1) 0 else ((h - 1).toLong * r / 7).toInt)
      val samples = new Array[Int](72)

      def paeth(a: Int, bb: Int, c: Int): Int = {
        val pp = a + bb - c
        val pa = math.abs(pp - a); val pb = math.abs(pp - bb); val pc = math.abs(pp - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
      }

      /** Luma of pixel x from the unfiltered scanline `row`. */
      def lumaAt(row: Array[Byte], x: Int): Int = {
        if (depth == 16) {
          // high byte of each 16-bit sample
          val base = x * channels * 2
          colorType match {
            case 0 => u8(row, base)
            case 4 => u8(row, base)
            case 2 | 6 =>
              (u8(row, base) * 299 + u8(row, base + 2) * 587 +
                u8(row, base + 4) * 114) / 1000
            case _ => 0
          }
        } else if (depth == 8) {
          val base = x * channels
          colorType match {
            case 0 | 4 => u8(row, base)
            case 2 | 6 =>
              (u8(row, base) * 299 + u8(row, base + 1) * 587 +
                u8(row, base + 2) * 114) / 1000
            case 3 =>
              val idx = u8(row, base)
              if (idx >= palette.length) 0
              else {
                val rgb = palette(idx)
                (((rgb >>> 16) & 0xff) * 299 + ((rgb >>> 8) & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000
              }
            case _ => 0
          }
        } else {
          // sub-byte gray / palette indices, big-endian bit packing
          val bitPos = x * depth
          val byteIdx = bitPos >>> 3
          val shift = 8 - depth - (bitPos & 7)
          val v = (u8(row, byteIdx) >>> shift) & ((1 << depth) - 1)
          if (colorType == 3) {
            if (v >= palette.length) 0
            else {
              val rgb = palette(v)
              (((rgb >>> 16) & 0xff) * 299 + ((rgb >>> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
            }
          } else v * 255 / ((1 << depth) - 1) // gray: scale to 0..255
        }
      }

      val xs = Array.tabulate(9)(c => if (w == 1) 0 else ((w - 1).toLong * c / 8).toInt)
      java.util.Arrays.fill(prev, 0.toByte)
      var y = 0
      while (y < h) {
        if (!fill(rowWithFilter)) return null
        val ft = rowWithFilter(0) & 0xff
        // unfilter into cur (spec filters 0-4)
        var i = 0
        ft match {
          case 0 =>
            System.arraycopy(rowWithFilter, 1, cur, 0, rowBytes)
          case 1 => // Sub
            while (i < rowBytes) {
              val left = if (i >= bppBytes) cur(i - bppBytes) & 0xff else 0
              cur(i) = ((rowWithFilter(i + 1) & 0xff) + left).toByte
              i += 1
            }
          case 2 => // Up
            while (i < rowBytes) {
              cur(i) = ((rowWithFilter(i + 1) & 0xff) + (prev(i) & 0xff)).toByte
              i += 1
            }
          case 3 => // Average
            while (i < rowBytes) {
              val left = if (i >= bppBytes) cur(i - bppBytes) & 0xff else 0
              cur(i) = ((rowWithFilter(i + 1) & 0xff) +
                ((left + (prev(i) & 0xff)) >> 1)).toByte
              i += 1
            }
          case 4 => // Paeth
            while (i < rowBytes) {
              val left = if (i >= bppBytes) cur(i - bppBytes) & 0xff else 0
              val ul = if (i >= bppBytes) prev(i - bppBytes) & 0xff else 0
              cur(i) = ((rowWithFilter(i + 1) & 0xff) +
                paeth(left, prev(i) & 0xff, ul)).toByte
              i += 1
            }
          case _ => return null // invalid filter type: not a PNG we trust
        }
        // harvest every grid row that lands on this y (ys can repeat)
        var r = 0
        while (r < 8) {
          if (ys(r) == y) {
            var c = 0
            while (c < 9) {
              samples(r * 9 + c) = lumaAt(cur, xs(c))
              c += 1
            }
          }
          r += 1
        }
        System.arraycopy(cur, 0, prev, 0, rowBytes)
        y += 1
      }
      samples
    } finally inflater.end()
  }
}

/** Baseline-JPEG DC-thumbnail sampler (ITU T.81, sequential DCT,
  * Huffman): decodes the entropy stream far enough to recover every
  * LUMA block's DC coefficient — the block's pixel mean — which is
  * exactly the ⅛-scale grayscale thumbnail dHash wants. No IDCT, no
  * AC dequantization (AC coefficients are Huffman-decoded only to
  * advance the bitstream; T.81 gives no way to skip them blind).
  *
  * Scope: SOF0/SOF1 (Huffman sequential) with 8-bit precision, one
  * interleaved scan covering all components, optional restart
  * markers. Progressive (SOF2), arithmetic coding (SOF9+), 12-bit
  * precision and multi-scan files return null — the triage contract,
  * not an error. Same hostile-bytes-are-data discipline as
  * [[PngLuma]]: every return path is null, work capped by
  * [[PngLuma.MaxPixels]]. */
object JpegDcLuma {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** Canonical Huffman table (T.81 F.2.2.3 DECODE procedure):
    * mincode/maxcode/valptr per code length 1..16. */
  private final class Huff(counts: Array[Int], val values: Array[Int]) {
    val minCode: Array[Int] = new Array[Int](17)
    val maxCode: Array[Int] = new Array[Int](17)
    val valPtr: Array[Int] = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Bit reader over the entropy-coded segment with T.81 byte
    * stuffing (FF 00 → literal FF) and restart-marker awareness. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bits = 0
    private var nBits = 0
    var hitMarker = false // FF xx (xx != 00) seen: stream over / RST

    /** Next bit, or -1 when the segment ends. */
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= b.length) return -1
        var v = u8(b, pos); pos += 1
        if (v == 0xff) {
          if (pos >= b.length) return -1
          val m = u8(b, pos)
          if (m == 0x00) { pos += 1 } // stuffed FF
          else { hitMarker = true; pos -= 1; return -1 }
          v = 0xff
        }
        bits = v; nBits = 8
      }
      nBits -= 1
      (bits >>> nBits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val t = bit()
        if (t < 0) return Int.MinValue
        v = (v << 1) | t
        i += 1
      }
      v
    }

    /** Byte-align and consume an RSTn marker; false when absent. */
    def restart(): Boolean = {
      nBits = 0
      hitMarker = false
      // scan to the marker (spec: it is immediately next, but be
      // permissive about a stray pad byte run of FFs)
      while (pos + 1 < b.length && u8(b, pos) == 0xff && u8(b, pos + 1) == 0xff)
        pos += 1
      if (pos + 1 >= b.length || u8(b, pos) != 0xff) return false
      val m = u8(b, pos + 1)
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }

    def decodeHuff(h: Huff): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val t = bit()
        if (t < 0) return -1
        code = (code << 1) | t
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l)) {
          val idx = h.valPtr(l) + code - h.minCode(l)
          if (idx < 0 || idx >= h.values.length) return -1
          return h.values(idx)
        }
        l += 1
      }
      -1
    }
  }

  /** T.81 F.2.2.1 EXTEND: map the received magnitude bits + category
    * to the signed coefficient difference. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0
    else if (v < (1 << (t - 1))) v - (1 << t) + 1
    else v

  /** 72 luma samples (8 rows × 9 cols) of the dHash grid over the
    * DC thumbnail, or null. */
  def sampleGrid(b: Array[Byte]): Array[Int] = {
    try sampleGridUnsafe(b)
    catch {
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: OutOfMemoryError => null
    }
  }

  private def sampleGridUnsafe(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 4) return null
    if (u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var p = 2
    val qtables = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var w = -1; var h = -1
    var nComp = 0
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compQ: Array[Int] = null; var compId: Array[Int] = null
    var restartInterval = 0

    // segment walk to SOS
    var sosAt = -1
    var scanDc: Array[Int] = null
    var scanAc: Array[Int] = null
    var scanCompOrder: Array[Int] = null
    while (sosAt < 0) {
      // find the next marker (skip fill FFs)
      if (p + 1 >= b.length) return null
      if (u8(b, p) != 0xff) return null
      while (p < b.length && u8(b, p) == 0xff) p += 1
      if (p >= b.length) return null
      val m = u8(b, p); p += 1
      if (m == 0xd9) return null // EOI before SOS
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        // standalone markers: no length
      } else {
        if (p + 2 > b.length) return null
        val len = be16(b, p)
        if (len < 2 || len > b.length - p) return null
        val seg = p + 2
        val segEnd = p + len
        m match {
          case 0xdb => // DQT
            var q = seg
            while (q < segEnd) {
              val pq = u8(b, q) >>> 4
              val tq = u8(b, q) & 15
              if (tq > 3 || pq > 1) return null
              val n = if (pq == 0) 64 else 128
              if (q + 1 + n > segEnd) return null
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tab(k) = if (pq == 0) u8(b, q + 1 + k) else be16(b, q + 1 + 2 * k)
                k += 1
              }
              qtables(tq) = tab
              q += 1 + n
            }
          case 0xc0 | 0xc1 => // SOF0 / SOF1 (Huffman sequential)
            if (seg + 6 > segEnd) return null
            if (u8(b, seg) != 8) return null // 8-bit precision only
            h = be16(b, seg + 1); w = be16(b, seg + 3)
            nComp = u8(b, seg + 5)
            if (w < 1 || h < 1 || nComp < 1 || nComp > 4) return null
            if (w.toLong * h > PngLuma.MaxPixels) return null
            if (seg + 6 + 3 * nComp > segEnd) return null
            compId = new Array[Int](nComp)
            compH = new Array[Int](nComp); compV = new Array[Int](nComp)
            compQ = new Array[Int](nComp)
            var k = 0
            while (k < nComp) {
              compId(k) = u8(b, seg + 6 + 3 * k)
              val hv = u8(b, seg + 7 + 3 * k)
              compH(k) = hv >>> 4; compV(k) = hv & 15
              if (compH(k) < 1 || compH(k) > 4 || compV(k) < 1 || compV(k) > 4)
                return null
              compQ(k) = u8(b, seg + 8 + 3 * k)
              if (compQ(k) > 3) return null
              k += 1
            }
          case 0xc2 => return null // progressive: out of scope
          case x if x >= 0xc3 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
            return null // other SOF flavors: out of scope
          case 0xc4 => // DHT
            var q = seg
            while (q < segEnd) {
              val tc = u8(b, q) >>> 4
              val th = u8(b, q) & 15
              if (tc > 1 || th > 3) return null
              if (q + 17 > segEnd) return null
              val counts = new Array[Int](16)
              var total = 0
              var k = 0
              while (k < 16) { counts(k) = u8(b, q + 1 + k); total += counts(k); k += 1 }
              if (total > 256 || q + 17 + total > segEnd) return null
              val values = new Array[Int](total)
              k = 0
              while (k < total) { values(k) = u8(b, q + 17 + k); k += 1 }
              val huff = new Huff(counts, values)
              if (tc == 0) dcTables(th) = huff else acTables(th) = huff
              q += 17 + total
            }
          case 0xdd => // DRI
            if (len != 4) return null
            restartInterval = be16(b, seg)
          case 0xda => // SOS
            if (compId == null) return null
            val ns = u8(b, seg)
            if (ns != nComp) return null // single interleaved scan only
            if (seg + 1 + 2 * ns + 3 > segEnd) return null
            scanDc = new Array[Int](nComp)
            scanAc = new Array[Int](nComp)
            scanCompOrder = new Array[Int](ns)
            var k = 0
            while (k < ns) {
              val cs = u8(b, seg + 1 + 2 * k)
              val ci = compId.indexOf(cs)
              if (ci < 0) return null
              scanCompOrder(k) = ci
              scanDc(ci) = u8(b, seg + 2 + 2 * k) >>> 4
              scanAc(ci) = u8(b, seg + 2 + 2 * k) & 15
              k += 1
            }
            sosAt = segEnd
          case _ => // APPn / COM / others: skip
        }
        p = segEnd
      }
    }

    // sampling geometry
    var hMax = 1; var vMax = 1
    var k = 0
    while (k < nComp) {
      if (compH(k) > hMax) hMax = compH(k)
      if (compV(k) > vMax) vMax = compV(k)
      k += 1
    }
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // luma = first SOF component (JFIF convention)
    val lumaBlocksX = mcusX * compH(0)
    val lumaBlocksY = mcusY * compV(0)
    if (lumaBlocksX.toLong * lumaBlocksY > PngLuma.MaxPixels) return null
    val q0 = qtables(compQ(0))
    if (q0 == null) return null
    val dcQ = q0(0)
    val dcPlane = new Array[Int](lumaBlocksX * lumaBlocksY)

    val reader = new BitReader(b, sosAt)
    val pred = new Array[Int](nComp)
    var mcu = 0
    val nMcus = mcusX.toLong * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!reader.restart()) return null
        java.util.Arrays.fill(pred, 0)
      }
      val mx = (mcu % mcusX).toInt
      val my = (mcu / mcusX).toInt
      var sk = 0
      while (sk < nComp) {
        val ci = scanCompOrder(sk)
        val dcT = dcTables(scanDc(ci))
        val acT = acTables(scanAc(ci))
        if (dcT == null || acT == null) return null
        var v = 0
        while (v < compV(ci)) {
          var hh = 0
          while (hh < compH(ci)) {
            // DC
            val t = reader.decodeHuff(dcT)
            if (t < 0 || t > 15) return null
            val diffBits = reader.receive(t)
            if (diffBits == Int.MinValue) return null
            pred(ci) += extend(diffBits, t)
            if (ci == 0) {
              val bx = mx * compH(0) + hh
              val by = my * compV(0) + v
              dcPlane(by * lumaBlocksX + bx) = pred(0)
            }
            // AC: decode to advance the stream, values discarded
            var kk = 1
            var eob = false
            while (kk < 64 && !eob) {
              val s = reader.decodeHuff(acT)
              if (s < 0) return null
              val r = s >>> 4
              val sz = s & 15
              if (sz == 0) {
                if (r == 15) kk += 16 // ZRL
                else eob = true // EOB
              } else {
                kk += r
                if (kk > 63) return null
                if (reader.receive(sz) == Int.MinValue) return null
                kk += 1
              }
            }
            hh += 1
          }
          v += 1
        }
        sk += 1
      }
      mcu += 1
    }

    // DC thumbnail: block mean = DC·q00/8 + 128 (T.81 DCT norm), the
    // shift floors like the fixture arithmetic; clamp to byte range
    val wT = (w * compH(0) + 8 * hMax - 1) / (8 * hMax) // luma blocks covering real pixels
    val hT = (h * compV(0) + 8 * vMax - 1) / (8 * vMax)
    val samples = new Array[Int](72)
    val ysT = Array.tabulate(8)(r => if (hT == 1) 0 else ((hT - 1).toLong * r / 7).toInt)
    val xsT = Array.tabulate(9)(c => if (wT == 1) 0 else ((wT - 1).toLong * c / 8).toInt)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        val dc = dcPlane(ysT(r) * lumaBlocksX + xsT(c))
        var lum = ((dc * dcQ) >> 3) + 128
        if (lum < 0) lum = 0
        if (lum > 255) lum = 255
        samples(r * 9 + c) = lum
        c += 1
      }
      r += 1
    }
    samples
  }
}

/** GIF luma sampler (GIF87a/89a, public spec): LZW-decodes the FIRST
  * image frame to palette indices, maps through the active color
  * table, and samples the same 9×8 dHash grid. Handles global and
  * local color tables, extension blocks (skipped by sub-block
  * grammar), interlaced frames (the 4-pass row order), and the
  * deferred-clear dictionary discipline real encoders use. Animated
  * GIFs hash their first frame — the standard thumbnail convention.
  * Same contract as [[PngLuma]]: hostile bytes are data (null, never
  * a throw), work capped by [[PngLuma.MaxPixels]]. */
object GifLuma {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  def sampleGrid(b: Array[Byte]): Array[Int] = {
    try sampleGridUnsafe(b)
    catch {
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: OutOfMemoryError => null
    }
  }

  private def sampleGridUnsafe(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 13) return null
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return null
    val packed = u8(b, 10)
    var p = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (p + 3 * n > b.length) return null
      gct = new Array[Int](n)
      var k = 0
      while (k < n) {
        gct(k) = (u8(b, p + 3 * k) * 299 + u8(b, p + 3 * k + 1) * 587 +
          u8(b, p + 3 * k + 2) * 114) / 1000
        k += 1
      }
      p += 3 * n
    }
    // block walk to the first image descriptor
    var w = -1; var h = -1; var interlaced = false
    var table: Array[Int] = null
    var dataAt = -1
    while (dataAt < 0) {
      if (p >= b.length) return null
      u8(b, p) match {
        case 0x21 => // extension: label + sub-blocks
          p += 2
          while (p < b.length && u8(b, p) != 0) p += 1 + u8(b, p)
          if (p >= b.length) return null
          p += 1 // terminator
        case 0x2c => // image descriptor
          if (p + 10 > b.length) return null
          w = le16(b, p + 5); h = le16(b, p + 7)
          val ip = u8(b, p + 9)
          interlaced = (ip & 0x40) != 0
          p += 10
          if ((ip & 0x80) != 0) { // local color table
            val n = 2 << (ip & 7)
            if (p + 3 * n > b.length) return null
            table = new Array[Int](n)
            var k = 0
            while (k < n) {
              table(k) = (u8(b, p + 3 * k) * 299 + u8(b, p + 3 * k + 1) * 587 +
                u8(b, p + 3 * k + 2) * 114) / 1000
              k += 1
            }
            p += 3 * n
          } else table = gct
          dataAt = p
        case 0x3b => return null // trailer before any image
        case _ => return null    // unknown block type: not a GIF we trust
      }
    }
    if (table == null || w < 1 || h < 1) return null
    if (w.toLong * h > PngLuma.MaxPixels) return null
    if (dataAt >= b.length) return null

    // LZW decode (GIF variant: variable 3..12-bit codes, clear/EOI)
    val minCode = u8(b, dataAt)
    if (minCode < 2 || minCode > 8) return null
    var q = dataAt + 1
    val nPix = w * h
    val pixels = new Array[Byte](nPix)
    var out = 0
    val clearCode = 1 << minCode
    val eoiCode = clearCode + 1
    // dictionary as prefix/suffix arrays (classic GIF LZW layout)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var dictSize = eoiCode + 1
    var codeBits = minCode + 1
    var prevCode = -1
    var acc = 0
    var nAcc = 0
    var subLeft = 0
    var done = false
    while (!done && out < nPix) {
      // refill bits from the sub-block stream
      while (nAcc < codeBits && !done) {
        if (subLeft == 0) {
          if (q >= b.length) return null
          subLeft = u8(b, q); q += 1
          if (subLeft == 0) { done = true }
        }
        if (!done) {
          if (q >= b.length) return null
          acc |= u8(b, q) << nAcc
          nAcc += 8; q += 1; subLeft -= 1
        }
      }
      if (nAcc < codeBits) return null // stream ended mid-code
      if (!done) {
        val code = acc & ((1 << codeBits) - 1)
        acc >>>= codeBits; nAcc -= codeBits
        if (code == clearCode) {
          dictSize = eoiCode + 1
          codeBits = minCode + 1
          prevCode = -1
        } else if (code == eoiCode) {
          done = true
        } else {
          if (code > dictSize || (code == dictSize && prevCode < 0)) return null
          // expand `code` (or the KwKwK case) onto the stack
          var sp = 0
          var cur = code
          if (code == dictSize) {
            // KwKwK: current code not yet defined — prev + first(prev)
            cur = prevCode
            stack(sp) = 0; sp += 1 // placeholder, patched after walk
          }
          while (cur >= clearCode + 2) {
            stack(sp) = suffix(cur); sp += 1
            cur = prefix(cur)
            if (sp > 4096) return null // corrupt chain loop
          }
          val first = cur.toByte
          stack(sp) = first; sp += 1
          if (code == dictSize) stack(0) = first // patch the KwKwK tail
          // define the new dictionary entry
          if (prevCode >= 0 && dictSize < 4096) {
            prefix(dictSize) = prevCode
            suffix(dictSize) = first
            dictSize += 1
            if (dictSize == (1 << codeBits) && codeBits < 12) codeBits += 1
          }
          prevCode = code
          // pop the stack into the pixel buffer
          while (sp > 0 && out < nPix) {
            sp -= 1
            pixels(out) = stack(sp)
            out += 1
          }
        }
      }
    }
    if (out < nPix) return null // truncated image data

    // row order: interlaced GIFs store rows in 4 passes
    // (starts 0/4/2/1, steps 8/8/4/2); inv maps display row -> stored row
    val rowOf: Int => Int =
      if (!interlaced) identity
      else {
        val order = new Array[Int](h)
        var idx = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
          var y = start
          while (y < h) { order(idx) = y; idx += 1; y += step }
        }
        val inv = new Array[Int](h)
        var i = 0
        while (i < h) { inv(order(i)) = i; i += 1 }
        (y: Int) => inv(y)
      }

    val samples = new Array[Int](72)
    var r = 0
    while (r < 8) {
      val y = if (h == 1) 0 else ((h - 1).toLong * r / 7).toInt
      val srcRow = rowOf(y)
      var c = 0
      while (c < 9) {
        val x = if (w == 1) 0 else ((w - 1).toLong * c / 8).toInt
        val idx = pixels(srcRow * w + x) & 0xff
        samples(r * 9 + c) = if (idx < table.length) table(idx) else 0
        c += 1
      }
      r += 1
    }
    samples
  }
}
