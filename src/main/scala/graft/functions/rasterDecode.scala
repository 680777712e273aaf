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
    * type 0 (grayscale) and type 3 (palette), BOTH interlace methods:
    * sequential and Adam7 (the 7 sub-image passes, each independently
    * filtered — decoded with the same two-row streaming window; the
    * grid positions each belong to exactly one pass, so interlaced
    * decode harvests them in pass order without buffering the
    * image). */
  def sampleGrid(b: Array[Byte]): Array[Int] = sampleGrid(b, 1)

  /** As [[sampleGrid]], but samples the grid in DISPLAY space under
    * the EXIF tag-274 `orientation` (PNG Third Edition's `eXIf` chunk
    * carries the same TIFF payload as a JPEG APP1) — the same
    * grid-level normalization as [[JpegDcLuma]]: orientations 5..8
    * swap the display axes, and each display cell maps back to its
    * stored pixel, so camera-rotated duplicates hash as their upright
    * selves. Values outside 1..8 sample as stored. */
  def sampleGrid(b: Array[Byte], orientation: Int): Array[Int] = {
    try sampleGridUnsafe(b, orientation)
    catch {
      // belt over suspenders: any slip in the bounds reasoning must
      // degrade to "not an image", never kill the task. OutOfMemoryError
      // is deliberately NOT caught: every allocation here is capped by
      // MaxPixels/MaxWidth, so an OOME means global executor pressure —
      // swallowing it would turn a decodable image into a
      // nondeterministic NULL hash (a silent wrong row) instead of a
      // loud task failure.
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: DataFormatException => null
    }
  }

  private def sampleGridUnsafe(b: Array[Byte], orientation: Int): Array[Int] = {
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
        filterMethod != 0 || interlace > 1) return null
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

    // streaming inflate, two-row window: prev + cur scanlines (the
    // window resets per Adam7 pass — each pass filters independently)
    val inflater = new Inflater()
    try {
      var chunkIdx = 0
      inflater.setInput(b, idatOff.get(0), idatLen.get(0))
      val prev = new Array[Byte](rowBytes)
      val cur = new Array[Byte](rowBytes)
      val rowWithFilter = new Array[Byte](rowBytes + 1)

      /** Fill `out(0 until len)` from the inflate stream; false = the
        * stream ended / went bad before `len` bytes arrived. */
      def fill(out: Array[Byte], len: Int): Boolean = {
        var got = 0
        while (got < len) {
          val n = inflater.inflate(out, got, len - got)
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

      // grid targets in DISPLAY space (orientations 5..8 swap the
      // axes), each mapped back to its STORED pixel by the inverse
      // tag-274 transform — identity when orientation is 1/absent
      val o = if (orientation >= 1 && orientation <= 8) orientation else 1
      val wD = if (o >= 5) h else w
      val hD = if (o >= 5) w else h

      // pass table: sequential = one full pass; Adam7 = the 7 spec
      // passes (xStart, xStep, yStart, yStep). The pass grids
      // PARTITION the plane, so each sampled pixel belongs to exactly
      // one (pass, rowInPass, colInPass) — precomputed here, harvested
      // as that pass row streams by.
      val passes: Array[(Int, Int, Int, Int)] =
        if (interlace == 0) Array((0, 1, 0, 1))
        else Array((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
          (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))
      val tgtPass = new Array[Int](72)
      val tgtRow = new Array[Int](72)
      val tgtCol = new Array[Int](72)
      var gi = 0
      while (gi < 72) {
        val yd = if (hD == 1) 0 else ((hD - 1).toLong * (gi / 9) / 7).toInt
        val xd = if (wD == 1) 0 else ((wD - 1).toLong * (gi % 9) / 8).toInt
        var gx = xd; var gy = yd
        o match {
          case 1 => ()
          case 2 => gx = w - 1 - xd
          case 3 => gx = w - 1 - xd; gy = h - 1 - yd
          case 4 => gy = h - 1 - yd
          case 5 => gx = yd; gy = xd
          case 6 => gx = yd; gy = h - 1 - xd
          case 7 => gx = w - 1 - yd; gy = h - 1 - xd
          case _ => gx = w - 1 - yd; gy = xd // 8
        }
        var pi = 0
        var found = -1
        while (pi < passes.length && found < 0) {
          val (x0, dx, y0, dy) = passes(pi)
          if (gx >= x0 && (gx - x0) % dx == 0 && gy >= y0 && (gy - y0) % dy == 0)
            found = pi
          pi += 1
        }
        if (found < 0) return null // cannot happen: the passes partition
        tgtPass(gi) = found
        tgtRow(gi) = (gy - passes(found)._3) / passes(found)._4
        tgtCol(gi) = (gx - passes(found)._1) / passes(found)._2
        gi += 1
      }

      var pass = 0
      while (pass < passes.length) {
        val (x0, dx, y0, dy) = passes(pass)
        val wP = if (w > x0) (w - x0 + dx - 1) / dx else 0
        val hP = if (h > y0) (h - y0 + dy - 1) / dy else 0
        if (wP > 0 && hP > 0) { // empty passes carry NO scanlines
          val rowBytesP = ((wP.toLong * bitsPerPixel + 7) / 8).toInt
          java.util.Arrays.fill(prev, 0, rowBytesP, 0.toByte)
          var y = 0
          while (y < hP) {
            if (!fill(rowWithFilter, rowBytesP + 1)) return null
            val ft = rowWithFilter(0) & 0xff
            // unfilter into cur (spec filters 0-4)
            var i = 0
            ft match {
              case 0 =>
                System.arraycopy(rowWithFilter, 1, cur, 0, rowBytesP)
              case 1 => // Sub
                while (i < rowBytesP) {
                  val left = if (i >= bppBytes) cur(i - bppBytes) & 0xff else 0
                  cur(i) = ((rowWithFilter(i + 1) & 0xff) + left).toByte
                  i += 1
                }
              case 2 => // Up
                while (i < rowBytesP) {
                  cur(i) = ((rowWithFilter(i + 1) & 0xff) + (prev(i) & 0xff)).toByte
                  i += 1
                }
              case 3 => // Average
                while (i < rowBytesP) {
                  val left = if (i >= bppBytes) cur(i - bppBytes) & 0xff else 0
                  cur(i) = ((rowWithFilter(i + 1) & 0xff) +
                    ((left + (prev(i) & 0xff)) >> 1)).toByte
                  i += 1
                }
              case 4 => // Paeth
                while (i < rowBytesP) {
                  val left = if (i >= bppBytes) cur(i - bppBytes) & 0xff else 0
                  val ul = if (i >= bppBytes) prev(i - bppBytes) & 0xff else 0
                  cur(i) = ((rowWithFilter(i + 1) & 0xff) +
                    paeth(left, prev(i) & 0xff, ul)).toByte
                  i += 1
                }
              case _ => return null // invalid filter type: not a PNG we trust
            }
            // harvest every grid cell living on this pass row
            gi = 0
            while (gi < 72) {
              if (tgtPass(gi) == pass && tgtRow(gi) == y)
                samples(gi) = lumaAt(cur, tgtCol(gi))
              gi += 1
            }
            System.arraycopy(cur, 0, prev, 0, rowBytesP)
            y += 1
          }
        }
        pass += 1
      }
      samples
    } finally inflater.end()
  }
}

/** JPEG DC-thumbnail sampler (ITU T.81, Huffman): decodes the entropy
  * stream far enough to recover every LUMA block's DC coefficient —
  * the block's pixel mean — which is exactly the ⅛-scale grayscale
  * thumbnail dHash wants. No IDCT, no AC dequantization.
  *
  * Scope: SOF0/SOF1 (sequential) AND SOF2 (progressive), 8-bit
  * precision, any scan structure — interleaved or not, luma-only or
  * multi-component, optional restart markers. The DC-only goal makes
  * progressive EASIER than baseline, not harder: in progressive the
  * DC coefficients live in their own scans (the first scan is DC-only
  * per T.81 G.1.1.1.1, refined one bit at a time by successive-
  * approximation scans), so the AC scans — the bulk of the file — are
  * SKIPPED bytewise without any Huffman work ([[skipEntropy]]); in
  * sequential files AC must be entropy-decoded to advance the stream,
  * but scans not covering luma (multi-scan sequential chroma scans)
  * skip bytewise too. Arithmetic coding (SOF9+), hierarchical, 12-bit
  * precision and DNL-deferred heights return null — the triage
  * contract, not an error. Same hostile-bytes-are-data discipline as
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
  def sampleGrid(b: Array[Byte]): Array[Int] = sampleGrid(b, 1)

  /** As [[sampleGrid]], but samples the grid in DISPLAY space: the
    * EXIF tag-274 `orientation` transform is applied by mapping each
    * display-grid position back to its stored-thumbnail cell — the
    * grid-level form of "rotate before hashing", zero pixel work. A
    * camera-rotated duplicate (orientations 3/6/8 are ubiquitous on
    * crawls) then hashes IDENTICALLY to its upright twin. Values
    * outside 1..8 mean "no/garbage tag" and sample as stored. */
  def sampleGrid(b: Array[Byte], orientation: Int): Array[Int] = {
    try sampleGridUnsafe(b, orientation)
    catch {
      // OOME not caught: allocations are MaxPixels-capped (see PngLuma)
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  /** Scan PAST an entropy-coded segment without decoding it: from
    * `from`, advance over stuffed FF00s, fill FFs and restart markers
    * to the next true marker. Returns the position of that marker's
    * FF, or -1 when the data ends first. This is what makes
    * progressive cheap here: AC scans (the bulk of the file) and
    * chroma-only scans cost a byte scan, zero Huffman work. */
  private def skipEntropy(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p + 1 < b.length) {
      if (u8(b, p) == 0xff) {
        val m = u8(b, p + 1)
        if (m == 0x00) p += 2 // stuffed FF: entropy data
        else if (m == 0xff) p += 1 // fill byte
        else if (m >= 0xd0 && m <= 0xd7) p += 2 // RST: still in-scan
        else return p
      } else p += 1
    }
    -1
  }

  /** After a decoded scan, resync to the next marker from wherever the
    * bit reader stopped (possibly mid-byte in entropy padding). */
  private def afterScan(b: Array[Byte], reader: BitReader): Int =
    skipEntropy(b, reader.pos)

  private def sampleGridUnsafe(b: Array[Byte], orientation: Int): Array[Int] = {
    if (b == null || b.length < 4) return null
    if (u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var p = 2
    val qtables = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var w = -1; var h = -1
    var nComp = 0
    var progressive = false
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compQ: Array[Int] = null; var compId: Array[Int] = null
    var restartInterval = 0
    var hMax = 1; var vMax = 1
    var mcusX = 0; var mcusY = 0
    var lumaBlocksX = 0; var lumaBlocksY = 0
    var dcPlane: Array[Int] = null // luma DC accumulators (refined in place)
    var lumaDcSeen = false
    var eoi = false

    // segment walk over the WHOLE file (progressive DC refinements can
    // follow AC scans in any order, so every scan must be visited)
    while (!eoi) {
      // find the next marker (skip fill FFs)
      if (p + 1 >= b.length) return null
      if (u8(b, p) != 0xff) return null
      while (p < b.length && u8(b, p) == 0xff) p += 1
      if (p >= b.length) return null
      val m = u8(b, p); p += 1
      if (m == 0xd9) eoi = true // EOI
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        // standalone markers: no length
      } else {
        if (p + 2 > b.length) return null
        val len = be16(b, p)
        if (len < 2 || len > b.length - p) return null
        val seg = p + 2
        val segEnd = p + len
        var nextP = segEnd
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
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 sequential, SOF2 progressive
            if (compId != null) return null // one frame per file
            progressive = m == 0xc2
            if (seg + 6 > segEnd) return null
            if (u8(b, seg) != 8) return null // 8-bit precision only
            h = be16(b, seg + 1); w = be16(b, seg + 3)
            nComp = u8(b, seg + 5)
            // h == 0 is the DNL-deferred-height form: out of scope
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
            // geometry once per frame; luma = first SOF component
            k = 0
            while (k < nComp) {
              if (compH(k) > hMax) hMax = compH(k)
              if (compV(k) > vMax) vMax = compV(k)
              k += 1
            }
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            lumaBlocksX = mcusX * compH(0)
            lumaBlocksY = mcusY * compV(0)
            if (lumaBlocksX.toLong * lumaBlocksY > PngLuma.MaxPixels) return null
            dcPlane = new Array[Int](lumaBlocksX * lumaBlocksY)
          case x if x >= 0xc3 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
            return null // lossless / arithmetic / hierarchical: out of scope
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
          case 0xda => // SOS: decode if it carries luma DC, else skip bytewise
            if (compId == null || dcPlane == null) return null
            val ns = u8(b, seg)
            if (ns < 1 || ns > nComp) return null
            if (seg + 1 + 2 * ns + 3 > segEnd) return null
            val scanComp = new Array[Int](ns)
            val scanDcT = new Array[Int](ns)
            val scanAcT = new Array[Int](ns)
            var k = 0
            var hasLuma = false
            while (k < ns) {
              val cs = u8(b, seg + 1 + 2 * k)
              val ci = compId.indexOf(cs)
              if (ci < 0) return null
              scanComp(k) = ci
              if (ci == 0) hasLuma = true
              scanDcT(k) = u8(b, seg + 2 + 2 * k) >>> 4
              scanAcT(k) = u8(b, seg + 2 + 2 * k) & 15
              k += 1
            }
            val ss = u8(b, seg + 1 + 2 * ns)
            val se = u8(b, seg + 2 + 2 * ns)
            val ahal = u8(b, seg + 3 + 2 * ns)
            val ah = ahal >>> 4
            val al = ahal & 15
            if (progressive) {
              if (ss == 0 && se != 0) return null // DC scans are DC-only (G.1.1.1.1)
              if (ss == 0 && hasLuma) {
                if (al > 13) return null // DC magnitude is 11 bits + shift headroom
                nextP =
                  if (ah == 0)
                    dcFirstScan(b, segEnd, ns, scanComp, scanDcT, dcTables,
                      compH, compV, mcusX, mcusY, lumaBlocksX, w, h,
                      hMax, vMax, restartInterval, al, dcPlane)
                  else {
                    if (ah != al + 1) return null // refinement steps one bit
                    dcRefineScan(b, segEnd, ns, scanComp, compH, compV,
                      mcusX, mcusY, lumaBlocksX, w, h, hMax, vMax,
                      restartInterval, al, dcPlane)
                  }
                if (nextP < 0) return null
                if (ah == 0) lumaDcSeen = true
              } else {
                // AC scan, or a chroma-only DC scan: skip bytewise
                nextP = skipEntropy(b, segEnd)
                if (nextP < 0) return null
              }
            } else {
              if (hasLuma) {
                nextP = sequentialScan(b, segEnd, ns, scanComp, scanDcT,
                  scanAcT, dcTables, acTables, compH, compV, mcusX, mcusY,
                  lumaBlocksX, w, h, hMax, vMax, restartInterval, dcPlane)
                if (nextP < 0) return null
                lumaDcSeen = true
              } else {
                // multi-scan sequential chroma scan: skip bytewise
                nextP = skipEntropy(b, segEnd)
                if (nextP < 0) return null
              }
            }
          case _ => // APPn / COM / DNL / others: skip
        }
        p = nextP
      }
    }
    if (!lumaDcSeen || dcPlane == null) return null
    val q0 = qtables(compQ(0))
    if (q0 == null) return null
    val dcQ = q0(0)

    // DC thumbnail: block mean = DC·q00/8 + 128 (T.81 DCT norm), the
    // shift floors like the fixture arithmetic; clamp to byte range.
    // The grid is sampled in DISPLAY space: orientations 5..8 swap the
    // displayed axes, and each display cell maps back to its stored
    // cell by the inverse of the EXIF tag-274 transform.
    val wT = (w * compH(0) + 8 * hMax - 1) / (8 * hMax) // luma blocks covering real pixels
    val hT = (h * compV(0) + 8 * vMax - 1) / (8 * vMax)
    val o = if (orientation >= 1 && orientation <= 8) orientation else 1
    val wD = if (o >= 5) hT else wT
    val hD = if (o >= 5) wT else hT
    val samples = new Array[Int](72)
    var r = 0
    while (r < 8) {
      val yd = if (hD == 1) 0 else ((hD - 1).toLong * r / 7).toInt
      var c = 0
      while (c < 9) {
        val xd = if (wD == 1) 0 else ((wD - 1).toLong * c / 8).toInt
        // stored cell showing at display (xd, yd) — TIFF 6.0 tag 274:
        // 1 normal, 2 flip-H, 3 rot180, 4 flip-V, 5 transpose,
        // 6 rot90CW, 7 transverse, 8 rot270CW (stored -> display)
        var x = xd; var y = yd
        o match {
          case 1 => ()
          case 2 => x = wT - 1 - xd
          case 3 => x = wT - 1 - xd; y = hT - 1 - yd
          case 4 => y = hT - 1 - yd
          case 5 => x = yd; y = xd
          case 6 => x = yd; y = hT - 1 - xd
          case 7 => x = wT - 1 - yd; y = hT - 1 - xd
          case _ => x = wT - 1 - yd; y = xd // 8
        }
        val dc = dcPlane(y * lumaBlocksX + x)
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

  /** DC FIRST scan (sequential-free DC pass, T.81 G.2): Huffman DC
    * diffs, point-transformed left by `al`. Decodes EVERY component in
    * the scan (their bits interleave), stores only luma. Returns the
    * next marker position, or -1 on malformed data. */
  private def dcFirstScan(
      b: Array[Byte], from: Int, ns: Int,
      scanComp: Array[Int], scanDcT: Array[Int], dcTables: Array[Huff],
      compH: Array[Int], compV: Array[Int], mcusX: Int, mcusY: Int,
      lumaBlocksX: Int, w: Int, h: Int, hMax: Int, vMax: Int,
      restartInterval: Int, al: Int, dcPlane: Array[Int]): Int = {
    val reader = new BitReader(b, from)
    val pred = new Array[Int](ns)
    if (ns == 1) {
      // non-interleaved: the unit is ONE block over the component's
      // own block grid (T.81 A.2.2), restart interval counts blocks
      val ci = scanComp(0)
      val dcT = dcTables(scanDcT(0))
      if (dcT == null) return -1
      val cw = (w * compH(ci) + hMax - 1) / hMax
      val ch = (h * compV(ci) + vMax - 1) / vMax
      val bw = (cw + 7) / 8
      val n = bw.toLong * ((ch + 7) / 8)
      var i = 0L
      while (i < n) {
        if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
          if (!reader.restart()) return -1
          pred(0) = 0
        }
        val t = reader.decodeHuff(dcT)
        if (t < 0 || t > 15) return -1
        val diffBits = reader.receive(t)
        if (diffBits == Int.MinValue) return -1
        pred(0) += extend(diffBits, t)
        if (ci == 0)
          dcPlane((i / bw).toInt * lumaBlocksX + (i % bw).toInt) = pred(0) << al
        i += 1
      }
    } else {
      var mcu = 0L
      val nMcus = mcusX.toLong * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!reader.restart()) return -1
          java.util.Arrays.fill(pred, 0)
        }
        val mx = (mcu % mcusX).toInt
        val my = (mcu / mcusX).toInt
        var sk = 0
        while (sk < ns) {
          val ci = scanComp(sk)
          val dcT = dcTables(scanDcT(sk))
          if (dcT == null) return -1
          var v = 0
          while (v < compV(ci)) {
            var hh = 0
            while (hh < compH(ci)) {
              val t = reader.decodeHuff(dcT)
              if (t < 0 || t > 15) return -1
              val diffBits = reader.receive(t)
              if (diffBits == Int.MinValue) return -1
              pred(sk) += extend(diffBits, t)
              if (ci == 0)
                dcPlane((my * compV(0) + v) * lumaBlocksX +
                  mx * compH(0) + hh) = pred(sk) << al
              hh += 1
            }
            v += 1
          }
          sk += 1
        }
        mcu += 1
      }
    }
    afterScan(b, reader)
  }

  /** DC REFINEMENT scan (successive approximation, T.81 G.1.2.1): one
    * raw bit per block per scan component — sets bit `al` of the
    * coefficient. Works in two's complement: the stored value is a
    * multiple of 2^(al+1), so OR-ing the bit in is exact for negative
    * coefficients too. */
  private def dcRefineScan(
      b: Array[Byte], from: Int, ns: Int, scanComp: Array[Int],
      compH: Array[Int], compV: Array[Int], mcusX: Int, mcusY: Int,
      lumaBlocksX: Int, w: Int, h: Int, hMax: Int, vMax: Int,
      restartInterval: Int, al: Int, dcPlane: Array[Int]): Int = {
    val reader = new BitReader(b, from)
    if (ns == 1) {
      val ci = scanComp(0)
      val cw = (w * compH(ci) + hMax - 1) / hMax
      val ch = (h * compV(ci) + vMax - 1) / vMax
      val bw = (cw + 7) / 8
      val n = bw.toLong * ((ch + 7) / 8)
      var i = 0L
      while (i < n) {
        if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
          if (!reader.restart()) return -1
        }
        val bit = reader.bit()
        if (bit < 0) return -1
        if (ci == 0 && bit == 1)
          dcPlane((i / bw).toInt * lumaBlocksX + (i % bw).toInt) |= 1 << al
        i += 1
      }
    } else {
      var mcu = 0L
      val nMcus = mcusX.toLong * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!reader.restart()) return -1
        }
        val mx = (mcu % mcusX).toInt
        val my = (mcu / mcusX).toInt
        var sk = 0
        while (sk < ns) {
          val ci = scanComp(sk)
          var v = 0
          while (v < compV(ci)) {
            var hh = 0
            while (hh < compH(ci)) {
              val bit = reader.bit()
              if (bit < 0) return -1
              if (ci == 0 && bit == 1)
                dcPlane((my * compV(0) + v) * lumaBlocksX +
                  mx * compH(0) + hh) |= 1 << al
              hh += 1
            }
            v += 1
          }
          sk += 1
        }
        mcu += 1
      }
    }
    afterScan(b, reader)
  }

  /** SEQUENTIAL scan carrying luma: full DC + AC entropy decode (AC
    * values discarded — T.81 gives no way to skip them blind inside
    * one scan). Handles interleaved (ns > 1) and single-component
    * scans, so multi-scan sequential files decode too. */
  private def sequentialScan(
      b: Array[Byte], from: Int, ns: Int,
      scanComp: Array[Int], scanDcT: Array[Int], scanAcT: Array[Int],
      dcTables: Array[Huff], acTables: Array[Huff],
      compH: Array[Int], compV: Array[Int], mcusX: Int, mcusY: Int,
      lumaBlocksX: Int, w: Int, h: Int, hMax: Int, vMax: Int,
      restartInterval: Int, dcPlane: Array[Int]): Int = {
    val reader = new BitReader(b, from)
    val pred = new Array[Int](ns)

    /** One block of component slot `sk`: DC into dcPlane (luma), AC
      * walked and discarded. False on malformed data. */
    def block(sk: Int, bx: Int, by: Int): Boolean = {
      val ci = scanComp(sk)
      val dcT = dcTables(scanDcT(sk))
      val acT = acTables(scanAcT(sk))
      if (dcT == null || acT == null) return false
      val t = reader.decodeHuff(dcT)
      if (t < 0 || t > 15) return false
      val diffBits = reader.receive(t)
      if (diffBits == Int.MinValue) return false
      pred(sk) += extend(diffBits, t)
      if (ci == 0) dcPlane(by * lumaBlocksX + bx) = pred(sk)
      var kk = 1
      var eob = false
      while (kk < 64 && !eob) {
        val s = reader.decodeHuff(acT)
        if (s < 0) return false
        val r = s >>> 4
        val sz = s & 15
        if (sz == 0) {
          if (r == 15) kk += 16 // ZRL
          else eob = true // EOB
        } else {
          kk += r
          if (kk > 63) return false
          if (reader.receive(sz) == Int.MinValue) return false
          kk += 1
        }
      }
      true
    }

    if (ns == 1) {
      val ci = scanComp(0)
      val cw = (w * compH(ci) + hMax - 1) / hMax
      val ch = (h * compV(ci) + vMax - 1) / vMax
      val bw = (cw + 7) / 8
      val n = bw.toLong * ((ch + 7) / 8)
      var i = 0L
      while (i < n) {
        if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
          if (!reader.restart()) return -1
          pred(0) = 0
        }
        if (!block(0, (i % bw).toInt, (i / bw).toInt)) return -1
        i += 1
      }
    } else {
      var mcu = 0L
      val nMcus = mcusX.toLong * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!reader.restart()) return -1
          java.util.Arrays.fill(pred, 0)
        }
        val mx = (mcu % mcusX).toInt
        val my = (mcu / mcusX).toInt
        var sk = 0
        while (sk < ns) {
          val ci = scanComp(sk)
          var v = 0
          while (v < compV(ci)) {
            var hh = 0
            while (hh < compH(ci)) {
              if (!block(sk, mx * compH(ci) + hh, my * compV(ci) + v)) return -1
              hh += 1
            }
            v += 1
          }
          sk += 1
        }
        mcu += 1
      }
    }
    afterScan(b, reader)
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
      // OOME not caught: allocations are MaxPixels-capped (see PngLuma)
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
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

    val nPix = w * h
    val pixels = new Array[Byte](nPix)
    if (GifLzw.decode(b, dataAt, nPix, pixels) < 0) return null

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

/** GIF LZW stream decoder, shared by [[GifLuma]] (first frame) and
  * [[GifFrames]] (animation walk — that caller needs the end offset
  * to continue to the next block). GIF flavor per GIF89a appendix F:
  * variable 3..12-bit codes LSB-first across 255-byte data sub-blocks,
  * CLEAR/EOI, KwKwK, deferred-clear dictionary growth. */
private[functions] object GifLzw {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** Decode one image's LZW data (starting at the min-code-size byte
    * `dataAt`) into exactly `nPix` pixel indices, then consume any
    * remaining data sub-blocks through the 0 terminator. Returns the
    * offset just past the terminator, or -1 for corrupt/truncated
    * streams. */
  def decode(b: Array[Byte], dataAt: Int, nPix: Int, pixels: Array[Byte]): Int = {
    if (dataAt >= b.length) return -1
    val minCode = u8(b, dataAt)
    if (minCode < 2 || minCode > 8) return -1
    var q = dataAt + 1
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
    var termSeen = false
    while (!done && out < nPix) {
      // refill bits from the sub-block stream
      while (nAcc < codeBits && !done) {
        if (subLeft == 0) {
          if (q >= b.length) return -1
          subLeft = u8(b, q); q += 1
          if (subLeft == 0) { done = true; termSeen = true }
        }
        if (!done) {
          if (q >= b.length) return -1
          acc |= u8(b, q) << nAcc
          nAcc += 8; q += 1; subLeft -= 1
        }
      }
      if (nAcc < codeBits) return -1 // stream ended mid-code
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
          if (code > dictSize || (code == dictSize && prevCode < 0)) return -1
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
            if (sp > 4096) return -1 // corrupt chain loop
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
    if (out < nPix) return -1 // truncated image data
    // consume to the data terminator (the decoder may stop mid-block
    // once the pixel buffer fills, or on an EOI with blocks after it)
    if (!termSeen) {
      q += subLeft
      while (q < b.length && u8(b, q) != 0) q += 1 + u8(b, q)
      if (q >= b.length) return -1
      q += 1
    }
    q
  }
}

/** Animated-GIF frame decoder: the video-kind rung of the multimodal
  * pipeline. Walks every image block, LZW-decodes it, and COMPOSITES
  * it onto the logical-screen canvas at its (left, top) rect —
  * honoring the Graphic Control Extension's transparency index (the
  * mechanism real animations use for partial-frame updates), frame-
  * local color tables, and per-frame interlacing — then samples the
  * canvas into the same 9×8 luma grid every raster decoder feeds, one
  * grid PER FRAME. Disposal methods are treated as draw-over (method
  * 1, the common case); restore-to-background/previous animations
  * composite approximately — a documented simplification, not a crash
  * path. Frame count is capped (`MaxFrames`) so a hostile million-
  * frame file cannot make one record expensive; canvas and per-frame
  * rects are `MaxPixels`-capped from the HEADER before any LZW work.
  * Junk, truncated, or non-GIF bytes → null, never a throw. */
object GifFrames {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  val MaxFrames = 32

  def frameGrids(b: Array[Byte]): Array[Array[Int]] = frameGrids(b, MaxFrames)

  def frameGrids(b: Array[Byte], maxFrames: Int): Array[Array[Int]] = {
    try frameGridsUnsafe(b, maxFrames)
    catch {
      // OOME not caught: allocations are MaxPixels-capped (see PngLuma)
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  private def lumaTable(b: Array[Byte], p: Int, n: Int): Array[Int] = {
    val t = new Array[Int](n)
    var k = 0
    while (k < n) {
      t(k) = (u8(b, p + 3 * k) * 299 + u8(b, p + 3 * k + 1) * 587 +
        u8(b, p + 3 * k + 2) * 114) / 1000
      k += 1
    }
    t
  }

  private def frameGridsUnsafe(b: Array[Byte], maxFrames: Int): Array[Array[Int]] = {
    if (b == null || b.length < 13 || maxFrames < 1) return null
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return null
    val cw = le16(b, 6)
    val ch = le16(b, 8)
    if (cw < 1 || ch < 1) return null
    if (cw.toLong * ch > PngLuma.MaxPixels) return null
    val packed = u8(b, 10)
    var p = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (p + 3 * n > b.length) return null
      gct = lumaTable(b, p, n)
      p += 3 * n
    }
    val canvas = new Array[Int](cw * ch)
    // pre-frame canvas: the background color's luma when a GCT names
    // one (renderers vary here; the first frame almost always covers
    // the canvas, making this visible only to pathological files)
    if (gct != null) {
      val bg = u8(b, 11)
      if (bg < gct.length && gct(bg) != 0)
        java.util.Arrays.fill(canvas, gct(bg))
    }
    val grids = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    var transIdx = -1 // from the GCE, applies to the NEXT image only
    var eof = false
    while (!eof && grids.length < maxFrames) {
      if (p >= b.length) return null // missing trailer
      u8(b, p) match {
        case 0x3b => eof = true
        case 0x21 => // extension: label + sub-blocks
          if (p + 2 > b.length) return null
          val label = u8(b, p + 1)
          if (label == 0xf9 && p + 7 <= b.length && u8(b, p + 2) == 4) {
            // GCE: size(4), packed, delay lo/hi, transparent index
            val flags = u8(b, p + 3)
            transIdx = if ((flags & 1) != 0) u8(b, p + 6) else -1
          }
          p += 2
          while (p < b.length && u8(b, p) != 0) p += 1 + u8(b, p)
          if (p >= b.length) return null
          p += 1 // terminator
        case 0x2c => // image descriptor
          if (p + 10 > b.length) return null
          val fx = le16(b, p + 1); val fy = le16(b, p + 3)
          val fw = le16(b, p + 5); val fh = le16(b, p + 7)
          val ip = u8(b, p + 9)
          val interlaced = (ip & 0x40) != 0
          p += 10
          var table = gct
          if ((ip & 0x80) != 0) { // local color table
            val n = 2 << (ip & 7)
            if (p + 3 * n > b.length) return null
            table = lumaTable(b, p, n)
            p += 3 * n
          }
          if (table == null) return null
          if (fw < 1 || fh < 1) return null
          if (fx.toLong + fw > cw || fy.toLong + fh > ch) return null
          if (fw.toLong * fh > PngLuma.MaxPixels) return null
          val nPix = fw * fh
          val pixels = new Array[Byte](nPix)
          val after = GifLzw.decode(b, p, nPix, pixels)
          if (after < 0) return null
          p = after
          // display row -> stored row, per-frame interlace
          val rowOf: Int => Int =
            if (!interlaced) identity
            else {
              val order = new Array[Int](fh)
              var idx = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                var y = start
                while (y < fh) { order(idx) = y; idx += 1; y += step }
              }
              val inv = new Array[Int](fh)
              var i = 0
              while (i < fh) { inv(order(i)) = i; i += 1 }
              (y: Int) => inv(y)
            }
          // composite the rect over the canvas, transparency-aware
          var y = 0
          while (y < fh) {
            val src = rowOf(y)
            var x = 0
            while (x < fw) {
              val idx = pixels(src * fw + x) & 0xff
              if (idx != transIdx)
                canvas((fy + y) * cw + fx + x) =
                  if (idx < table.length) table(idx) else 0
              x += 1
            }
            y += 1
          }
          transIdx = -1
          // sample the composited canvas into this frame's grid
          val g = new Array[Int](72)
          var r = 0
          while (r < 8) {
            val yy = if (ch == 1) 0 else ((ch - 1).toLong * r / 7).toInt
            var c = 0
            while (c < 9) {
              val xx = if (cw == 1) 0 else ((cw - 1).toLong * c / 8).toInt
              g(r * 9 + c) = canvas(yy * cw + xx)
              c += 1
            }
            r += 1
          }
          grids += g
        case _ => return null // unknown block type: not a GIF we trust
      }
    }
    if (grids.isEmpty) null else grids.toArray
  }
}

/** TIFF raster decoder for the perceptual-hash path: baseline
  * uncompressed TIFF per the TIFF 6.0 specification — II/MM byte
  * orders, IFD0 tag walk (the same bounded discipline as
  * [[ExifMetaExpression]], which reads the SAME container for its
  * governance triage), 8-bit grayscale (PhotometricInterpretation
  * 0/1), chunky RGB (2, extra samples tolerated as alpha), and
  * palette-color (3, ColorMap tag 320), assembled across multiple
  * strips (RowsPerStrip/StripOffsets/StripByteCounts).
  *
  * Uncompressed TIFF is RANDOM ACCESS — the decoder never
  * materializes the image: each of the 72 grid samples is one direct
  * strip read (strip = y / rowsPerStrip, row-in-strip arithmetic), so
  * per-record work is O(72) regardless of image size. Strip extents
  * are validated against StripByteCounts before any read; compressed,
  * tiled, planar, or non-8-bit files and hostile bytes → null, never
  * a throw. */
object TiffLuma {

  def sampleGrid(b: Array[Byte]): Array[Int] = sampleGrid(b, 1)

  /** As [[sampleGrid]], but samples in DISPLAY space under EXIF
    * tag-274 `orientation` — TIFF carries the tag natively in the
    * same IFD0 the pixel tags live in. Values outside 1..8 sample as
    * stored. */
  def sampleGrid(b: Array[Byte], orientation: Int): Array[Int] = {
    try sampleGridUnsafe(b, orientation)
    catch {
      // OOME not caught: allocations are tag-count-bounded (see PngLuma)
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  private def sampleGridUnsafe(b: Array[Byte], orientation: Int): Array[Int] = {
    if (b == null || b.length < 8) return null
    val le =
      if (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) true
      else if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42) false
      else return null
    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) (u16(i) | (u16(i + 2).toLong << 16)) & 0xffffffffL
      else ((u16(i).toLong << 16) | u16(i + 2)) & 0xffffffffL
    val ifd0 = u32(4)
    if (ifd0 < 8 || ifd0 + 2 > b.length) return null
    val ifd = ifd0.toInt
    val n = u16(ifd)
    if (n < 1 || n > 512) return null
    if (ifd + 2 + n * 12 > b.length) return null

    // TIFF value fields: inline when total size <= 4, else an offset;
    // SHORT(3)/LONG(4)/BYTE(1) scalars and SHORT/LONG arrays suffice
    // for the baseline tag set
    def scalar(e: Int, typ: Int): Long = typ match {
      case 1 => u8(e + 8)
      case 3 => u16(e + 8)
      case 4 => u32(e + 8)
      case _ => -1L
    }
    def arrBase(e: Int, typ: Int, cnt: Long): Int = {
      val unit = if (typ == 3) 2 else if (typ == 4) 4 else return -1
      if (unit * cnt <= 4) e + 8
      else {
        val off = u32(e + 8)
        if (off < 8 || off + unit * cnt > b.length) -1 else off.toInt
      }
    }
    def arrVal(base: Int, typ: Int, idx: Int): Long =
      if (typ == 3) u16(base + idx * 2) else u32(base + idx * 4)

    var w = -1L; var h = -1L
    var comp = 1L; var photo = -1L; var spp = 1L
    var rowsPerStrip = 0xffffffffL // spec default: all rows, one strip
    var planar = 1L
    var bitsOk = true
    var soType = 0; var soCnt = 0; var soBase = -1
    var scType = 0; var scCnt = 0; var scBase = -1
    var cmBase = -1; var cmCnt = 0L
    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12
      val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
      tag match {
        case 256 => w = scalar(e, typ)
        case 257 => h = scalar(e, typ)
        case 258 =>
          if (cnt == 1) bitsOk = scalar(e, typ) == 8
          else {
            val base = arrBase(e, typ, cnt)
            if (base < 0 || typ != 3) return null
            var k = 0
            while (k < cnt) {
              if (u16(base + k * 2) != 8) bitsOk = false
              k += 1
            }
          }
        case 259 => comp = scalar(e, typ)
        case 262 => photo = scalar(e, typ)
        case 273 =>
          soType = typ; soCnt = cnt.toInt; soBase = arrBase(e, typ, cnt)
        case 277 => spp = scalar(e, typ)
        case 278 => rowsPerStrip = scalar(e, typ)
        case 279 =>
          scType = typ; scCnt = cnt.toInt; scBase = arrBase(e, typ, cnt)
        case 284 => planar = scalar(e, typ)
        case 320 =>
          cmCnt = cnt
          cmBase = arrBase(e, typ, cnt)
          if (typ != 3) return null
        case _ => ()
      }
      i += 1
    }
    if (comp != 1 || planar != 1 || !bitsOk) return null
    if (w < 1 || h < 1 || w > PngLuma.MaxWidth || w * h > PngLuma.MaxPixels)
      return null
    val channels = photo match {
      case 0 | 1 => if (spp != 1) return null else 1
      case 2 => if (spp < 3) return null else spp.toInt // extras = alpha
      case 3 =>
        if (spp != 1) return null
        if (cmBase < 0 || cmCnt != 3 * 256) return null
        1
      case _ => return null
    }
    if (soBase < 0 || soCnt < 1) return null
    val rps = math.min(rowsPerStrip, h)
    if (rps < 1) return null
    val nStrips = ((h + rps - 1) / rps).toInt
    if (soCnt < nStrips) return null
    if (scBase >= 0 && scCnt < nStrips) return null
    val rowBytes = w * channels
    // validate every strip's extent BEFORE any pixel read: the strip
    // must hold its rows and sit inside the buffer
    val stripOff = new Array[Long](nStrips)
    var s = 0
    while (s < nStrips) {
      val off = arrVal(soBase, soType, s)
      val rowsIn = math.min(rps, h - s * rps)
      val need = rowsIn * rowBytes
      val have =
        if (scBase >= 0) arrVal(scBase, scType, s)
        else b.length - off // no byte counts: bound by the buffer
      if (off < 8 || need > have || off + need > b.length) return null
      stripOff(s) = off
      s += 1
    }

    def lumaAt(gx: Int, gy: Int): Int = {
      val strip = (gy / rps).toInt
      val off = (stripOff(strip) + (gy - strip * rps) * rowBytes +
        gx.toLong * channels).toInt
      photo match {
        case 0 => 255 - u8(off) // WhiteIsZero
        case 1 => u8(off)
        case 2 =>
          (u8(off) * 299 + u8(off + 1) * 587 + u8(off + 2) * 114) / 1000
        case _ => // palette: ColorMap is all reds, all greens, all blues
          val idx = u8(off)
          val r = u16(cmBase + idx * 2) >> 8
          val g = u16(cmBase + 512 + idx * 2) >> 8
          val bb = u16(cmBase + 1024 + idx * 2) >> 8
          (r * 299 + g * 587 + bb * 114) / 1000
      }
    }

    // grid targets in DISPLAY space, mapped back to stored pixels by
    // the inverse tag-274 transform (identity when orientation 1/absent)
    val o = if (orientation >= 1 && orientation <= 8) orientation else 1
    val wi = w.toInt; val hi = h.toInt
    val wD = if (o >= 5) hi else wi
    val hD = if (o >= 5) wi else hi
    val samples = new Array[Int](72)
    var gi = 0
    while (gi < 72) {
      val yd = if (hD == 1) 0 else ((hD - 1).toLong * (gi / 9) / 7).toInt
      val xd = if (wD == 1) 0 else ((wD - 1).toLong * (gi % 9) / 8).toInt
      var gx = xd; var gy = yd
      o match {
        case 1 => ()
        case 2 => gx = wi - 1 - xd
        case 3 => gx = wi - 1 - xd; gy = hi - 1 - yd
        case 4 => gy = hi - 1 - yd
        case 5 => gx = yd; gy = xd
        case 6 => gx = yd; gy = hi - 1 - xd
        case 7 => gx = wi - 1 - yd; gy = hi - 1 - xd
        case _ => gx = wi - 1 - yd; gy = xd // 8
      }
      samples(gi) = lumaAt(gx, gy)
      gi += 1
    }
    samples
  }
}
