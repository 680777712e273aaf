package graft.functions

/** WebP VP8L (lossless) luma sampler — the modern-crawl format the
  * raster family was missing: decodes a VP8L bitstream (RFC 9649 /
  * the public WebP Lossless Bitstream Specification) to ARGB and
  * samples the same 9×8 dHash grid as [[PngLuma]]. Implemented from
  * the spec: canonical prefix codes (simple and normal forms, the
  * 19-symbol code-length code with 16/17/18 repeats and the
  * max-symbol token count), color cache, meta prefix codes, LZ77
  * backward references (plain distances and the 120-entry close-
  * neighborhood plane-code table), and all four transforms —
  * predictor (14 modes), color transform (signed 3.5 fixed-point
  * deltas), subtract-green, and color indexing with sub-byte pixel
  * bundling.
  *
  * Scope boundary, same triage contract as the other decoders: lossy
  * VP8 and VP8X-wrapped lossy payloads return null (a DCT codec is
  * out of scope — exactly as progressive JPEG was before round 17);
  * hostile bytes are data (null, never a throw, never unbounded
  * work). Unlike PNG's two-row window, LZ77 references reach
  * arbitrarily far back, so the decode holds the full ARGB frame —
  * capped at [[WebpLuma.MaxPixelsVp8l]] (4M true pixels = a 16 MB
  * buffer), checked from the 14-bit header dims BEFORE any entropy
  * work. */
object WebpLuma {

  /** VP8L frame cap: the LZ77 window is the whole image, so decode
    * memory is one ARGB int per pixel — 4M pixels bounds a hostile
    * record at 16 MB (poster-size crawl thumbnails are far smaller). */
  val MaxPixelsVp8l: Long = 1L << 22

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)) & 0xffffffffL

  /** LSB-first bit reader over [pos, end). Reads past the end set
    * `bad` and return 0 — every loop is pixel/alphabet-bounded, and
    * the caller nulls the row when `bad` is set. */
  private final class Br(b: Array[Byte], var pos: Int, val end: Int) {
    private var acc = 0L
    private var n = 0
    var bad = false
    def bits(k: Int): Int = {
      while (n < k) {
        if (pos >= end) { bad = true; return 0 }
        acc |= u8(b, pos).toLong << n
        pos += 1; n += 8
      }
      val v = (acc & ((1L << k) - 1)).toInt
      acc >>>= k; n -= k
      v
    }
  }

  /** Canonical prefix code (the DEFLATE-style construction VP8L
    * uses): decode walks bit-by-bit, code extends from the left. A
    * single-symbol SIMPLE code reads zero bits per decode. */
  private final class PCode(lengths: Array[Int], val zeroBitSymbol: Int) {
    // built only when zeroBitSymbol < 0
    private val MaxLen = 15
    private var minCode: Array[Int] = null
    private var maxCode: Array[Int] = null
    private var valPtr: Array[Int] = null
    private var syms: Array[Int] = null
    var ok = true
    if (zeroBitSymbol < 0) {
      val counts = new Array[Int](MaxLen + 1)
      var total = 0
      var s = 0
      while (s < lengths.length) {
        val l = lengths(s)
        if (l < 0 || l > MaxLen) ok = false
        else if (l > 0) { counts(l) += 1; total += 1 }
        s += 1
      }
      if (total == 0) ok = false
      if (ok) {
        // Kraft completeness: an over-subscribed or incomplete code is
        // not a prefix code we trust (libwebp rejects these too),
        // except the degenerate one-symbol case which real encoders
        // only emit through the SIMPLE form
        var kraft = 0L
        var l = 1
        while (l <= MaxLen) { kraft += counts(l).toLong << (MaxLen - l); l += 1 }
        if (kraft != (1L << MaxLen) && total > 1) ok = false
        if (total == 1 && !(counts(1) == 1)) ok = false
      }
      if (ok) {
        syms = new Array[Int](total)
        val offs = new Array[Int](MaxLen + 2)
        var l = 1
        while (l <= MaxLen) { offs(l + 1) = offs(l) + counts(l); l += 1 }
        val fill = offs.clone()
        var s2 = 0
        while (s2 < lengths.length) {
          val ll = lengths(s2)
          if (ll > 0) { syms(fill(ll)) = s2; fill(ll) += 1 }
          s2 += 1
        }
        minCode = new Array[Int](MaxLen + 1)
        maxCode = new Array[Int](MaxLen + 1)
        valPtr = new Array[Int](MaxLen + 1)
        var code = 0
        l = 1
        while (l <= MaxLen) {
          valPtr(l) = offs(l)
          minCode(l) = code
          code += counts(l)
          maxCode(l) = if (counts(l) > 0) code - 1 else -1
          code <<= 1
          l += 1
        }
      }
    }

    def decode(rd: Br): Int = {
      if (zeroBitSymbol >= 0) return zeroBitSymbol
      var code = 0
      var l = 1
      while (l <= MaxLen) {
        code = (code << 1) | rd.bits(1)
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return syms(valPtr(l) + code - minCode(l))
        l += 1
      }
      -1
    }
  }

  private object PCode {
    /** One prefix code from the stream: the SIMPLE form (1–2 symbols)
      * or the NORMAL form (code-length code + repeats + token count).
      * Null on malformed data. */
    def read(rd: Br, alphabetSize: Int): PCode = {
      if (rd.bits(1) == 1) { // simple
        val nSym = rd.bits(1) + 1
        val first8 = rd.bits(1)
        val s0 = if (first8 == 1) rd.bits(8) else rd.bits(1)
        if (s0 >= alphabetSize) return null
        if (nSym == 1) return new PCode(null, s0)
        val s1 = rd.bits(8)
        if (s1 >= alphabetSize || s1 == s0) return null
        val lens = new Array[Int](alphabetSize)
        lens(s0) = 1; lens(s1) = 1
        val c = new PCode(lens, -1)
        if (!c.ok) null else c
      } else { // normal: code-length code first
        val numCodes = rd.bits(4) + 4
        if (numCodes > 19) return null
        val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
          13, 14, 15, 16)
        val clLens = new Array[Int](19)
        var i = 0
        while (i < numCodes) { clLens(order(i)) = rd.bits(3); i += 1 }
        if (rd.bad) return null
        val clCode = new PCode(clLens, -1)
        if (!clCode.ok) return null
        // token budget: either every symbol position is covered, or an
        // explicit token count caps the read
        var maxTokens = alphabetSize
        if (rd.bits(1) == 1) {
          val lengthNBits = 2 + 2 * rd.bits(3)
          maxTokens = 2 + rd.bits(lengthNBits)
        }
        val lens = new Array[Int](alphabetSize)
        var sym = 0
        var prevLen = 8
        while (sym < alphabetSize && maxTokens > 0 && !rd.bad) {
          maxTokens -= 1
          val cl = clCode.decode(rd)
          if (cl < 0 || cl > 18) return null
          if (cl < 16) {
            lens(sym) = cl; sym += 1
            if (cl != 0) prevLen = cl
          } else {
            val (rep, v) = cl match {
              case 16 => (3 + rd.bits(2), prevLen)
              case 17 => (3 + rd.bits(3), 0)
              case _ => (11 + rd.bits(7), 0)
            }
            if (sym + rep > alphabetSize) return null
            var k = 0
            while (k < rep) { lens(sym) = v; sym += 1; k += 1 }
          }
        }
        if (rd.bad) return null
        val c = new PCode(lens, -1)
        if (!c.ok) null else c
      }
    }
  }

  /** A prefix-code group: the five codes one spatial region uses. */
  private final class Group(
      val green: PCode, val red: PCode, val blue: PCode,
      val alpha: PCode, val dist: PCode)

  /** LZ77 length/distance prefix-value coding (spec 5.2.2): codes
    * 0..3 are the value itself + 1; above that, (code&1) selects the
    * sub-range and (code-2)>>1 the extra-bit count. */
  private def prefixValue(code: Int, rd: Br): Int = {
    if (code < 0 || code > 39) return -1
    if (code < 4) return code + 1
    val extra = (code - 2) >> 1
    val offset = (2 + (code & 1)) << extra
    offset + rd.bits(extra) + 1
  }

  /** The 120 close-neighborhood plane codes (spec 5.2.2): all (dx, dy)
    * with dy in 0..7, dx in −7..8, excluding non-positive offsets on
    * the first row, ordered by euclidean distance then |dx| with the
    * positive dx first — 8 + 7·16 = 120 entries. */
  private val PlaneCodes: Array[(Int, Int)] = {
    val all = for {
      dy <- 0 to 7
      dx <- -7 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)
    all.sortBy { case (dx, dy) =>
      (dx * dx + dy * dy, math.abs(dx), if (dx < 0) 1 else 0)
    }.toArray
  }

  private def planeToDist(code: Int, xsize: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = PlaneCodes(code - 1)
      val d = dy * xsize + dx
      if (d < 1) 1 else d
    }

  def sampleGrid(b: Array[Byte]): Array[Int] = sampleGrid(b, 1)

  /** As [[sampleGrid]], but samples the grid in DISPLAY space under
    * the EXIF tag-274 `orientation` (the VP8X container carries EXIF
    * chunks; camera-rotated WebP duplicates must hash as their
    * upright selves — the same grid-level normalization as
    * [[JpegDcLuma]]). Values outside 1..8 sample as stored. */
  def sampleGrid(b: Array[Byte], orientation: Int): Array[Int] = {
    try sampleGridUnsafe(b, orientation)
    catch {
      // OOME not caught: allocations are MaxPixelsVp8l-capped
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  /** EXIF orientation (tag 274) from a WebP container's EXIF chunk, or
    * -1: [[ExifMetaExpression.scan]]'s WebP arm (the shared bounded
    * chunk walk + TIFF IFD0 read). */
  def exifOrientation(b: Array[Byte]): Int = {
    if (b == null || b.length < 20) return -1
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return -1
    ExifMetaExpression.scan(b)._2
  }

  private def sampleGridUnsafe(b: Array[Byte], orientation: Int): Array[Int] = {
    if (b == null || b.length < 20) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return null
    // chunk walk to VP8L (possibly behind VP8X/ICCP/ANIM metadata).
    // Animated files carry their frames inside ANMF chunks — the
    // FIRST frame's VP8L payload decodes (the GIF convention: an
    // animation hashes as its first frame); a lossy "VP8 " payload,
    // top-level or in-frame, is the documented null
    var p = 12
    var off = -1
    var end = -1
    while (off < 0 && p + 8 <= b.length) {
      val sz = le32(b, p + 4)
      if (sz > b.length - p - 8) return null
      if (b(p) == 'V' && b(p + 1) == 'P' && b(p + 2) == '8' && b(p + 3) == 'L') {
        off = p + 8; end = p + 8 + sz.toInt
      } else if (b(p) == 'A' && b(p + 1) == 'N' && b(p + 2) == 'M' &&
          b(p + 3) == 'F' && sz >= 16) {
        // frame header is 16 bytes (x/y/w-1/h-1/duration/flags), then
        // the frame's own chunk list — scan it for the VP8L payload
        var q = p + 8 + 16
        val frameEnd = p + 8 + sz.toInt
        while (off < 0 && q + 8 <= frameEnd) {
          val fsz = le32(b, q + 4)
          if (fsz > frameEnd - q - 8) return null
          if (b(q) == 'V' && b(q + 1) == 'P' && b(q + 2) == '8' && b(q + 3) == 'L') {
            off = q + 8; end = q + 8 + fsz.toInt
          }
          q += 8 + fsz.toInt + (fsz.toInt & 1)
        }
      }
      p += 8 + sz.toInt + (sz.toInt & 1) // chunks are 2-byte aligned
    }
    if (off < 0) return null
    val img = decodeVp8lArgb(b, off, end)
    if (img == null) return null
    gridFromArgb(img.pix, img.w, img.h, orientation)
  }

  /** A decoded VP8L frame: ARGB pixels, row-major. */
  private[functions] final class Vp8lImage(
      val w: Int, val h: Int, val pix: Array[Int])

  /** Decode one VP8L payload (`b(off until end)`) to ARGB pixels —
    * the still-image path and the per-ANMF-frame path
    * ([[WebpFrames]]) share this. Null on malformed data. */
  private[functions] def decodeVp8lArgb(
      b: Array[Byte], off: Int, end: Int): Vp8lImage = {
    if (end - off < 5) return null
    if (u8(b, off) != 0x2f) return null
    val rd = new Br(b, off + 1, end)
    val w = rd.bits(14) + 1
    val h = rd.bits(14) + 1
    rd.bits(1) // alpha-is-used hint
    if (rd.bits(3) != 0) return null // version must be 0
    if (w.toLong * h > MaxPixelsVp8l) return null

    // transforms, each at most once; color-indexing changes the coded
    // width for everything that follows
    var codedW = w
    var seen = 0
    var predBits = 0; var predImg: Array[Int] = null
    var ctBits = 0; var ctImg: Array[Int] = null
    var subtractGreen = false
    var palette: Array[Int] = null
    var paletteWidthBits = 0
    var order: List[Int] = Nil // transform types in read order
    while (rd.bits(1) == 1) {
      if (rd.bad) return null
      val t = rd.bits(2)
      if ((seen & (1 << t)) != 0) return null
      seen |= 1 << t
      order = t :: order
      t match {
        case 0 => // predictor
          predBits = rd.bits(3) + 2
          val tw = (codedW + (1 << predBits) - 1) >> predBits
          val th = (h + (1 << predBits) - 1) >> predBits
          predImg = decodeImage(rd, tw, th, level0 = false)
          if (predImg == null) return null
        case 1 => // color transform
          ctBits = rd.bits(3) + 2
          val tw = (codedW + (1 << ctBits) - 1) >> ctBits
          val th = (h + (1 << ctBits) - 1) >> ctBits
          ctImg = decodeImage(rd, tw, th, level0 = false)
          if (ctImg == null) return null
        case 2 => // subtract green
          subtractGreen = true
        case _ => // color indexing
          val n = rd.bits(8) + 1
          val raw = decodeImage(rd, n, 1, level0 = false)
          if (raw == null) return null
          // palette entries are component-wise delta-coded
          palette = new Array[Int](n)
          var prev = 0
          var k = 0
          while (k < n) {
            val d = raw(k)
            val a = ((prev >>> 24) + (d >>> 24)) & 0xff
            val r = (((prev >>> 16) & 0xff) + ((d >>> 16) & 0xff)) & 0xff
            val g = (((prev >>> 8) & 0xff) + ((d >>> 8) & 0xff)) & 0xff
            val bl = ((prev & 0xff) + (d & 0xff)) & 0xff
            prev = (a << 24) | (r << 16) | (g << 8) | bl
            palette(k) = prev
            k += 1
          }
          paletteWidthBits =
            if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
          codedW = (codedW + (1 << paletteWidthBits) - 1) >> paletteWidthBits
      }
    }
    if (rd.bad) return null

    var pix = decodeImage(rd, codedW, h, level0 = true)
    if (pix == null) return null

    // inverse transforms in reverse read order
    for (t <- order) t match {
      case 0 => pix = predictorInverse(pix, codedW, h, predImg, predBits)
      case 1 => pix = colorTransformInverse(pix, codedW, h, ctImg, ctBits)
      case 2 => // add green back
        var i = 0
        while (i < pix.length) {
          val v = pix(i)
          val g = (v >>> 8) & 0xff
          val r = (((v >>> 16) & 0xff) + g) & 0xff
          val bl = ((v & 0xff) + g) & 0xff
          pix(i) = (v & 0xff00ff00) | (r << 16) | bl
          i += 1
        }
      case _ => // color indexing: unbundle + map; restores full width
        val out = new Array[Int](w * h)
        val perByte = 1 << paletteWidthBits
        val idxBits = 8 >> paletteWidthBits
        val idxMask = (1 << idxBits) - 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val packed = pix(y * codedW + (x >> paletteWidthBits))
            val green = (packed >>> 8) & 0xff
            val slot = x & (perByte - 1)
            val idx = (green >>> (slot * idxBits)) & idxMask
            out(y * w + x) = if (idx < palette.length) palette(idx) else 0
            x += 1
          }
          y += 1
        }
        pix = out
        codedW = w
    }
    if (pix.length != w * h) return null
    new Vp8lImage(w, h, pix)
  }

  /** The shared 9×8 grid, Rec.601 integer luma (alpha ignored — the
    * same convention as PNG RGBA), sampled in DISPLAY space: each
    * display cell maps back to its stored pixel by the inverse of the
    * EXIF tag-274 transform (orientations 5..8 swap the axes). */
  private[functions] def gridFromArgb(
      pix: Array[Int], w: Int, h: Int, orientation: Int): Array[Int] = {
    val o = if (orientation >= 1 && orientation <= 8) orientation else 1
    val wD = if (o >= 5) h else w
    val hD = if (o >= 5) w else h
    val samples = new Array[Int](72)
    var r = 0
    while (r < 8) {
      val yd = if (hD == 1) 0 else ((hD - 1).toLong * r / 7).toInt
      var c = 0
      while (c < 9) {
        val xd = if (wD == 1) 0 else ((wD - 1).toLong * c / 8).toInt
        var x = xd; var y = yd
        o match {
          case 1 => ()
          case 2 => x = w - 1 - xd
          case 3 => x = w - 1 - xd; y = h - 1 - yd
          case 4 => y = h - 1 - yd
          case 5 => x = yd; y = xd
          case 6 => x = yd; y = h - 1 - xd
          case 7 => x = w - 1 - yd; y = h - 1 - xd
          case _ => x = w - 1 - yd; y = xd // 8
        }
        val v = pix(y * w + x)
        samples(r * 9 + c) = (((v >>> 16) & 0xff) * 299 +
          ((v >>> 8) & 0xff) * 587 + (v & 0xff) * 114) / 1000
        c += 1
      }
      r += 1
    }
    samples
  }

  /** One entropy-coded ARGB image (spec "spatially-coded image"):
    * optional meta prefix codes (level 0 only), optional color cache,
    * prefix-code groups, then the literal/backref/cache symbol stream.
    * Null on malformed data. */
  private def decodeImage(rd: Br, w: Int, h: Int, level0: Boolean): Array[Int] = {
    if (w < 1 || h < 1 || w.toLong * h > MaxPixelsVp8l) return null
    var metaBits = 0
    var metaImg: Array[Int] = null
    var nGroups = 1
    if (level0 && rd.bits(1) == 1) {
      metaBits = rd.bits(3) + 2
      val mw = (w + (1 << metaBits) - 1) >> metaBits
      val mh = (h + (1 << metaBits) - 1) >> metaBits
      metaImg = decodeImage(rd, mw, mh, level0 = false)
      if (metaImg == null) return null
      var i = 0
      while (i < metaImg.length) {
        val g = (metaImg(i) >>> 8) & 0xffff
        if (g + 1 > nGroups) nGroups = g + 1
        i += 1
      }
      if (nGroups > 2048) return null // hostile meta image
    }
    var cacheBits = 0
    if (rd.bits(1) == 1) {
      cacheBits = rd.bits(4)
      if (cacheBits < 1 || cacheBits > 11) return null
    }
    if (rd.bad) return null
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val greenAlphabet = 256 + 24 + cacheSize
    val groups = new Array[Group](nGroups)
    var gi = 0
    while (gi < nGroups) {
      val green = PCode.read(rd, greenAlphabet)
      val red = PCode.read(rd, 256)
      val blue = PCode.read(rd, 256)
      val alpha = PCode.read(rd, 256)
      val dist = PCode.read(rd, 40)
      if (green == null || red == null || blue == null || alpha == null ||
        dist == null || rd.bad) return null
      groups(gi) = new Group(green, red, blue, alpha, dist)
      gi += 1
    }
    val mw = if (metaImg != null) (w + (1 << metaBits) - 1) >> metaBits else 0
    val pix = new Array[Int](w * h)
    var pos = 0
    val n = w * h
    while (pos < n) {
      if (rd.bad) return null
      val grp =
        if (metaImg == null) groups(0)
        else {
          val x = pos % w; val y = pos / w
          val g = (metaImg((y >> metaBits) * mw + (x >> metaBits)) >>> 8) & 0xffff
          groups(g)
        }
      val s = grp.green.decode(rd)
      if (s < 0) return null
      if (s < 256) { // literal: green, then red, blue, alpha
        val r = grp.red.decode(rd)
        val bl = grp.blue.decode(rd)
        val a = grp.alpha.decode(rd)
        if (r < 0 || bl < 0 || a < 0) return null
        val argb = (a << 24) | (r << 16) | (s << 8) | bl
        pix(pos) = argb
        if (cache != null)
          cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
        pos += 1
      } else if (s < 280) { // LZ77 backward reference
        val len = prefixValue(s - 256, rd)
        val dSym = grp.dist.decode(rd)
        if (dSym < 0) return null
        val dCode = prefixValue(dSym, rd)
        if (len < 1 || dCode < 1 || rd.bad) return null
        val dist = planeToDist(dCode, w)
        if (dist > pos || pos + len > n) return null
        var k = 0
        while (k < len) { // overlapping copies are the LZ77 norm
          val argb = pix(pos - dist)
          pix(pos) = argb
          if (cache != null)
            cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
          pos += 1; k += 1
        }
      } else { // color-cache hit
        val idx = s - 280
        if (cache == null || idx >= cacheSize) return null
        pix(pos) = cache(idx)
        pos += 1
      }
    }
    if (rd.bad) null else pix
  }

  private def avg2(a: Int, b: Int): Int =
    ((((a >>> 24) + (b >>> 24)) >> 1) << 24) |
      (((((a >>> 16) & 0xff) + ((b >>> 16) & 0xff)) >> 1) << 16) |
      (((((a >>> 8) & 0xff) + ((b >>> 8) & 0xff)) >> 1) << 8) |
      (((a & 0xff) + (b & 0xff)) >> 1)

  private def addPixels(p: Int, q: Int): Int =
    ((((p >>> 24) + (q >>> 24)) & 0xff) << 24) |
      (((((p >>> 16) & 0xff) + ((q >>> 16) & 0xff)) & 0xff) << 16) |
      (((((p >>> 8) & 0xff) + ((q >>> 8) & 0xff)) & 0xff) << 8) |
      ((((p & 0xff) + (q & 0xff)) & 0xff))

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Predictor transform inverse (spec 4.1): each pixel adds its
    * block's predictor of already-reconstructed neighbors. Borders
    * override the mode: (0,0) is opaque black, the first row predicts
    * L, the first column predicts T; the top-right of a row's last
    * pixel is the reconstructed first pixel of the SAME row (the
    * buffer-adjacency convention the format is defined against). */
  private def predictorInverse(
      pix: Array[Int], w: Int, h: Int, modes: Array[Int], bits: Int): Array[Int] = {
    if (modes == null) return null
    val mw = (w + (1 << bits) - 1) >> bits
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) pix(pos - 1)
          else if (x == 0) pix(pos - w)
          else {
            val mode = (modes((y >> bits) * mw + (x >> bits)) >>> 8) & 0xff
            if (mode > 13) return null
            val l = pix(pos - 1)
            val t = pix(pos - w)
            val tl = pix(pos - w - 1)
            val tr = pix(pos - w + 1) // x = w-1 lands on THIS row's x=0
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => // Select: whichever of T/L the gradient favors
                var pa = 0; var pb = 0
                var sh = 0
                while (sh < 32) {
                  val tc = (t >>> sh) & 0xff
                  val lc = (l >>> sh) & 0xff
                  val tlc = (tl >>> sh) & 0xff
                  pa += math.abs(tc - tlc)
                  pb += math.abs(lc - tlc)
                  sh += 8
                }
                if (pa <= pb) t else l
              case 12 => // ClampAddSubtractFull
                (clamp255((l >>> 24) + (t >>> 24) - (tl >>> 24)) << 24) |
                  (clamp255(((l >>> 16) & 0xff) + ((t >>> 16) & 0xff) -
                    ((tl >>> 16) & 0xff)) << 16) |
                  (clamp255(((l >>> 8) & 0xff) + ((t >>> 8) & 0xff) -
                    ((tl >>> 8) & 0xff)) << 8) |
                  clamp255((l & 0xff) + (t & 0xff) - (tl & 0xff))
              case _ => // 13: ClampAddSubtractHalf
                val ave = avg2(l, t)
                var out = 0
                var sh2 = 0
                while (sh2 < 32) {
                  val a = (ave >>> sh2) & 0xff
                  val c = (tl >>> sh2) & 0xff
                  out |= clamp255(a + (a - c) / 2) << sh2
                  sh2 += 8
                }
                out
            }
          }
        pix(pos) = addPixels(pred, pix(pos))
        pos += 1; x += 1
      }
      y += 1
    }
    pix
  }

  /** Color transform inverse (spec 4.2): per-block signed 3.5
    * fixed-point deltas — green feeds red, then green and the
    * reconstructed red feed blue. All operands SIGNED bytes. */
  private def colorTransformInverse(
      pix: Array[Int], w: Int, h: Int, cts: Array[Int], bits: Int): Array[Int] = {
    if (cts == null) return null
    val mw = (w + (1 << bits) - 1) >> bits
    def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = cts((y >> bits) * mw + (x >> bits))
        val g2r = cte & 0xff
        val g2b = (cte >>> 8) & 0xff
        val r2b = (cte >>> 16) & 0xff
        val v = pix(pos)
        val g = (v >>> 8) & 0xff
        val r = (((v >>> 16) & 0xff) + delta(g2r, g)) & 0xff
        val bl = ((v & 0xff) + delta(g2b, g) + delta(r2b, r)) & 0xff
        pix(pos) = (v & 0xff00ff00) | (r << 16) | bl
        pos += 1; x += 1
      }
      y += 1
    }
    pix
  }
}

/** Animated-WebP frame decoder: the WebP arm of the video pipeline.
  * Walks the VP8X container's ANMF frame list, decodes each frame's
  * VP8L payload ([[WebpLuma.decodeVp8lArgb]] — lossy VP8 frames are
  * the documented null), and COMPOSITES it onto the canvas at its
  * (2·x, 2·y) offset honoring the per-frame blending method (alpha
  * blending or overwrite) and dispose-to-background, then samples the
  * canvas into the same 9×8 luma grid every raster decoder feeds —
  * one grid PER FRAME, the same contract as [[GifFrames]], so the
  * SAME clip crawled as animated GIF and animated WebP produces the
  * SAME frame-hash sequence and cross-container video dedup works.
  * A still (no ANMF) decodes as one frame. Frame count capped by
  * `maxFrames`, canvas and frame rects by [[WebpLuma]]'s pixel caps;
  * junk/truncated/lossy bytes → null, never a throw. */
object WebpFrames {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
  private def le32(b: Array[Byte], i: Int): Long =
    (le24(b, i).toLong | (u8(b, i + 3).toLong << 24)) & 0xffffffffL

  def frameGrids(b: Array[Byte]): Array[Array[Int]] =
    frameGrids(b, GifFrames.MaxFrames)

  def frameGrids(b: Array[Byte], maxFrames: Int): Array[Array[Int]] = {
    try frameGridsUnsafe(b, maxFrames)
    catch {
      // allocations are pixel-capped (see PngLuma on OOME)
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  private def frameGridsUnsafe(b: Array[Byte], maxFrames: Int): Array[Array[Int]] = {
    if (b == null || b.length < 20 || maxFrames < 1) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return null
    // first pass: canvas dims (VP8X), background (ANIM), frame spans
    var p = 12
    var cw = -1; var ch = -1
    var bg = 0
    var stillOff = -1; var stillEnd = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    while (p + 8 <= b.length) {
      val sz = le32(b, p + 4)
      if (sz > b.length - p - 8) return null
      if (b(p) == 'V' && b(p + 1) == 'P' && b(p + 2) == '8' && b(p + 3) == 'X') {
        if (sz < 10) return null
        cw = le24(b, p + 12) + 1
        ch = le24(b, p + 15) + 1
      } else if (b(p) == 'A' && b(p + 1) == 'N' && b(p + 2) == 'I' &&
          b(p + 3) == 'M') {
        if (sz < 6) return null
        // spec byte order: Blue, Green, Red, Alpha
        bg = (u8(b, p + 11) << 24) | (u8(b, p + 10) << 16) |
          (u8(b, p + 9) << 8) | u8(b, p + 8)
      } else if (b(p) == 'A' && b(p + 1) == 'N' && b(p + 2) == 'M' &&
          b(p + 3) == 'F') {
        if (sz < 16) return null
        frames += ((p + 8, p + 8 + sz.toInt))
      } else if (b(p) == 'V' && b(p + 1) == 'P' && b(p + 2) == '8' &&
          b(p + 3) == 'L' && stillOff < 0) {
        stillOff = p + 8; stillEnd = p + 8 + sz.toInt
      }
      p += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (frames.isEmpty) {
      // a still: one frame, the existing single-image contract
      if (stillOff < 0) return null
      val img = WebpLuma.decodeVp8lArgb(b, stillOff, stillEnd)
      if (img == null) return null
      return Array(WebpLuma.gridFromArgb(img.pix, img.w, img.h, 1))
    }
    if (cw < 1 || ch < 1) return null
    if (cw.toLong * ch > WebpLuma.MaxPixelsVp8l) return null
    val canvas = Array.fill(cw * ch)(bg)
    val grids = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    var fi = 0
    while (fi < frames.length && grids.length < maxFrames) {
      val (fOff, fEnd) = frames(fi)
      if (fEnd - fOff < 16) return null
      val fx = le24(b, fOff) * 2
      val fy = le24(b, fOff + 3) * 2
      val fw = le24(b, fOff + 6) + 1
      val fh = le24(b, fOff + 9) + 1
      val flags = u8(b, fOff + 15)
      val blend = (flags & 0x02) == 0 // bit 1 clear = alpha blending
      val dispose = (flags & 0x01) != 0
      if (fx.toLong + fw > cw || fy.toLong + fh > ch) return null
      // the frame's own chunk list: find its VP8L payload
      var q = fOff + 16
      var off = -1; var end = -1
      while (off < 0 && q + 8 <= fEnd) {
        val sz = le32(b, q + 4)
        if (sz > fEnd - q - 8) return null
        if (b(q) == 'V' && b(q + 1) == 'P' && b(q + 2) == '8' && b(q + 3) == 'L') {
          off = q + 8; end = q + 8 + sz.toInt
        }
        q += 8 + sz.toInt + (sz.toInt & 1)
      }
      if (off < 0) return null // lossy VP8 frame: the documented null
      val img = WebpLuma.decodeVp8lArgb(b, off, end)
      if (img == null || img.w != fw || img.h != fh) return null
      var y = 0
      while (y < fh) {
        var x = 0
        while (x < fw) {
          val src = img.pix(y * fw + x)
          val at = (fy + y) * cw + fx + x
          if (!blend) canvas(at) = src
          else {
            val sa = src >>> 24
            if (sa == 255) canvas(at) = src
            else if (sa != 0) {
              // integer src-over: out = (sa*src + (255-sa)*dst + 127)/255
              val dst = canvas(at)
              def ch(s: Int, d: Int): Int = (sa * s + (255 - sa) * d + 127) / 255
              val da = dst >>> 24
              canvas(at) = (math.min(255, sa + da * (255 - sa) / 255) << 24) |
                (ch((src >>> 16) & 0xff, (dst >>> 16) & 0xff) << 16) |
                (ch((src >>> 8) & 0xff, (dst >>> 8) & 0xff) << 8) |
                ch(src & 0xff, dst & 0xff)
            } // sa == 0: keep dst (the transparency hole)
          }
          x += 1
        }
        y += 1
      }
      grids += WebpLuma.gridFromArgb(canvas, cw, ch, 1)
      if (dispose) {
        // dispose-to-background clears the frame rect AFTER rendering
        var yy = 0
        while (yy < fh) {
          var xx = 0
          while (xx < fw) { canvas((fy + yy) * cw + fx + xx) = bg; xx += 1 }
          yy += 1
        }
      }
      fi += 1
    }
    if (grids.isEmpty) null else grids.toArray
  }
}
