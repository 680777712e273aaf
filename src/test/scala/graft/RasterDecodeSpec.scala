package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DHash64Expression, JpegDcLuma, PngLuma}
import graft.ops.Multimodal

/** The compressed-raster decode path feeding dhash64: PNG (RFC 2083
  * streaming inflate + unfilter) and baseline-JPEG (T.81 DC
  * thumbnail). Two kinds of evidence: (1) FORMAT AGREEMENT — a PNG, a
  * JPEG and a BMP of the same luma grid hash identically, which is
  * what makes cross-format near-dup work and what lets the DuckDB
  * oracle replay one arithmetic for all three; (2) DIFFERENTIAL vs a
  * REAL codec — javax.imageio encodes random images and the decoders
  * must agree with ImageIO's own decode, pixel-for-pixel (PNG) or
  * block-mean (JPEG). Plus the never-throw fuzz the triage contract
  * demands. */
class RasterDecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lcgLum(seed: Long)(x: Int, y: Int): Int =
    (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) + 12345L)
      % 2147483648L) / 65536L % 256L).toInt

  test("PNG/JPEG/BMP of the same luma grid dHash identically (all PNG filter modes)") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 3L, 7L, 11L, 42L, 1234L).toDF("doc_id")
    val bmp = Multimodal.imageDHashScan(
        Multimodal.bmpPixelsFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    for (fm <- 0 to 4) {
      val png = Multimodal.imageDHashScan(
          Multimodal.pngPixelsFromIds(ids, "doc_id", filterMode = fm), "bytes")
        .select("media_id", "dhash").as[(Long, Long)].collect().toMap
      assert(png == bmp, s"filterMode=$fm")
    }
    val jpg = Multimodal.imageDHashScan(
        Multimodal.jpegDcFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    assert(jpg == bmp)
  }

  test("junk members (seed % 10 == 9) yield NULL dhash for PNG and JPEG builders") {
    import spark.implicits._
    val ids = Seq(9L, 19L, 29L).toDF("doc_id")
    val png = Multimodal.imageDHashScan(
        Multimodal.pngPixelsFromIds(ids, "doc_id"), "bytes")
      .select("dhash").collect()
    assert(png.forall(_.isNullAt(0)))
    val jpg = Multimodal.imageDHashScan(
        Multimodal.jpegDcFromIds(ids, "doc_id"), "bytes")
      .select("dhash").collect()
    assert(jpg.forall(_.isNullAt(0)))
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"ImageIO has no $fmt writer")
    bos.toByteArray
  }

  private def rec601(rgb: Int): Int =
    (((rgb >>> 16) & 0xff) * 299 + ((rgb >>> 8) & 0xff) * 587 +
      (rgb & 0xff) * 114) / 1000

  test("PNG differential vs ImageIO: gray, RGB, RGBA, indexed — exact grid agreement") {
    val rnd = new java.util.Random(20260816L)
    val types = Seq(
      BufferedImage.TYPE_BYTE_GRAY,   // color type 0
      BufferedImage.TYPE_INT_RGB,     // color type 2
      BufferedImage.TYPE_4BYTE_ABGR,  // color type 6
      BufferedImage.TYPE_BYTE_INDEXED, // color type 3 (palette)
      BufferedImage.TYPE_BYTE_BINARY) // 1-bit depth
    for (t <- types; trial <- 0 until 6) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val img = new BufferedImage(w, h, t)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt() | 0xff000000)
      val png = encode(img, "png")
      val got = PngLuma.sampleGrid(png)
      assert(got != null, s"type=$t ${w}x$h decode failed")
      // the expectation comes from ImageIO's own decode of those
      // bytes. Gray rasters must be read as RAW samples — getRGB
      // gamma-expands CS_GRAY into sRGB, which neither the PNG bytes
      // nor the decoder ever see.
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(png))
      val grayRef = ref.getColorModel.getNumColorComponents == 1 &&
        !ref.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
      for (r <- 0 until 8; c <- 0 until 9) {
        val y = if (h == 1) 0 else ((h - 1).toLong * r / 7).toInt
        val x = if (w == 1) 0 else ((w - 1).toLong * c / 8).toInt
        val want =
          if (grayRef) {
            val bits = ref.getColorModel.getComponentSize(0)
            ref.getRaster.getSample(x, y, 0) * 255 / ((1 << bits) - 1)
          } else rec601(ref.getRGB(x, y))
        val v = got(r * 9 + c)
        // sub-byte gray scaling can differ by one count from AWT's
        assert(math.abs(v - want) <= 1,
          s"type=$t ${w}x$h at ($x,$y): got $v want $want")
      }
    }
  }

  test("JPEG differential vs ImageIO: DC thumbnail tracks real-codec block means") {
    val rnd = new java.util.Random(7L)
    for (gray <- Seq(true, false); trial <- 0 until 4) {
      val w = 24 + rnd.nextInt(120)
      val h = 24 + rnd.nextInt(120)
      val img = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
      // smooth gradient + low noise: keeps per-block variance small so
      // the block mean is a tight reference
      for (y <- 0 until h; x <- 0 until w) {
        val v = math.min(255, math.max(0,
          (x * 2 + y) % 256 / 8 * 8 + rnd.nextInt(3)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val jpg = encode(img, "jpg")
      val got = JpegDcLuma.sampleGrid(jpg)
      assert(got != null, s"gray=$gray ${w}x$h decode failed")
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      val grayRef = ref.getColorModel.getNumColorComponents == 1
      val wT = (w + 7) / 8; val hT = (h + 7) / 8
      for (r <- 0 until 8; c <- 0 until 9) {
        val byT = if (hT == 1) 0 else ((hT - 1).toLong * r / 7).toInt
        val bxT = if (wT == 1) 0 else ((wT - 1).toLong * c / 8).toInt
        // mean luma of the real decoded block (raw samples for gray:
        // getRGB gamma-expands CS_GRAY — see the PNG differential)
        var sum = 0L; var n = 0
        for (y <- byT * 8 until math.min(h, byT * 8 + 8);
             x <- bxT * 8 until math.min(w, bxT * 8 + 8)) {
          sum += (if (grayRef) ref.getRaster.getSample(x, y, 0)
                  else rec601(ref.getRGB(x, y)))
          n += 1
        }
        val want = (sum / n).toInt
        val v = got(r * 9 + c)
        // DC quantization + edge-block padding + YCbCr rounding
        assert(math.abs(v - want) <= 12,
          s"gray=$gray ${w}x$h block ($bxT,$byT): got $v want $want")
      }
    }
  }

  test("GIF of the same luma grid dHashes identically to BMP; junk members NULL") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 3L, 7L, 11L, 42L, 1234L).toDF("doc_id")
    val bmp = Multimodal.imageDHashScan(
        Multimodal.bmpPixelsFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    val gif = Multimodal.imageDHashScan(
        Multimodal.gifPixelsFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    assert(gif == bmp)
    val junk = Multimodal.imageDHashScan(
        Multimodal.gifPixelsFromIds(Seq(9L, 19L).toDF("doc_id"), "doc_id"), "bytes")
      .select("dhash").collect()
    assert(junk.forall(_.isNullAt(0)))
  }

  test("GIF differential vs ImageIO: gray and indexed images decode to the same grid") {
    val rnd = new java.util.Random(99L)
    for (t <- Seq(BufferedImage.TYPE_BYTE_GRAY, BufferedImage.TYPE_BYTE_INDEXED);
         trial <- 0 until 6) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val img = new BufferedImage(w, h, t)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt() | 0xff000000)
      val gif = encode(img, "gif")
      val got = graft.functions.GifLuma.sampleGrid(gif)
      assert(got != null, s"type=$t ${w}x$h decode failed")
      // truth is the ORIGINAL image (already palette-quantized by
      // setRGB), not ImageIO's reader: the JDK writer emits INTERLACED
      // GIFs and the JDK reader then loses rows on heights below the
      // pass strides (verified: a 10x2 interlaced round-trip comes
      // back with row 1 black) — our decoder must beat that, not
      // match it
      for (r <- 0 until 8; c <- 0 until 9) {
        val y = if (h == 1) 0 else ((h - 1).toLong * r / 7).toInt
        val x = if (w == 1) 0 else ((w - 1).toLong * c / 8).toInt
        // gray rasters read as RAW samples (getRGB gamma-expands
        // CS_GRAY — the PNG differential's lesson); the GIF writer
        // copies those samples into a linear 256-gray palette
        val want =
          if (t == BufferedImage.TYPE_BYTE_GRAY)
            img.getRaster.getSample(x, y, 0)
          else rec601(img.getRGB(x, y))
        val v = got(r * 9 + c)
        assert(v == want, s"type=$t ${w}x$h at ($x,$y): got $v want $want")
      }
    }
  }

  test("interlaced GIF: 4-pass row order decodes to the same grid as sequential") {
    import spark.implicits._
    val seq = Multimodal.gifPixelsFromIds(Seq(5L).toDF("doc_id"), "doc_id")
      .select("bytes").as[Array[Byte]].head()
    val seqGrid = graft.functions.GifLuma.sampleGrid(seq)
    // hand-build the interlaced twin: same pixels, rows stored in the
    // GIF 4-pass order [0,4,2,6,1,3,5,7], interlace flag set
    def lum(seed: Long)(x: Int, y: Int): Int = lcgLum(seed)(x, y)
    val out = new java.io.ByteArrayOutputStream(1024)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(9); w16(8); w8(0xf7); w8(0); w8(0)
    (0 until 256).foreach { k => w8(k); w8(k); w8(k) }
    w8(0x2c); w16(0); w16(0); w16(9); w16(8)
    w8(0x40) // interlaced, no LCT
    w8(8)
    val storedRows = Seq(0, 4, 2, 6, 1, 3, 5, 7)
    val codes = 256 +: (for (y <- storedRows; x <- 0 until 9)
      yield lum(5L)(x, y)) :+ 257
    val data = new java.io.ByteArrayOutputStream(96)
    var acc = 0; var nAcc = 0
    codes.foreach { c =>
      acc |= c << nAcc; nAcc += 9
      while (nAcc >= 8) { data.write(acc & 0xff); acc >>>= 8; nAcc -= 8 }
    }
    if (nAcc > 0) data.write(acc & 0xff)
    val d = data.toByteArray
    var i = 0
    while (i < d.length) {
      val n = math.min(255, d.length - i); w8(n); out.write(d, i, n); i += n
    }
    w8(0); w8(0x3b)
    val gotGrid = graft.functions.GifLuma.sampleGrid(out.toByteArray)
    assert(gotGrid != null && gotGrid.toSeq == seqGrid.toSeq)
  }

  test("progressive JPEG fixture dHashes identically to BMP; junk members NULL") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 3L, 7L, 11L, 42L, 1234L).toDF("doc_id")
    val bmp = Multimodal.imageDHashScan(
        Multimodal.bmpPixelsFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    val prog = Multimodal.imageDHashScan(
        Multimodal.jpegProgressiveFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    assert(prog == bmp)
    // the fixture genuinely is progressive: SOF2 present, SOF0 absent
    val raw = Multimodal.jpegProgressiveFromIds(Seq(5L).toDF("doc_id"), "doc_id")
      .select("bytes").as[Array[Byte]].head()
    def hasMarker(m: Int) = raw.indices.dropRight(1).exists(i =>
      (raw(i) & 0xff) == 0xff && (raw(i + 1) & 0xff) == m)
    assert(hasMarker(0xc2) && !hasMarker(0xc0))
    val junk = Multimodal.imageDHashScan(
        Multimodal.jpegProgressiveFromIds(Seq(9L, 19L).toDF("doc_id"), "doc_id"), "bytes")
      .select("dhash").collect()
    assert(junk.forall(_.isNullAt(0)))
  }

  test("progressive JPEG differential vs ImageIO's REAL progressive encoder") {
    val rnd = new java.util.Random(17L)
    for (gray <- Seq(true, false); trial <- 0 until 3) {
      val w = 24 + rnd.nextInt(120)
      val h = 24 + rnd.nextInt(120)
      val img = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = math.min(255, math.max(0,
          (x * 2 + y) % 256 / 8 * 8 + rnd.nextInt(3)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      // encode with the JDK writer's progressive mode — a real
      // multi-scan SOF2 file (libjpeg-style scan script: interleaved
      // DC first scan with successive approximation, AC scans to skip,
      // DC refinement)
      val writer = ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val jpg = bos.toByteArray
      assert(jpg.indices.dropRight(1).exists(i =>
        (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc2),
        "writer did not emit SOF2")
      val got = JpegDcLuma.sampleGrid(jpg)
      assert(got != null, s"gray=$gray ${w}x$h progressive decode failed")
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      val grayRef = ref.getColorModel.getNumColorComponents == 1
      val wT = (w + 7) / 8; val hT = (h + 7) / 8
      for (r <- 0 until 8; c <- 0 until 9) {
        val byT = if (hT == 1) 0 else ((hT - 1).toLong * r / 7).toInt
        val bxT = if (wT == 1) 0 else ((wT - 1).toLong * c / 8).toInt
        // edge-partial blocks excluded: the encoder pads them by edge
        // replication, so their DC is the PADDED-block mean — on this
        // wrapping gradient that legitimately diverges from the
        // real-pixel mean the reference below computes
        if ((bxT + 1) * 8 <= w && (byT + 1) * 8 <= h) {
          var sum = 0L; var n = 0
          for (y <- byT * 8 until byT * 8 + 8; x <- bxT * 8 until bxT * 8 + 8) {
            sum += (if (grayRef) ref.getRaster.getSample(x, y, 0)
                    else rec601(ref.getRGB(x, y)))
            n += 1
          }
          val want = (sum / n).toInt
          val v = got(r * 9 + c)
          assert(math.abs(v - want) <= 12,
            s"gray=$gray ${w}x$h block ($bxT,$byT): got $v want $want")
        }
      }
    }
  }

  test("oriented dHash: all 8 EXIF rotations hash as their upright self") {
    import spark.implicits._
    // seeds 0..7 cycle orientations 1..8 (and 2,5 exercise big-endian
    // EXIF); none are junk members
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 16L, 23L).toDF("doc_id")
    val bmp = Multimodal.imageDHashScan(
        Multimodal.bmpPixelsFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    val rot = Multimodal.jpegOrientedFromIds(ids, "doc_id")
    val oriented = Multimodal.imageDHashOrientedScan(rot, "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    assert(oriented == bmp)
    // and the PLAIN hash genuinely differs for every rotated member —
    // the normalization is doing work, not passing through
    val plain = Multimodal.imageDHashScan(rot, "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    for ((id, hv) <- plain) {
      if (id % 8 == 0) assert(hv == bmp(id), s"id=$id upright must agree")
      else assert(hv != bmp(id), s"id=$id orientation ${id % 8 + 1} " +
        "stored rotation hashed as upright under the PLAIN hash")
    }
    // junk members still NULL through the oriented path
    val junk = Multimodal.imageDHashOrientedScan(
        Multimodal.jpegOrientedFromIds(Seq(9L, 19L).toDF("doc_id"), "doc_id"), "bytes")
      .select("dhash").collect()
    assert(junk.forall(_.isNullAt(0)))
  }

  test("camera-rotated near-dup twins pair with their upright base under the oriented hash") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).toDF("doc_id")
    val bases = Multimodal.jpegDcFromIds(ids, "doc_id")
    val twins = Multimodal.jpegOrientedFromIds(ids, "doc_id",
      idOffset = 1000L, bumpCell = 40)
    val pairs = graft.ops.Dedup.hashNearDups(
        Multimodal.imageDHashOrientedScan(bases.unionByName(twins), "bytes"),
        "media_id", "dhash", maxHamming = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // every twin pairs with its base (one bumped cell moves <= 2 bits)
    for (id <- 1L to 8L)
      assert(pairs.contains((id, id + 1000L)),
        s"rotated twin of $id (orientation ${id % 8 + 1}) did not pair")
  }

  test("Adam7 interlaced PNG decodes to the same grid as sequential (all filters)") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 3L, 7L, 11L, 42L, 1234L).toDF("doc_id")
    val bmp = Multimodal.imageDHashScan(
        Multimodal.bmpPixelsFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    for (fm <- 0 to 4) {
      val adam7 = Multimodal.imageDHashScan(
          Multimodal.pngPixelsFromIds(ids, "doc_id", filterMode = fm,
            interlaced = true), "bytes")
        .select("media_id", "dhash").as[(Long, Long)].collect().toMap
      assert(adam7 == bmp, s"filterMode=$fm")
    }
    // genuinely interlaced: IHDR interlace byte is 1
    val raw = Multimodal.pngPixelsFromIds(Seq(5L).toDF("doc_id"), "doc_id",
        interlaced = true)
      .select("bytes").as[Array[Byte]].head()
    assert(raw(28) == 1)
    val junk = Multimodal.imageDHashScan(
        Multimodal.pngPixelsFromIds(Seq(9L, 19L).toDF("doc_id"), "doc_id",
          interlaced = true), "bytes")
      .select("dhash").collect()
    assert(junk.forall(_.isNullAt(0)))
  }

  test("Adam7 differential vs ImageIO's REAL interlaced encoder: exact grid agreement") {
    val rnd = new java.util.Random(20260817L)
    val types = Seq(BufferedImage.TYPE_BYTE_GRAY, BufferedImage.TYPE_INT_RGB,
      BufferedImage.TYPE_4BYTE_ABGR)
    for (t <- types; trial <- 0 until 4) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val img = new BufferedImage(w, h, t)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt() | 0xff000000)
      val writer = ImageIO.getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val png = bos.toByteArray
      assert(png(28) == 1, "writer did not emit Adam7")
      val got = PngLuma.sampleGrid(png)
      assert(got != null, s"type=$t ${w}x$h interlaced decode failed")
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(png))
      val grayRef = ref.getColorModel.getNumColorComponents == 1 &&
        !ref.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
      for (r <- 0 until 8; c <- 0 until 9) {
        val y = if (h == 1) 0 else ((h - 1).toLong * r / 7).toInt
        val x = if (w == 1) 0 else ((w - 1).toLong * c / 8).toInt
        val want =
          if (grayRef) {
            val bits = ref.getColorModel.getComponentSize(0)
            ref.getRaster.getSample(x, y, 0) * 255 / ((1 << bits) - 1)
          } else rec601(ref.getRGB(x, y))
        val v = got(r * 9 + c)
        assert(math.abs(v - want) <= 1,
          s"type=$t ${w}x$h at ($x,$y): got $v want $want")
      }
    }
  }

  test("multi-scan SEQUENTIAL JPEG: luma scan decodes, chroma scans skip bytewise") {
    // a 3-component SOF0 file with THREE ns=1 scans (Y, then Cb, then
    // Cr — the non-interleaved layout T.81 allows and some encoders
    // emit): the old single-scan walk rejected ns != nComp outright;
    // now the Y scan must decode and the chroma scans must be skipped
    // without Huffman work. Blockwise-constant planes, q00 = 8, so the
    // DC thumbnail equals the LCG grid exactly.
    val seed = 7L
    def lum(x: Int, y: Int): Int = lcgLum(seed)(x, y)
    val out = new ByteArrayOutputStream(1024)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >>> 8); w8(v) }
    w16(0xffd8)
    // DQT 0 (luma, q00=8) and DQT 1 (chroma, flat 16)
    w16(0xffdb); w16(2 + 2 * 65)
    w8(0x00); w8(8); (1 until 64).foreach(_ => w8(16))
    w8(0x01); (0 until 64).foreach(_ => w8(16))
    // SOF0: 3 components, all (1,1); ids 1,2,3; Y->q0, chroma->q1
    w16(0xffc0); w16(2 + 6 + 9)
    w8(8); w16(64); w16(72); w8(3)
    w8(1); w8(0x11); w8(0)
    w8(2); w8(0x11); w8(1)
    w8(3); w8(0x11); w8(1)
    // DHT DC0 (categories 0..8 at length 4) + AC0 (EOB at length 1),
    // duplicated as DC1/AC1 for the chroma scans
    for (th <- 0 to 1) {
      w16(0xffc4); w16(2 + 17 + 9); w8(th)
      val dcCounts = Array(0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      dcCounts.foreach(w8); (0 to 8).foreach(w8)
      w16(0xffc4); w16(2 + 17 + 1); w8(0x10 | th)
      w8(1); (1 until 16).foreach(_ => w8(0)); w8(0x00)
    }
    var acc = 0; var nAcc = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1); nAcc += 1
        if (nAcc == 8) { w8(acc); if ((acc & 0xff) == 0xff) w8(0x00); acc = 0; nAcc = 0 }
        i -= 1
      }
    }
    def flush(): Unit = if (nAcc > 0) {
      acc = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)
      w8(acc); if ((acc & 0xff) == 0xff) w8(0x00); acc = 0; nAcc = 0
    }
    def scan(compId: Int, tables: Int, dc: (Int, Int) => Int): Unit = {
      w16(0xffda); w16(2 + 1 + 2 + 3)
      w8(1); w8(compId); w8(tables); w8(0); w8(63); w8(0)
      var pred = 0
      for (by <- 0 until 8; bx <- 0 until 9) {
        val v = dc(bx, by) - 128
        var diff = v - pred
        pred = v
        var t = 0; var a = math.abs(diff)
        while (a > 0) { t += 1; a >>= 1 }
        putBits(t, 4)
        if (t > 0) { if (diff < 0) diff += (1 << t) - 1; putBits(diff, t) }
        putBits(0, 1) // AC EOB
      }
      flush()
    }
    scan(1, 0x00, lum) // Y: decoded
    scan(2, 0x11, (_, _) => 128) // Cb: skipped bytewise
    scan(3, 0x11, (_, _) => 128) // Cr: skipped bytewise
    w16(0xffd9)
    val got = JpegDcLuma.sampleGrid(out.toByteArray)
    assert(got != null, "multi-scan sequential decode failed")
    for (r <- 0 until 8; c <- 0 until 9)
      assert(got(r * 9 + c) == lum(c, r), s"($c,$r): ${got.toSeq}")
  }

  test("restart markers: DRI honored in sequential AND progressive DC/refinement scans") {
    val seed = 11L
    def lum(x: Int, y: Int): Int = lcgLum(seed)(x, y)
    def build(progressive: Boolean): Array[Byte] = {
      val out = new ByteArrayOutputStream(1024)
      def w8(v: Int): Unit = out.write(v & 0xff)
      def w16(v: Int): Unit = { w8(v >>> 8); w8(v) }
      w16(0xffd8)
      w16(0xffdb); w16(2 + 1 + 64); w8(0x00)
      w8(8); (1 until 64).foreach(_ => w8(16))
      w16(if (progressive) 0xffc2 else 0xffc0); w16(2 + 6 + 3)
      w8(8); w16(64); w16(72); w8(1); w8(1); w8(0x11); w8(0)
      w16(0xffc4); w16(2 + 17 + 9); w8(0x00)
      val dcCounts = Array(0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      dcCounts.foreach(w8); (0 to 8).foreach(w8)
      w16(0xffc4); w16(2 + 17 + 1); w8(0x10)
      w8(1); (1 until 16).foreach(_ => w8(0)); w8(0x00)
      w16(0xffdd); w16(4); w16(16) // DRI: restart every 16 blocks
      var acc = 0; var nAcc = 0
      def putBits(v: Int, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) {
          acc = (acc << 1) | ((v >>> i) & 1); nAcc += 1
          if (nAcc == 8) { w8(acc); if ((acc & 0xff) == 0xff) w8(0x00); acc = 0; nAcc = 0 }
          i -= 1
        }
      }
      def flush(): Unit = if (nAcc > 0) {
        acc = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)
        w8(acc); if ((acc & 0xff) == 0xff) w8(0x00); acc = 0; nAcc = 0
      }
      var rst = 0
      def maybeRestart(i: Int): Unit = if (i > 0 && i % 16 == 0) {
        flush(); w16(0xffd0 + (rst % 8)); rst += 1
      }
      def dcBits(v: Int): Unit = {
        var t = 0; var a = math.abs(v)
        while (a > 0) { t += 1; a >>= 1 }
        putBits(t, 4)
        if (t > 0) { var d = v; if (d < 0) d += (1 << t) - 1; putBits(d, t) }
      }
      if (!progressive) {
        w16(0xffda); w16(2 + 1 + 2 + 3)
        w8(1); w8(1); w8(0x00); w8(0); w8(63); w8(0)
        var pred = 0
        var i = 0
        for (by <- 0 until 8; bx <- 0 until 9) {
          maybeRestart(i)
          if (i % 16 == 0) pred = 0 // restart resets the DC predictor
          val v = lum(bx, by) - 128
          dcBits(v - pred); pred = v
          putBits(0, 1) // AC EOB
          i += 1
        }
        flush()
      } else {
        // DC first scan at Al=1 with restarts
        w16(0xffda); w16(2 + 1 + 2 + 3)
        w8(1); w8(1); w8(0x00); w8(0); w8(0); w8(0x01)
        var pred = 0
        var i = 0
        for (by <- 0 until 8; bx <- 0 until 9) {
          maybeRestart(i)
          if (i % 16 == 0) pred = 0
          val v = (lum(bx, by) - 128) >> 1
          dcBits(v - pred); pred = v
          i += 1
        }
        flush()
        // DC refinement with restarts (one raw bit per block)
        rst = 0
        w16(0xffda); w16(2 + 1 + 2 + 3)
        w8(1); w8(1); w8(0x00); w8(0); w8(0); w8(0x10)
        i = 0
        for (by <- 0 until 8; bx <- 0 until 9) {
          maybeRestart(i)
          putBits((lum(bx, by) - 128) & 1, 1)
          i += 1
        }
        flush()
      }
      w16(0xffd9)
      out.toByteArray
    }
    for (progressive <- Seq(false, true)) {
      val got = JpegDcLuma.sampleGrid(build(progressive))
      assert(got != null, s"progressive=$progressive DRI decode failed")
      for (r <- 0 until 8; c <- 0 until 9)
        assert(got(r * 9 + c) == lum(c, r),
          s"progressive=$progressive ($c,$r): ${got.toSeq}")
    }
  }

  test("interlace-flagged sequential data and INVALID progressive scans triage to NULL") {
    import spark.implicits._
    val ids = Seq(1L).toDF("doc_id")
    val png = Multimodal.pngPixelsFromIds(ids, "doc_id")
      .select("bytes").as[Array[Byte]].head()
    // flipping the IHDR interlace flag WITHOUT re-laying-out the data:
    // the Adam7 passes need more scanline bytes than the sequential
    // stream carries, so the decode runs dry — null, never garbage
    val interlaced = png.clone()
    interlaced(28) = 1
    assert(PngLuma.sampleGrid(interlaced) == null)
    // flipping a BASELINE file's SOF0 marker to SOF2 leaves its single
    // scan claiming Ss=0..Se=63 — invalid for progressive (DC scans
    // are DC-only per G.1.1.1.1); decoding it as DC-only would read
    // the interleaved AC bits as DC codes and hash garbage, so the
    // decoder must reject the scan header instead
    val jpg = Multimodal.jpegDcFromIds(ids, "doc_id")
      .select("bytes").as[Array[Byte]].head()
    val prog = jpg.clone()
    var i = 0
    var flipped = false
    while (i + 1 < prog.length && !flipped) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; flipped = true
      }
      i += 1
    }
    assert(flipped)
    assert(JpegDcLuma.sampleGrid(prog) == null)
  }

  test("PNG eXIf: triage reads the planted flags; strip removes them, pixels untouched") {
    import spark.implicits._
    val ids = (0L to 8L).toDF("doc_id") // all orientations, LE+BE, GPS cycle
    val rows = Multimodal.pngExifFromIds(ids, "doc_id")
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect()
    for ((id, b) <- rows) {
      val (e, o, g) = graft.functions.ExifMetaExpression.scan(b)
      assert(e == 1, s"id=$id")
      assert(o == (id % 8 + 1).toInt, s"id=$id")
      assert(g == (if (id % 3 == 0) 1 else 0), s"id=$id")
      val s = graft.functions.PngStripExifExpression.evalRow(b)
      assert(graft.functions.ExifMetaExpression.scan(s) == ((0, -1, 0)), s"id=$id")
      assert(DHash64Expression.evalRow(s) == DHash64Expression.evalRow(b), s"id=$id")
      // idempotent: a second strip is the identity (eq, not just ==)
      assert(graft.functions.PngStripExifExpression.evalRow(s) eq s, s"id=$id")
      assert(!new String(s, "ISO-8859-1").contains("eXIf"), s"id=$id")
    }
    // eXIf-less PNG and non-PNG pass through untouched (reference eq)
    val plain = Multimodal.pngPixelsFromIds(Seq(0L).toDF("doc_id"), "doc_id")
      .select("bytes").as[Array[Byte]].head()
    assert(graft.functions.ExifMetaExpression.scan(plain) == ((0, -1, 0)))
    assert(graft.functions.PngStripExifExpression.evalRow(plain) eq plain)
    val junk = "notapng".getBytes("US-ASCII")
    assert(graft.functions.PngStripExifExpression.evalRow(junk) eq junk)
  }

  test("PNG eXIf orientation: all 8 rotations hash as the upright grid") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 10L, 13L).toDF("doc_id")
    val upright = Multimodal.imageDHashScan(
        Multimodal.bmpPixelsFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    val oriented = Multimodal.imageDHashOrientedScan(
        Multimodal.pngOrientedFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    assert(oriented == upright)
    // the normalization is load-bearing: the PLAIN hash differs on
    // every rotated member
    val stored = Multimodal.imageDHashScan(
        Multimodal.pngOrientedFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    for (id <- Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
      assert(stored(id) != upright(id), s"orientation ${id % 8 + 1} was a no-op")
    // and on an eXIf-less PNG the oriented hash equals the plain one
    val plain = Multimodal.pngPixelsFromIds(Seq(3L).toDF("doc_id"), "doc_id")
      .select("bytes").as[Array[Byte]].head()
    assert(graft.functions.DHash64OrientedExpression.evalRow(plain) ==
      DHash64Expression.evalRow(plain))
  }

  test("hostile-byte fuzz: magic-prefixed junk, truncations and mutations never throw") {
    import spark.implicits._
    val ids = Seq(1L, 2L).toDF("doc_id")
    val validPng = Multimodal.pngPixelsFromIds(ids, "doc_id")
      .select("bytes").as[Array[Byte]].head()
    val validJpg = Multimodal.jpegDcFromIds(ids, "doc_id")
      .select("bytes").as[Array[Byte]].head()
    val validProg = Multimodal.jpegProgressiveFromIds(ids, "doc_id")
      .select("bytes").as[Array[Byte]].head()
    val validAdam7 = Multimodal.pngPixelsFromIds(ids, "doc_id", interlaced = true)
      .select("bytes").as[Array[Byte]].head()
    val validGif = Multimodal.gifPixelsFromIds(ids, "doc_id")
      .select("bytes").as[Array[Byte]].head()
    val rnd = new java.util.Random(16L)
    // random tails behind the magic: field arithmetic fuzz
    (1 to 9000).foreach { i =>
      val n = rnd.nextInt(200)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      if (n >= 8 && i % 3 == 0)
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
          .copyToArray(b, 0)
      else if (n >= 6 && i % 3 == 1)
        "GIF89a".getBytes("US-ASCII").copyToArray(b, 0)
      else if (n >= 3)
        Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte).copyToArray(b, 0)
      DHash64Expression.evalRow(b) // must not throw; value is free
    }
    // every truncation of a valid file
    for (src <- Seq(validPng, validJpg, validProg, validAdam7, validGif);
         k <- 0 until src.length)
      DHash64Expression.evalRow(src.take(k))
    // single-byte mutations of valid files (all positions, 3 values)
    for (src <- Seq(validPng, validJpg, validProg, validAdam7, validGif);
         pos <- src.indices; v <- Seq(0x00, 0xff, 0x80)) {
      val m = src.clone(); m(pos) = v.toByte
      DHash64Expression.evalRow(m)
    }
    // the eXIf paths share the contract: truncate + mutate through
    // the ORIENTED hash (chunk walk + display-space sampling) and the
    // strip (which must also never corrupt what it cannot parse)
    val validExif = Multimodal.pngExifFromIds(ids, "doc_id")
      .select("bytes").as[Array[Byte]].head()
    for (src <- Seq(validExif); k <- 0 until src.length) {
      graft.functions.DHash64OrientedExpression.evalRow(src.take(k))
      graft.functions.PngStripExifExpression.evalRow(src.take(k))
    }
    for (src <- Seq(validExif); pos <- src.indices; v <- Seq(0x00, 0xff, 0x80)) {
      val m = src.clone(); m(pos) = v.toByte
      graft.functions.DHash64OrientedExpression.evalRow(m)
      graft.functions.PngStripExifExpression.evalRow(m)
    }
    // zip-bomb shape: a PNG header claiming huge true dims is capped
    val bomb = validPng.clone()
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    be32(1 << 19).copyToArray(bomb, 16) // w
    be32(1 << 19).copyToArray(bomb, 20) // h: 2^38 px > MaxPixels
    assert(PngLuma.sampleGrid(bomb) == null)
  }

  test("column path: dhash64 over a mixed PNG/JPEG/BMP/junk frame, codegen plan") {
    import spark.implicits._
    val ids = spark.range(0, 30).toDF("doc_id")
    val mixed = Multimodal.bmpPixelsFromIds(ids.where($"doc_id" % 3 === 0), "doc_id")
      .unionByName(Multimodal.pngPixelsFromIds(ids.where($"doc_id" % 3 === 1), "doc_id"))
      .unionByName(Multimodal.jpegDcFromIds(ids.where($"doc_id" % 3 === 2), "doc_id"))
    val got = Multimodal.imageDHashScan(mixed, "bytes")
      .select("media_id", "dhash").as[(Long, Option[Long])]
      .collect().toMap
    assert(got.size == 30)
    // junk ids NULL, everything else carries the LCG-grid hash
    for ((id, hv) <- got) {
      if (id % 10 == 9) assert(hv.isEmpty, s"id=$id")
      else {
        var want = 0L
        for (r <- 0 until 8; c <- 0 until 8)
          if (lcgLum(id)(c, r) < lcgLum(id)(c + 1, r)) want |= 1L << (r * 8 + c)
        assert(hv.contains(want), s"id=$id")
      }
    }
  }
}
