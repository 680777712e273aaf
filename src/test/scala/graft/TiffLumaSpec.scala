package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DHash64Expression, DHash64OrientedExpression, TiffLuma}
import graft.ops.Multimodal

/** TIFF raster decode: both byte orders, multi-strip assembly, the
  * photometric modes, native tag-274 orientation, and the never-throw
  * contract over junk and structural corruption. */
class TiffLumaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(seeds: Seq[Long], oriented: Boolean = false): Map[Long, Array[Byte]] = {
    import spark.implicits._
    Multimodal.tiffPixelsFromIds(seeds.toDF("doc_id"), "doc_id", oriented = oriented)
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect().toMap
  }

  test("TIFF of the p340 grid dHashes identically to BMP, both byte orders, multi-strip") {
    import spark.implicits._
    val seeds = (0L until 20L).filter(_ % 10 != 9)
    val tif = fixture(seeds)
    val bmp = Multimodal.bmpPixelsFromIds(seeds.toDF("doc_id"), "doc_id")
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect().toMap
    for (seed <- seeds) {
      val ht = DHash64Expression.evalRow(tif(seed))
      val hb = DHash64Expression.evalRow(bmp(seed))
      assert(ht != null && ht == hb, s"seed=$seed (order=${tif(seed)(0).toChar})")
    }
  }

  test("native tag-274 orientation: all 8 rotations hash as their upright self") {
    val seeds = (0L until 24L).filter(_ % 10 != 9) // covers orientations 1..8
    val upright = fixture(seeds)
    val rotated = fixture(seeds, oriented = true)
    for (seed <- seeds) {
      val baseHash = DHash64Expression.evalRow(upright(seed))
      assert(DHash64OrientedExpression.evalRow(rotated(seed)) == baseHash,
        s"seed=$seed orientation=${seed % 8 + 1}")
    }
  }

  test("photometric modes: WhiteIsZero inverts, RGB lumas, palette via ColorMap") {
    val g = fixture(Seq(2L))(2L)
    // flip photometric 1 -> 0: every sample becomes 255 - v, so the
    // dHash comparisons all invert except ties
    val inv = g.clone()
    // entry 5 (262) value at 8 + 2 + 4*12 + 8 = 66 (II order, seed 2)
    assert(inv(58) == 6.toByte && inv(66) == 1.toByte) // tag 262, value 1
    inv(66) = 0
    val a = TiffLuma.sampleGrid(g)
    val b = TiffLuma.sampleGrid(inv)
    assert(b != null && a.indices.forall(i => b(i) == 255 - a(i)))
    // hand-built 2x1 RGB: red then white -> luma 76 then 255
    val rgb = tinyTiff(photo = 2, spp = 3,
      data = Array[Byte](255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte))
    val gr = TiffLuma.sampleGrid(rgb)
    assert(gr != null && gr(0) == 76 && gr(8) == 255)
    // hand-built 2x1 palette: index 0 -> black, index 1 -> white
    val pal = tinyTiff(photo = 3, spp = 1, data = Array[Byte](0, 1),
      colorMap = true)
    val gp = TiffLuma.sampleGrid(pal)
    assert(gp != null && gp(0) == 0 && gp(8) == 255)
  }

  test("junk, truncation, compression, depth and lying offsets are null, never a throw") {
    val good = fixture(Seq(4L))(4L)
    assert(TiffLuma.sampleGrid(null) == null)
    assert(TiffLuma.sampleGrid("notatiff:x".getBytes) == null)
    assert(TiffLuma.sampleGrid(good.take(7)) == null)
    assert(TiffLuma.sampleGrid(good.take(60)) == null)   // mid-IFD
    assert(TiffLuma.sampleGrid(good.dropRight(5)) == null) // mid-pixels
    // compression = 5 (LZW) is the documented null
    val comp = good.clone(); comp(8 + 2 + 3 * 12 + 8) = 5
    assert(TiffLuma.sampleGrid(comp) == null)
    // bits = 16
    val b16 = good.clone(); b16(8 + 2 + 2 * 12 + 8) = 16
    assert(TiffLuma.sampleGrid(b16) == null)
    // strip offset pointing past the buffer
    val lying = good.clone()
    val soOff = 8 + 2 + 9 * 12 + 4
    lying(soOff) = 0xff.toByte; lying(soOff + 1) = 0xff.toByte
    assert(TiffLuma.sampleGrid(lying) == null)
    // random byte fuzz over the header/IFD region must never throw
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 300) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      TiffLuma.sampleGrid(m) // result irrelevant; must not throw
    }
  }

  test("GPS redaction: pointer retagged, GPS IFD zeroed, pixels and orientation intact") {
    import spark.implicits._
    import graft.functions.{ExifMetaExpression, TiffStripGpsExpression}
    val seeds = (0L until 24L).filter(_ % 10 != 9)
    val tagged = Multimodal.tiffPixelsFromIds(seeds.toDF("doc_id"), "doc_id",
      oriented = true, gps = true)
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect().toMap
    val upright = fixture(seeds)
    for (s <- seeds) {
      val pre = tagged(s)
      val (_, _, preGps) = ExifMetaExpression.scan(pre)
      assert(preGps == (if (s % 3 == 0) 1 else 0), s"seed=$s")
      val post = TiffStripGpsExpression.evalBytes(pre)
      val (_, o, postGps) = ExifMetaExpression.scan(post)
      assert(postGps == 0 && o == (s % 8 + 1).toInt, s"seed=$s")
      if (s % 3 == 0) {
        assert(!(post eq pre), s"planted member must copy, seed=$s")
        // the GPS IFD region no longer contains the latitude ref: the
        // position holding 'N' pre-redaction must read zero after
        assert((0 until pre.length).exists(i => pre(i) == 'N' && post(i) == 0),
          s"GPS payload survived, seed=$s")
        assert(post.length == pre.length, s"in-place contract, seed=$s")
      } else assert(post eq pre, s"GPS-less member passes by reference, seed=$s")
      // the oriented hash is unchanged through the redaction
      assert(DHash64OrientedExpression.evalRow(post) ==
        DHash64Expression.evalRow(upright(s)), s"seed=$s")
      // idempotent
      assert(java.util.Arrays.equals(
        TiffStripGpsExpression.evalBytes(post), post) ||
        (TiffStripGpsExpression.evalBytes(post) eq post), s"seed=$s")
    }
    // junk passes through untouched
    val junk = "notatiff:9".getBytes
    assert(TiffStripGpsExpression.evalBytes(junk) eq junk)
  }

  test("differential vs ImageIO: the JDK TIFF reader agrees on the sampled grid") {
    val seeds = (0L until 10L).filter(_ % 10 != 9)
    val tif = fixture(seeds)
    for (seed <- seeds) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(tif(seed)))
      if (img != null) { // JDK TIFF plugin present since 9
        val mine = TiffLuma.sampleGrid(tif(seed))
        for (r <- 0 until 8; c <- 0 until 9) {
          val y = if (img.getHeight == 1) 0 else (img.getHeight - 1) * r / 7
          val x = if (img.getWidth == 1) 0 else (img.getWidth - 1) * c / 8
          // gray rasters read as RAW samples (getRGB gamma-expands
          // CS_GRAY — same caveat as the PNG differential)
          val lum = img.getRaster.getSample(x, y, 0)
          assert(mine(r * 9 + c) == lum, s"seed=$seed r=$r c=$c")
        }
      }
    }
  }

  /** Minimal wx1 TIFF (II): one strip, inline-able arrays kept
    * external for uniformity with the decoder's array path. */
  private def tinyTiff(photo: Int, spp: Int, data: Array[Byte],
      colorMap: Boolean = false): Array[Byte] = {
    val w = data.length / spp
    val nEntries = if (colorMap) 10 else 9
    val cmOff = 8 + 2 + nEntries * 12 + 4
    val dataOff = cmOff + (if (colorMap) 1536 else 0)
    val out = new Array[Byte](dataOff + data.length)
    def w16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte }
    def w32(i: Int, v: Int): Unit = { w16(i, v & 0xffff); w16(i + 2, v >>> 16) }
    out(0) = 'I'; out(1) = 'I'; w16(2, 42); w32(4, 8)
    var p = 8
    w16(p, nEntries); p += 2
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit = {
      w16(p, tag); w16(p + 2, typ); w32(p + 4, cnt)
      if (typ == 3) { w16(p + 8, value); w16(p + 10, 0) } else w32(p + 8, value)
      p += 12
    }
    entry(256, 3, 1, w)
    entry(257, 3, 1, 1)
    entry(258, 3, 1, 8)
    entry(259, 3, 1, 1)
    entry(262, 3, 1, photo)
    entry(273, 4, 1, dataOff)
    entry(277, 3, 1, spp)
    entry(278, 3, 1, 1)
    entry(279, 4, 1, data.length)
    if (colorMap) entry(320, 3, 768, cmOff)
    w32(p, 0)
    if (colorMap) {
      // index 0 -> 0, index 1 -> 65535, for all three planes
      for (plane <- 0 until 3) w16(cmOff + plane * 512 + 2, 0xffff)
    }
    data.copyToArray(out, dataOff)
    out
  }
}
