package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DHash64Expression, ExifMetaExpression, JpegStripExifExpression}
import graft.ops.Multimodal

/** EXIF governance triage + redaction: `exif_meta` reads orientation
  * and the GPS-IFD PII flag from a JPEG's APP1 (or a bare TIFF);
  * `jpeg_strip_exif` removes the APP1 while leaving pixels
  * byte-identical (the stripped file must dHash exactly like the
  * original). Both byte orders, both directions (plant → detect →
  * strip → gone), junk-total fuzz. */
class ExifSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exif_meta: planted orientation + GPS flag recovered, both byte orders") {
    import spark.implicits._
    val ids = (0L until 24L).toVector
    val got = Multimodal.jpegExifFromIds(ids.toDF("doc_id"), "doc_id")
      .select("media_id", "bytes").as[(Long, Array[Byte])]
      .collect().toMap
    for (seed <- ids) {
      val (e, o, g) = ExifMetaExpression.scan(got(seed))
      if (seed % 10 == 9) assert((e, o, g) == ((0, -1, 0)), s"junk seed=$seed")
      else {
        assert(e == 1, s"seed=$seed")
        assert(o == (seed % 8 + 1).toInt, s"seed=$seed")
        assert(g == (if (seed % 3 == 0) 1 else 0), s"seed=$seed")
      }
    }
    // plain DC jpegs carry no EXIF
    val plain = Multimodal.jpegDcFromIds(Seq(1L).toDF("doc_id"), "doc_id")
      .select("bytes").as[Array[Byte]].head()
    assert(ExifMetaExpression.scan(plain) == ((0, -1, 0)))
    assert(ExifMetaExpression.scan(null) == ((0, -1, 0)))
    assert(ExifMetaExpression.scan("junkjunkjunk".getBytes) == ((0, -1, 0)))
  }

  test("exif_meta: bare TIFF buffer parses directly (both orders)") {
    // hand-built little-endian TIFF: IFD0 with orientation 6 + GPS ptr
    def tiff(le: Boolean): Array[Byte] = {
      val t = new Array[Byte](8 + 2 + 12 * 2 + 4 + 6)
      def w16(i: Int, v: Int): Unit =
        if (le) { t(i) = v.toByte; t(i + 1) = (v >>> 8).toByte }
        else { t(i) = (v >>> 8).toByte; t(i + 1) = v.toByte }
      def w32(i: Int, v: Int): Unit =
        if (le) { w16(i, v & 0xffff); w16(i + 2, v >>> 16) }
        else { w16(i, v >>> 16); w16(i + 2, v & 0xffff) }
      if (le) { t(0) = 'I'; t(1) = 'I' } else { t(0) = 'M'; t(1) = 'M' }
      w16(2, 42); w32(4, 8)
      w16(8, 2)
      w16(10, 274); w16(12, 3); w32(14, 1); w16(18, 6)
      w16(22, 34853); w16(24, 4); w32(26, 1); w32(30, 38)
      w32(34, 0)
      t
    }
    assert(ExifMetaExpression.scan(tiff(le = true)) == ((1, 6, 1)))
    assert(ExifMetaExpression.scan(tiff(le = false)) == ((1, 6, 1)))
  }

  test("jpeg_strip_exif: EXIF gone, pixels byte-identical (same dhash), idempotent") {
    import spark.implicits._
    val ids = (0L until 24L).filter(_ % 10 != 9)
    val exifd = Multimodal.jpegExifFromIds(ids.toDF("doc_id"), "doc_id")
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect().toMap
    val plain = Multimodal.jpegDcFromIds(ids.toDF("doc_id"), "doc_id")
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect().toMap
    for (seed <- ids) {
      val stripped = JpegStripExifExpression.evalRow(exifd(seed))
      assert(ExifMetaExpression.scan(stripped) == ((0, -1, 0)), s"seed=$seed")
      // stripping recovers the EXACT plain-DC bytes — pixels untouched
      assert(java.util.Arrays.equals(stripped, plain(seed)), s"seed=$seed")
      assert(DHash64Expression.evalRow(stripped) ==
        DHash64Expression.evalRow(exifd(seed)), s"seed=$seed")
      // idempotent; EXIF-less input returns the same array (no copy)
      assert(JpegStripExifExpression.evalRow(stripped) eq stripped)
    }
    // non-JPEG and junk pass through unchanged
    val junk = "notajpeg:9".getBytes("US-ASCII")
    assert(JpegStripExifExpression.evalRow(junk) eq junk)
    assert(JpegStripExifExpression.evalRow(null) == null)
  }

  test("strip_exif dispatcher: routes JPEG/WebP/PNG by magic, leaves the rest alone") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L).toDF("doc_id")
    def one(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.select("bytes").as[Array[Byte]].head()
    val jpeg = one(Multimodal.jpegExifFromIds(ids, "doc_id"))
    val webp = one(Multimodal.webpExifFromIds(ids, "doc_id"))
    val png = one(Multimodal.pngExifFromIds(ids, "doc_id"))
    for (b <- Seq(jpeg, webp, png)) {
      val s = graft.functions.StripExifExpression.evalRow(b)
      assert(ExifMetaExpression.scan(s) == ((0, -1, 0)))
      assert(DHash64Expression.evalRow(s) == DHash64Expression.evalRow(b))
      // same result as the format-specific strip, byte for byte
      val direct =
        if ((b(0) & 0xff) == 0xff) JpegStripExifExpression.evalRow(b)
        else if (b(0) == 'R') graft.functions.WebpStripExifExpression.evalRow(b)
        else graft.functions.PngStripExifExpression.evalRow(b)
      assert(java.util.Arrays.equals(s, direct))
    }
    // non-image payloads pass through by reference
    val junk = "not an image at all".getBytes("US-ASCII")
    assert(graft.functions.StripExifExpression.evalRow(junk) eq junk)
    val gif = one(Multimodal.gifPixelsFromIds(ids, "doc_id"))
    assert(graft.functions.StripExifExpression.evalRow(gif) eq gif)
  }

  test("hostile fuzz: exif_meta and strip never throw; strip never corrupts") {
    import spark.implicits._
    val valid = Multimodal.jpegExifFromIds(Seq(3L).toDF("doc_id"), "doc_id")
      .select("bytes").as[Array[Byte]].head()
    val rnd = new java.util.Random(354L)
    (1 to 6000).foreach { _ =>
      val n = rnd.nextInt(160)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      if (n >= 4 && rnd.nextBoolean()) {
        b(0) = 0xff.toByte; b(1) = 0xd8.toByte; b(2) = 0xff.toByte
        b(3) = 0xe1.toByte
      }
      ExifMetaExpression.scan(b)
      JpegStripExifExpression.evalRow(b)
    }
    for (k <- 0 until valid.length) {
      ExifMetaExpression.scan(valid.take(k))
      JpegStripExifExpression.evalRow(valid.take(k))
    }
    for (pos <- valid.indices; v <- Seq(0x00, 0xff)) {
      val m = valid.clone(); m(pos) = v.toByte
      ExifMetaExpression.scan(m)
      val s = JpegStripExifExpression.evalRow(m)
      // the strip contract: output is the input itself, or a valid
      // re-splice (never a torn buffer) — spot-check length sanity
      assert(s != null && s.length <= m.length)
    }
  }
}
