package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DHash64Expression, GifFrames, VideoFrameHashesExpression}
import graft.ops.Multimodal

/** Animated-GIF frame decode + compositing: every frame's composited
  * canvas grid, partial-rect updates, GCE transparency holes, frame
  * caps, and the never-throw contract over junk. */
class GifFramesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lcg(i: Long): Int =
    (((1103515245L * (i % 100000L) + 12345L) % 2147483648L) / 65536L % 256L).toInt

  private def anim(seeds: Seq[Long], extra: Boolean = false): Map[Long, Array[Byte]] = {
    import spark.implicits._
    Multimodal.gifAnimFromIds(seeds.toDF("doc_id"), "doc_id", extraFrame = extra)
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect().toMap
  }

  test("frame count and composited pixel values match the fixture arithmetic") {
    val seeds = Seq(0L, 1L, 2L, 5L, 7L)
    val byId = anim(seeds)
    for (seed <- seeds) {
      val frames = GifFrames.frameGrids(byId(seed))
      val f = (seed % 3 + 2).toInt
      assert(frames != null && frames.length == f, s"seed=$seed")
      // canvas is exactly 9x8 so the sample grid IS the canvas
      for (fi <- frames.indices; r <- 0 until 8; c <- 0 until 9) {
        val lum0 = lcg(seed * 72 + r * 9 + c)
        val expected =
          if (r >= 1 && r <= fi) {
            if (c == r) lum0 // the transparency hole shows frame 0
            else lcg((seed + r * 131L) * 72 + c) % 254
          } else lum0
        assert(frames(fi)(r * 9 + c) == expected,
          s"seed=$seed frame=$fi r=$r c=$c")
      }
    }
  }

  test("frame 0 hashes identically to the single-frame GIF fixture (p352 recipe)") {
    import spark.implicits._
    val seeds = Seq(0L, 3L, 11L)
    val byId = anim(seeds)
    val still = Multimodal.gifPixelsFromIds(seeds.toDF("doc_id"), "doc_id")
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect().toMap
    for (seed <- seeds) {
      val hashes = VideoFrameHashesExpression.evalArray(byId(seed), 32)
      assert(hashes != null)
      assert(hashes.getLong(0) == DHash64Expression.evalRow(still(seed)).longValue(),
        s"seed=$seed")
    }
  }

  test("extraFrame appends one frame and leaves the shared prefix identical") {
    val seeds = Seq(4L, 8L)
    val base = anim(seeds)
    val ext = anim(seeds, extra = true)
    for (seed <- seeds) {
      val a = GifFrames.frameGrids(base(seed))
      val b = GifFrames.frameGrids(ext(seed))
      assert(b.length == a.length + 1, s"seed=$seed")
      for (i <- a.indices)
        assert(a(i).sameElements(b(i)), s"seed=$seed frame=$i")
    }
  }

  test("maxFrames caps the walk without error") {
    val b = anim(Seq(2L))(2L) // 4 frames
    assert(GifFrames.frameGrids(b, 32).length == 4)
    assert(GifFrames.frameGrids(b, 2).length == 2)
    assert(GifFrames.frameGrids(b, 1).length == 1)
  }

  test("junk, truncation, and structural corruption are null, never a throw") {
    val good = anim(Seq(1L))(1L)
    assert(GifFrames.frameGrids(null) == null)
    assert(GifFrames.frameGrids("notanim:junk".getBytes) == null)
    assert(GifFrames.frameGrids(good.take(5)) == null)       // mid-signature
    assert(GifFrames.frameGrids(good.take(700)) == null)     // mid-GCT
    assert(GifFrames.frameGrids(good.dropRight(1)) == null)  // missing trailer
    // truncation inside a later frame's LZW data
    assert(GifFrames.frameGrids(good.take(good.length - 8)) == null)
    // unknown block type where a frame should start
    val bad = good.clone()
    // find the first image descriptor (0x2c after the 781-byte header+GCT)
    assert((bad(781) & 0xff) == 0x2c)
    bad(781) = 0x7f
    assert(GifFrames.frameGrids(bad) == null)
    // VideoFrameHashesExpression mirrors the null contract and rejects non-GIF
    assert(VideoFrameHashesExpression.evalArray(null, 32) == null)
    assert(VideoFrameHashesExpression.evalArray("RIFFxxxxWEBP".getBytes, 32) == null)
  }

  test("scene cuts flag exactly the transitions whose hashes differ in >= minHamming bits") {
    import spark.implicits._
    val seeds = (0L until 40L)
    val df = Multimodal.gifAnimFromIds(seeds.toDF("doc_id"), "doc_id")
    val got = Multimodal.videoSceneCuts(df, "bytes", minHamming = 4)
      .as[(Long, Int, Long)].collect().toSet
    // recompute expectations straight from the frame-hash expression
    val expected = df.select("media_id", "bytes")
      .as[(Long, Array[Byte])].collect().flatMap { case (id, bytes) =>
        val arr = graft.functions.VideoFrameHashesExpression.evalArray(bytes, 32)
        if (arr == null) Nil
        else (1 until arr.numElements()).flatMap { f =>
          val h = java.lang.Long.bitCount(arr.getLong(f) ^ arr.getLong(f - 1))
          if (h >= 4) Some((id, f, h.toLong)) else None
        }
      }.toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture produced no cuts — threshold miscalibrated")
    // and some transitions must NOT be cuts, or the threshold is vacuous
    val allTransitions = seeds.filter(_ % 10 != 9).map(s => (s % 3 + 1)).sum
    assert(expected.size < allTransitions)
  }

  test("a full-canvas interlaced frame composites identically to sequential") {
    val good = anim(Seq(6L))(6L)
    val frames = GifFrames.frameGrids(good)
    // rebuild frame 0 as an interlaced image: same pixels, row order
    // permuted into the 4-pass layout, interlace flag set
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(9); w16(8); w8(0xf7); w8(0); w8(0)
    (0 until 256).foreach { k => w8(k); w8(k); w8(k) }
    w8(0x2c); w16(0); w16(0); w16(9); w16(8); w8(0x40) // interlaced
    val storageRows = Seq(0, 4, 2, 6, 1, 3, 5, 7) // pass starts 0/4/2/1
    val px = for (y <- storageRows; x <- 0 until 9)
      yield lcg(6L * 72 + y * 9 + x)
    w8(8)
    val codes = 256 +: px :+ 257
    val data = new java.io.ByteArrayOutputStream()
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
    val inter = GifFrames.frameGrids(out.toByteArray)
    assert(inter != null && inter.length == 1)
    assert(inter(0).sameElements(frames(0)))
  }
}
