package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GifFrames, VideoFrameHashesExpression, WebpFrames, WebpLuma}
import graft.ops.Multimodal

/** Animated-WebP frame decode: ANMF walk, per-frame VP8L decode,
  * alpha-blend compositing with transparency holes, dispose handling
  * — and the CROSS-CONTAINER identity: the same clip as animated GIF
  * and animated WebP must produce the same frame-grid sequence. */
class WebpFramesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bytesOf(df: org.apache.spark.sql.DataFrame): Map[Long, Array[Byte]] = {
    import spark.implicits._
    df.select("media_id", "bytes").as[(Long, Array[Byte])].collect().toMap
  }

  test("cross-container identity: WebP frame grids equal the GIF fixture's, frame for frame") {
    import spark.implicits._
    val seeds = (0L until 24L)
    val gif = bytesOf(Multimodal.gifAnimFromIds(seeds.toDF("doc_id"), "doc_id"))
    val webp = bytesOf(Multimodal.webpAnimMultiFromIds(seeds.toDF("doc_id"), "doc_id"))
    for (s <- seeds) {
      val g = GifFrames.frameGrids(gif(s))
      val w = WebpFrames.frameGrids(webp(s))
      if (s % 10 == 9) assert(g == null && w == null, s"junk seed=$s")
      else {
        assert(w != null && w.length == g.length, s"seed=$s")
        for (f <- g.indices)
          assert(w(f).sameElements(g(f)), s"seed=$s frame=$f")
        // and through the expression, the hash sequences agree
        val hg = VideoFrameHashesExpression.evalArray(gif(s), 32)
        val hw = VideoFrameHashesExpression.evalArray(webp(s), 32)
        assert(hg.toLongArray().sameElements(hw.toLongArray()), s"seed=$s")
      }
    }
  }

  test("extended cuts: extraFrame appends one frame, shared prefix identical") {
    import spark.implicits._
    val seeds = Seq(4L, 8L)
    val base = bytesOf(Multimodal.webpAnimMultiFromIds(seeds.toDF("doc_id"), "doc_id"))
    val ext = bytesOf(Multimodal.webpAnimMultiFromIds(seeds.toDF("doc_id"), "doc_id",
      extraFrame = true))
    for (s <- seeds) {
      val a = WebpFrames.frameGrids(base(s))
      val b = WebpFrames.frameGrids(ext(s))
      assert(b.length == a.length + 1)
      for (i <- a.indices) assert(a(i).sameElements(b(i)), s"seed=$s frame=$i")
    }
  }

  test("stills decode as one frame; the single-ANMF p363 fixture matches its still hash") {
    import spark.implicits._
    val still = bytesOf(Multimodal.webpVp8lFromIds(Seq(3L).toDF("doc_id"), "doc_id"))(3L)
    val g = WebpFrames.frameGrids(still)
    assert(g != null && g.length == 1)
    assert(g(0).sameElements(WebpLuma.sampleGrid(still)))
    val anim1 = bytesOf(Multimodal.webpAnimFromIds(Seq(3L).toDF("doc_id"), "doc_id"))(3L)
    val g1 = WebpFrames.frameGrids(anim1)
    assert(g1 != null && g1.length == 1)
    assert(g1(0).sameElements(WebpLuma.sampleGrid(anim1)))
  }

  test("maxFrames caps the ANMF walk; junk and truncation are null, never a throw") {
    import spark.implicits._
    val b = bytesOf(Multimodal.webpAnimMultiFromIds(Seq(2L).toDF("doc_id"), "doc_id"))(2L)
    assert(WebpFrames.frameGrids(b, 2).length == 2)
    assert(WebpFrames.frameGrids(null) == null)
    assert(WebpFrames.frameGrids("RIFFxxxxWEBP".getBytes) == null)
    assert(WebpFrames.frameGrids(b.take(30)) == null)
    assert(WebpFrames.frameGrids(b.dropRight(3)) == null)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val m = b.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      WebpFrames.frameGrids(m) // must not throw
    }
  }
}
