package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioMetaExpression, ImageDimsExpression, RobotsMatchExpression, UrlNormalizeExpression, VideoMetaExpression}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic fuzz over the never-kill-the-task surfaces: the media
  * header sniffers must return well-formed triage tuples on ANY byte
  * sequence (a 100 TB crawl feeds them adversarial junk at volume —
  * one uncaught ArrayIndexOutOfBounds is a dead stage), robots_match
  * must agree with an independent regex-translated oracle on a
  * wildcard-dense alphabet, and url_normalize must stay total and
  * idempotent on junk. Seeded Random: the same 60k+ cases every run —
  * a failure reproduces, never flakes. */
class TriageFuzzSpec extends AnyFunSuite {

  // magic prefixes that reach the deep parser branches: random tails
  // behind a valid magic fuzz the field/offset arithmetic, not just
  // the dispatch
  private val magics: Seq[Array[Byte]] = Seq(
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
    "GIF89a".getBytes("US-ASCII"),
    "BM".getBytes("US-ASCII"),
    "RIFF1234WEBPVP8 ".getBytes("US-ASCII"),
    "RIFF1234WEBPVP8L".getBytes("US-ASCII"),
    "RIFF1234WEBPVP8X".getBytes("US-ASCII"),
    Array('I', 'I', 0x2a, 0x00).map(_.toByte),
    Array('M', 'M', 0x00, 0x2a).map(_.toByte),
    Array(0xff, 0xd8, 0xff).map(_.toByte),
    "RIFF1234WAVE".getBytes("US-ASCII"),
    "fLaC".getBytes("US-ASCII"),
    "ID3".getBytes("US-ASCII"),
    Array(0xff, 0xfb).map(_.toByte),
    // ISO-BMFF: a size+ftyp header, then random boxes
    Array(0, 0, 0, 16).map(_.toByte) ++ "ftypisom".getBytes("US-ASCII"),
    // EBML magic
    Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte))

  test("media sniffers: total and well-formed over 60k random/magic-prefixed payloads") {
    val rnd = new java.util.Random(42)
    (1 to 20000).foreach { i =>
      val n = rnd.nextInt(97)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      if (i % 3 != 0) {
        val m = magics(rnd.nextInt(magics.length))
        System.arraycopy(m, 0, b, 0, math.min(m.length, n))
      }
      val im = ImageDimsExpression.sniff(b)
      assert(im._1 != null && (im._1 != "unknown" || (im._2 == -1 && im._3 == -1)))
      val au = AudioMetaExpression.sniff(b)
      assert(au._1 != null && (au._1 != "unknown" || au._2 == -1))
      val vi = VideoMetaExpression.sniff(b)
      // video guarantees MORE than image/audio: a recognized container
      // only returns with positive dims, unknown always carries -1s
      assert((vi._1 == "unknown" && vi._2 == -1 && vi._3 == -1) ||
        (vi._1 != "unknown" && vi._2 > 0 && vi._3 > 0), vi)
    }
    // null is a row value too
    assert(ImageDimsExpression.sniff(null)._1 == "unknown")
    assert(AudioMetaExpression.sniff(null)._1 == "unknown")
    assert(VideoMetaExpression.sniff(null)._1 == "unknown")
  }

  /** Independent oracle: translate the RFC 9309 pattern to a Java
    * regex — literal segments quoted, '*' → ".*", trailing '$' →
    * full-match, otherwise prefix-match via lookingAt. */
  private def regexOracle(path: String, pattern: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val body = p.split("\\*", -1)
      .map(seg => if (seg.isEmpty) "" else java.util.regex.Pattern.quote(seg))
      .mkString(".*")
    val re = java.util.regex.Pattern.compile(body, java.util.regex.Pattern.DOTALL)
    val m = re.matcher(path)
    if (anchored) m.matches() else m.lookingAt()
  }

  test("robots_match agrees with a regex-translated oracle on 40k wildcard-dense cases") {
    val rnd = new java.util.Random(7)
    val pathAb = "ab/$x".toCharArray
    val patAb = "ab/$*".toCharArray
    (1 to 40000).foreach { _ =>
      val path = Array.fill(rnd.nextInt(17))(pathAb(rnd.nextInt(pathAb.length))).mkString
      val pattern = Array.fill(rnd.nextInt(13))(patAb(rnd.nextInt(patAb.length))).mkString
      val got = RobotsMatchExpression.matchesBytes(
        path.getBytes("UTF-8"), pattern.getBytes("UTF-8"))
      val want = regexOracle(path, pattern)
      assert(got == want, s"path='$path' pattern='$pattern' got=$got want=$want")
    }
  }

  test("url_normalize: total and idempotent over 20k junk strings") {
    val rnd = new java.util.Random(11)
    val alpha = "abzAZ09-._~%?#:/&=+,;@[]!$'()* \té中".toCharArray
    (1 to 20000).foreach { i =>
      val s0 = Array.fill(rnd.nextInt(40))(alpha(rnd.nextInt(alpha.length))).mkString
      val s = if (i % 2 == 0) "http://" + s0 else s0
      val once = UrlNormalizeExpression.evalUtf8(UTF8String.fromString(s))
      assert(once != null)
      val twice = UrlNormalizeExpression.evalUtf8(once)
      assert(once == twice, s"not idempotent on '$s': '$once' -> '$twice'")
    }
  }
}
