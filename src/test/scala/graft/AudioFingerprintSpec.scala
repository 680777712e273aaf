package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AudioFingerprintExpression
import graft.ops.Multimodal

/** The 61-bit energy-delta audio fingerprint: the SAME recording must
  * hash identically across the transcodes a crawl carries (bit depth,
  * channel layout, sample rate), distinct recordings must differ, and
  * hostile bytes must NULL — never throw. */
class AudioFingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fp(b: Array[Byte]): java.lang.Long =
    AudioFingerprintExpression.evalLong(b, 65536)

  private def fixture(seeds: Seq[Long], encoding: Int): Map[Long, Array[Byte]] = {
    import spark.implicits._
    Multimodal.wavEncodedFromIds(seeds.toDF("doc_id"), "doc_id", encoding)
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect().toMap
  }

  test("transcode invariance: 8-bit, stereo, and 2x-resampled twins hash identically") {
    val seeds = (0L until 30L).filter(_ % 10 != 9)
    val base = fixture(seeds, 0)
    val dep8 = fixture(seeds, 1)
    val ster = fixture(seeds, 2)
    val up2x = fixture(seeds, 3)
    for (s <- seeds) {
      val f0 = fp(base(s))
      assert(f0 != null, s"seed=$s")
      assert(fp(dep8(s)) == f0, s"8-bit twin drifted, seed=$s")
      assert(fp(ster(s)) == f0, s"stereo twin drifted, seed=$s")
      assert(fp(up2x(s)) == f0, s"resampled twin drifted, seed=$s")
    }
  }

  test("distinct recordings land far apart; fingerprint uses only bits 0..60") {
    val seeds = (0L until 30L).filter(_ % 10 != 9)
    val base = fixture(seeds, 0)
    val fps = seeds.map(s => fp(base(s)).longValue())
    assert(fps.forall(f => (f >>> 61) == 0L), "bits above 60 must be zero")
    // pairwise: no two different seeds within the Hamming-2 pairing radius
    for (Seq(a, b) <- fps.combinations(2))
      assert(java.lang.Long.bitCount(a ^ b) > 2, "fixture seeds collided")
  }

  test("junk members, truncation, and unsupported formats are NULL, never a throw") {
    val junk = fixture(Seq(9L, 19L), 0)
    assert(fp(junk(9L)) == null && fp(junk(19L)) == null)
    assert(fp(null) == null)
    assert(fp(Array[Byte]()) == null)
    assert(fp("RIFF".getBytes("US-ASCII")) == null)
    val good = fixture(Seq(3L), 0)(3L)
    // truncated mid-header and mid-data
    assert(fp(good.take(11)) == null)
    assert(fp(good.take(20)) == null)
    // data chunk length lies past the buffer -> rejected by the chunk walk
    val lying = good.clone()
    lying(40) = 0x7f.toByte; lying(41) = 0x7f.toByte
    lying(42) = 0x7f.toByte; lying(43) = 0x7f.toByte
    assert(fp(lying) == null)
    // non-PCM fmt code (3 = IEEE float) and 24-bit depth are documented nulls
    val float32 = good.clone(); float32(20) = 3
    assert(fp(float32) == null)
    val b24 = good.clone(); b24(34) = 24
    assert(fp(b24) == null)
    // 9 channels exceeds the overflow-bounding cap
    val ch9 = good.clone(); ch9(22) = 9
    assert(fp(ch9) == null)
  }

  test("short recordings (fewer frames than windows) still fingerprint deterministically") {
    val seeds = Seq(4L)
    val full = fixture(seeds, 0)(4L)
    // rewrite the data length down to 8 frames (16 bytes) in the two
    // RIFF size fields: empty windows get e=0, n=0 and compare as ties
    val short = full.take(44 + 16)
    short(4) = (36 + 16).toByte; short(5) = 0; short(6) = 0; short(7) = 0
    short(40) = 16; short(41) = 0; short(42) = 0; short(43) = 0
    val f = fp(short)
    assert(f != null)
    assert(fp(short) == f)
  }

  test("window assignment is equal-TIME: dropping trailing silence changes late bits only") {
    // sanity on the envelope construction itself: the fingerprint of a
    // signal is a function of its 32 window energies
    val a = fixture(Seq(7L), 0)(7L)
    val f = fp(a)
    assert(f != null)
    // flipping one sample's sign leaves its square -> energies -> hash
    val flipped = a.clone()
    val v = ((flipped(45) << 8) | (flipped(44) & 0xff)).toShort
    val neg = (-v).toShort
    flipped(44) = (neg & 0xff).toByte
    flipped(45) = ((neg >> 8) & 0xff).toByte
    assert(fp(flipped) == f, "sign flip must not change the energy envelope")
  }
}
