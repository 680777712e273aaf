package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioFingerprintExpression, WavResampleExpression}
import graft.ops.Multimodal

/** Real PCM resampling: exact duplication up, exact decimation down,
  * byte-exact round trips, fingerprint invariance, and bounded output
  * under hostile rate headers. */
class WavResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rs(b: Array[Byte], rate: Int): Array[Byte] =
    WavResampleExpression.evalBytes(b, rate)

  private def fixture(seeds: Seq[Long], enc: Int = 0): Map[Long, Array[Byte]] = {
    import spark.implicits._
    Multimodal.wavEncodedFromIds(seeds.toDF("doc_id"), "doc_id", enc)
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect().toMap
  }

  test("16k->32k->16k round trip is byte-exact; up-leg equals the duplicate-sample twin") {
    val seeds = (0L until 12L).filter(_ % 10 != 9)
    val base = fixture(seeds)
    val twin2x = fixture(seeds, enc = 3) // fixture's own 32 kHz duplicate-sample form
    for (s <- seeds) {
      val up = rs(base(s), 32000)
      assert(up != null && java.util.Arrays.equals(up, twin2x(s)),
        s"upsample != duplicate-sample twin, seed=$s")
      val back = rs(up, 16000)
      assert(java.util.Arrays.equals(back, base(s)), s"round trip drifted, seed=$s")
    }
  }

  test("decimation picks every k-th frame; fingerprint survives integer-ratio resamples") {
    val seeds = Seq(1L, 2L, 4L)
    val base = fixture(seeds)
    for (s <- seeds) {
      val down = rs(base(s), 8000) // keep frames 0, 2, 4, ...
      assert(down != null)
      // 64 frames of 16-bit mono: frame j of down == frame 2j of base
      for (j <- 0 until 16) {
        assert(down(44 + j * 2) == base(s)(44 + j * 4) &&
          down(44 + j * 2 + 1) == base(s)(44 + j * 4 + 1), s"seed=$s j=$j")
      }
      val f0 = AudioFingerprintExpression.evalLong(base(s), 65536)
      assert(AudioFingerprintExpression.evalLong(rs(base(s), 32000), 65536) == f0)
      assert(AudioFingerprintExpression.evalLong(rs(base(s), 48000), 65536) == f0,
        s"3x upsample drifted, seed=$s")
    }
  }

  test("stereo and 8-bit payloads resample with layout preserved") {
    val seeds = Seq(3L)
    val ster = fixture(seeds, enc = 2)(3L)
    val up = rs(ster, 32000)
    assert(up != null)
    // stereo 16-bit: blockAlign 4; output frame 1 == input frame 0
    for (k <- 0 until 4) assert(up(44 + 4 + k) == ster(44 + k))
    val dep8 = fixture(seeds, enc = 1)(3L)
    val up8 = rs(dep8, 32000)
    assert(up8 != null && up8(34) == 8) // bits preserved
    assert(up8(44) == dep8(44) && up8(45) == dep8(44))
  }

  test("junk, non-PCM and hostile blow-ups are NULL, never a throw") {
    val junk = fixture(Seq(9L))(9L)
    assert(rs(junk, 32000) == null)
    assert(rs(null, 32000) == null)
    val good = fixture(Seq(5L))(5L)
    val float32 = good.clone(); float32(20) = 3
    assert(rs(float32, 32000) == null)
    // a 1 kHz recording long enough that 384 kHz output would exceed
    // the MaxOutFrames cap: 11000 frames * 384 = 4.2M > 2^22
    val frames = 11000
    val hostile = new Array[Byte](44 + frames * 2)
    good.take(44).copyToArray(hostile, 0)
    def w32(i: Int, v: Int): Unit = {
      hostile(i) = v.toByte; hostile(i + 1) = (v >>> 8).toByte
      hostile(i + 2) = (v >>> 16).toByte; hostile(i + 3) = (v >>> 24).toByte
    }
    w32(4, 36 + frames * 2); w32(24, 1000); w32(28, 2000); w32(40, frames * 2)
    assert(rs(hostile, 384000) == null)
    assert(rs(hostile, 2000) != null) // 2x of the same input is fine
  }
}
