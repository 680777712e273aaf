package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioMetaGovExpression, AudioStripMetaExpression}
import graft.ops.Multimodal

/** Audio metadata governance: tag-channel census (ID3v2/ID3v1/
  * LIST-INFO/VORBIS_COMMENT) and redaction with the audio stream
  * byte-identical, FLAC last-flag repair, idempotence, and the
  * unparseable-unchanged contract. */
class AudioMetaGovSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def gov(b: Array[Byte]): (String, Int, Int, Int, Int) = {
    val r = AudioMetaGovExpression.evalRow(b)
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  private def fixture(seeds: Seq[Long]): Map[Long, Array[Byte]] = {
    import spark.implicits._
    Multimodal.audioTaggedFromIds(seeds.toDF("doc_id"), "doc_id")
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect().toMap
  }

  test("census: planted envelopes flagged with exact byte counts; unplanted clean") {
    val byId = fixture(0L until 24L)
    for (id <- 0L until 24L) {
      val (c, v2, v1, cm, meta) = gov(byId(id))
      val planted = (id / 4) % 2 == 0
      (id % 4) match {
        case 0 =>
          assert(c == "wav" && v2 == 0 && v1 == 0)
          assert(cm == (if (planted) 1 else 0), s"id=$id")
          assert(meta == (if (planted) (20 + (id % 6) * 2 + 4).toInt else 0), s"id=$id")
        case 1 =>
          assert(c == "flac" && cm == (if (planted) 1 else 0), s"id=$id")
          assert(meta == (if (planted) (4 + (id % 7) * 3 + 8).toInt else 0), s"id=$id")
        case 2 =>
          assert(c == "mp3", s"id=$id")
          assert(v2 == (if (planted) 1 else 0) && v1 == v2, s"id=$id")
          assert(meta == (if (planted) (10 + (id % 9) + 4 + 128).toInt else 0), s"id=$id")
        case _ =>
          assert((c, v2, v1, cm, meta) == (("unknown", 0, 0, 0, 0)), s"id=$id")
      }
    }
  }

  test("strip: flags gone, audio stream byte-identical, idempotent") {
    val byId = fixture(0L until 24L)
    for (id <- 0L until 24L) {
      val pre = byId(id)
      val post = AudioStripMetaExpression.evalBytes(pre)
      val (c, v2, v1, cm, meta) = gov(post)
      assert(v2 == 0 && v1 == 0 && cm == 0 && meta == 0, s"id=$id")
      if (id % 4 == 3) assert(post eq pre, s"junk must pass through, id=$id")
      else assert(c != "unknown", s"id=$id")
      // idempotent
      assert(java.util.Arrays.equals(
        AudioStripMetaExpression.evalBytes(post), post), s"id=$id")
      if (id % 4 == 0) {
        // the PCM data chunk must be byte-identical: compare the tails
        assert(post.length == 172, s"id=$id")
        assert(pre.takeRight(136).sameElements(post.takeRight(136)), s"id=$id")
      }
      if (id % 4 == 2 && (id / 4) % 2 == 0) {
        // stripped mp3 is exactly the bare frame
        assert(post.length == 4 && (post(0) & 0xff) == 0xff, s"id=$id")
      }
    }
  }

  test("FLAC strip repairs the last-metadata-block flag onto STREAMINFO") {
    val planted = fixture(Seq(1L))(1L) // id 1: flac, (1/4)%2==0 planted
    assert((planted(4) & 0x80) == 0, "fixture: STREAMINFO must not be last pre-strip")
    val post = AudioStripMetaExpression.evalBytes(planted)
    assert(post.length == 42)
    assert((post(4) & 0x80) != 0, "STREAMINFO must carry the last flag post-strip")
    assert((post(4) & 0x7f) == 0, "block type must stay STREAMINFO")
  }

  test("hostile framing: lying sizes and truncations return input unchanged, never throw") {
    val good = fixture(Seq(0L, 1L, 2L))
    for ((_, b) <- good) {
      val rnd = new scala.util.Random(7)
      for (_ <- 0 until 200) {
        val m = b.clone()
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        AudioStripMetaExpression.evalBytes(m) // must not throw
        AudioMetaGovExpression.evalRow(m)
      }
      for (take <- Seq(3, 7, 11, b.length - 1)) {
        AudioStripMetaExpression.evalBytes(b.take(take))
        AudioMetaGovExpression.evalRow(b.take(take))
      }
    }
    // a WAV whose LIST size lies past the buffer: unchanged
    val wav = good(0L).clone()
    val listAt = 12 + 24
    assert(wav(listAt) == 'L')
    wav(listAt + 5) = 0x7f // size jumps past the buffer
    val out = AudioStripMetaExpression.evalBytes(wav)
    assert(out eq wav)
  }
}
