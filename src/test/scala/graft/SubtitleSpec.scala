package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String
import graft.functions.SubtitleCuesExpression

/** SRT/WebVTT cue extraction: both wire formats, short timestamps,
  * cue settings, NOTE blocks, malformed-cue skip, caps, junk null. */
class SubtitleSpec extends AnyFunSuite {

  private def cues(s: String): Seq[(Int, Long, Long, String)] = {
    val arr = SubtitleCuesExpression.evalArray(UTF8String.fromString(s))
    if (arr == null) Nil
    else (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4)
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getUTF8String(3).toString)
    }
  }

  test("SRT: index lines, comma millis, multi-line text preserved") {
    val srt = "1\n00:00:01,500 --> 00:00:03,000\nhello\nworld\n\n" +
      "2\n00:01:00,000 --> 00:01:02,250\nsecond cue\n"
    assert(cues(srt) == Seq((0, 1500L, 3000L, "hello\nworld"),
      (1, 60000L, 62250L, "second cue")))
  }

  test("WebVTT: magic, dot millis, identifiers, NOTE blocks, settings after arrow") {
    val vtt = "WEBVTT\n\nNOTE a comment\nstill the comment\n\n" +
      "intro\n00:00:05.000 --> 00:00:06.000 align:start line:0\nhi there\n\n" +
      "01:00.500 --> 01:02.000\nshort form\n"
    assert(cues(vtt) == Seq((0, 5000L, 6000L, "hi there"),
      (1, 60500L, 62000L, "short form")))
  }

  test("malformed cues are skipped; the stream continues") {
    val srt = "1\n00:00:xx,000 --> 00:00:02,000\nbad\n\n" +
      "2\n00:00:03,000 --> 00:00:04,000\ngood\n\n" +
      "3\n00:00:05,000 --> 00:00:04,000\nend-before-start\n\n" +
      "4\n00:00:09,00 --> 00:00:10,000\ntwo-digit millis\n"
    assert(cues(srt) == Seq((0, 3000L, 4000L, "good")))
  }

  test("junk prose, empty input, and cue-less payloads are null") {
    assert(cues("just some prose with no timestamps") == Nil)
    assert(cues("") == Nil)
    assert(cues("WEBVTT\n\nNOTE only a comment\n") == Nil)
    assert(SubtitleCuesExpression.evalArray(null) == null)
  }

  test("cue-count cap bounds hostile payloads") {
    val bomb = (1 to 10000).map(k =>
      s"$k\n00:00:01,000 --> 00:00:02,000\nc$k\n").mkString("\n")
    assert(cues(bomb).length == SubtitleCuesExpression.MaxCues)
  }

  test("timestamp parser: bounds and formats") {
    import SubtitleCuesExpression.parseTs
    assert(parseTs("01:02:03,456") == 3723456L)
    assert(parseTs("01:02:03.456") == 3723456L)
    assert(parseTs("02:03.456") == 123456L)
    assert(parseTs("00:60:00,000") == -1L) // minutes bound
    assert(parseTs("00:00:61,000") == -1L)
    assert(parseTs("00:00:01,1000") == -1L)
    assert(parseTs("garbage") == -1L)
    assert(parseTs("10:00:00,000") == 36000000L)
  }
}
