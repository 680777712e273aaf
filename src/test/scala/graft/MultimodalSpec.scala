package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.ops.Multimodal

/** Multimodal plumbing: schema, batched decode, resample, frame sampling.
  * The decode itself is a documented deterministic stub; everything
  * around it (typed Dataset, mapPartitions batching, explode shape) is
  * the real scale path. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dhash64: bit semantics, top-down parity, junk/truncation to NULL") {
    import graft.functions.DHash64Expression.evalRow
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    // build a 9x8 24bpp BMP from a luma grid (top-origin y)
    def bmp(lum: (Int, Int) => Int, topDown: Boolean): Array[Byte] = {
      val stride = 28
      val out = new Array[Byte](54 + stride * 8)
      Array[Byte]('B', 'M').copyToArray(out, 0)
      le32(out.length).copyToArray(out, 2)
      le32(54).copyToArray(out, 10)
      le32(40).copyToArray(out, 14)
      le32(9).copyToArray(out, 18)
      le32(if (topDown) -8 else 8).copyToArray(out, 22)
      le16(1).copyToArray(out, 26)
      le16(24).copyToArray(out, 28)
      for (fr <- 0 until 8; x <- 0 until 9) {
        val y = if (topDown) fr else 7 - fr
        val v = lum(x, y).toByte
        val p = 54 + fr * stride + x * 3
        out(p) = v; out(p + 1) = v; out(p + 2) = v
      }
      out
    }
    // strictly increasing luma left-to-right => all 64 bits set
    val allUp = bmp((x, _) => x * 20, topDown = false)
    assert(evalRow(allUp) == -1L)
    // strictly decreasing => no bits set
    assert(evalRow(bmp((x, _) => 200 - x * 20, topDown = false)) == 0L)
    // one rising edge at column 4 on every row => bits c=4 of each row
    val oneEdge = bmp((x, _) => if (x > 4) 90 else 10, topDown = false)
    val want = (0 until 8).map(r => 1L << (r * 8 + 4)).reduce(_ | _)
    assert(evalRow(oneEdge) == want)
    // top-down storage of the same visual image hashes identically
    assert(evalRow(bmp((x, y) => (x * 13 + y * 29) % 256, topDown = true)) ==
      evalRow(bmp((x, y) => (x * 13 + y * 29) % 256, topDown = false)))
    // junk, truncated pixels, wrong bpp -> NULL, never a throw
    assert(evalRow("notabitmap".getBytes("US-ASCII")) == null)
    assert(evalRow(allUp.take(100)) == null)
    val wrongBpp = allUp.clone(); le16(32).copyToArray(wrongBpp, 28)
    assert(evalRow(wrongBpp) == null)
    assert(evalRow(null) == null)
    // hostile headers that used to bypass the bounds guard: height =
    // Int.MinValue survives the != 0 gate and math.abs keeps it
    // negative; and w,h both near 2^31 overflow stride*h past Long —
    // either way the pixel loop would read garbage indices. NULL, no
    // throw (one crafted ~54-byte record must not kill a crawl task).
    val minH = allUp.clone(); le32(Int.MinValue).copyToArray(minH, 22)
    assert(evalRow(minH) == null)
    val hugeWh = allUp.clone()
    le32(0x7ffffff0).copyToArray(hugeWh, 18)
    le32(0x7ffffff0).copyToArray(hugeWh, 22)
    assert(evalRow(hugeWh) == null)
    val hugeW = allUp.clone(); le32(Int.MaxValue).copyToArray(hugeW, 18)
    assert(evalRow(hugeW) == null)
    // negative claimed pixel-data offset must also triage clean
    val negOff = allUp.clone(); le32(-54).copyToArray(negOff, 10)
    assert(evalRow(negOff) == null)
  }

  test("audio_pcm_stats: exact sums, clip count, bounded window, hostile to NULL") {
    import graft.functions.AudioPcmStatsExpression.evalRow
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def wav(ch: Int, samples: Seq[Int], fmtCode: Int = 1, bits: Int = 16): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      Array[Byte]('R', 'I', 'F', 'F').copyToArray(out, 0)
      le32(36 + dataLen).copyToArray(out, 4)
      Array[Byte]('W', 'A', 'V', 'E', 'f', 'm', 't', ' ').copyToArray(out, 8)
      le32(16).copyToArray(out, 16)
      le16(fmtCode).copyToArray(out, 20)
      le16(ch).copyToArray(out, 22)
      le32(16000).copyToArray(out, 24)
      le32(16000 * ch * 2).copyToArray(out, 28)
      le16(ch * 2).copyToArray(out, 32)
      le16(bits).copyToArray(out, 34)
      Array[Byte]('d', 'a', 't', 'a').copyToArray(out, 36)
      le32(dataLen).copyToArray(out, 40)
      samples.zipWithIndex.foreach { case (v, j) =>
        le16(v & 0xffff).copyToArray(out, 44 + j * 2)
      }
      out
    }
    // mono, 2 frames: sum_sq = 9 + 16 = 25, peak 4
    val r = evalRow(wav(1, Seq(3, -4)), 4096)
    assert(r.getInt(0) == 16000 && r.getInt(1) == 1 && r.getLong(2) == 2L &&
      r.getInt(3) == 2 && r.getLong(4) == 25L && r.getInt(5) == 4 &&
      r.getInt(6) == 0)
    // full-scale samples count as clipped, both polarities
    val c = evalRow(wav(1, Seq(32767, -32768, 0)), 4096)
    assert(c.getLong(4) == 32767L * 32767 + 32768L * 32768 &&
      c.getInt(5) == 32768 && c.getInt(6) == 2)
    // stereo frame accounting: 4 samples = 2 frames
    val st = evalRow(wav(2, Seq(1, 2, 3, 4)), 4096)
    assert(st.getInt(1) == 2 && st.getLong(2) == 2L && st.getLong(4) == 30L)
    // bounded window: maxFrames=1 measures only the first frame
    val b1 = evalRow(wav(1, Seq(3, -4)), 1)
    assert(b1.getInt(3) == 1 && b1.getLong(4) == 9L && b1.getLong(2) == 2L)
    // non-PCM fmt code, non-16-bit, junk, null -> NULL
    assert(evalRow(wav(1, Seq(1), fmtCode = 3), 4096) == null)
    assert(evalRow(wav(1, Seq(1), bits = 8), 4096) == null)
    assert(evalRow("notawav".getBytes("US-ASCII"), 4096) == null)
    assert(evalRow(null, 4096) == null)
  }

  test("hashNearDups: planted twin found, 3-bit spread found, 4-bit pair excluded") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, 0L),                                  // base
      (2L, 1L << 5),                             // hamming 1 vs base
      (3L, (1L << 0) | (1L << 16) | (1L << 32)), // 3 bits across 3 bands
      (4L, (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)), // +band-3 bit
      (5L, -1L))                                 // far from everything
      .toDF("media_id", "dhash")
    val got = graft.ops.Dedup.hashNearDups(rows, "media_id", "dhash")
      .orderBy("a", "b")
      .select("a", "b", "hamming").as[(Long, Long, Long)].collect().toSeq
    // (1,2)=1; (1,3)=3 via the untouched band 3; (3,4)=1; the
    // hamming-4 (2,3) candidate verifies and is EXCLUDED by threshold
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 3L), (3L, 4L, 1L)))
  }

  test("hashNearDups threshold-sized banding: h=0 exact groups only; h=2 three-chunk completeness") {
    val s = spark
    import s.implicits._
    // h = 0: ONE band = the full hash — only exact-equal hashes pair
    val exact = Seq((1L, 42L), (2L, 42L), (3L, 42L | (1L << 63)))
      .toDF("media_id", "dhash")
    val g0 = graft.ops.Dedup.hashNearDups(exact, "media_id", "dhash", maxHamming = 0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(g0 == Set((1L, 2L)))
    // h = 2: chunks are bits [0,21), [21,42), [42,64). A 2-bit pair
    // straddling chunks 0 and 1 is found via untouched chunk 2; a
    // 3-bit pair hitting ALL three chunks never shares a band — and is
    // correctly over-threshold anyway
    val rows = Seq(
      (1L, 0L),
      (2L, (1L << 3) | (1L << 25)),              // bits in chunks 0,1 — hamming 2
      (3L, (1L << 3) | (1L << 25) | (1L << 50))) // one bit per chunk vs 1 — hamming 3
      .toDF("media_id", "dhash")
    val g2 = graft.ops.Dedup.hashNearDups(rows, "media_id", "dhash", maxHamming = 2)
      .select("a", "b", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(g2 == Set((1L, 2L, 2L), (2L, 3L, 1L)))
  }

  private lazy val media = Multimodal.mediaFromDocuments(
    spark, Tables(spark, "/root/testdata/sf0.001", "documents"))

  test("media table has the three kinds and binary payloads") {
    val kinds = media.toDF().groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == 500)
  }

  test("feature extraction is deterministic, 16-dim, normalized") {
    val f1 = Multimodal.extractFeatures(media).filter(_.media_id == 0).head()
    val f2 = Multimodal.extractFeatures(media).filter(_.media_id == 0).head()
    assert(f1.features.toSeq == f2.features.toSeq)
    assert(f1.features.length == 16)
    assert(math.abs(f1.features.sum - 1.0f) < 1e-3)
    assert(f1.n_bytes > 0 && f1.checksum != 0L)
  }

  /** Render a half-black / half-white RGB image and encode via ImageIO. */
  private def makeImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  test("ImageIoDecoder decodes real PNG and BMP: width, height, luminance histogram") {
    import spark.implicits._
    for (format <- Seq("png", "bmp")) {
      val bytes = makeImage(40, 20, format)
      val rows = Seq(Multimodal.MediaRow(1L, "image", bytes, 0, 0, 0)).toDS()
      val f = Multimodal.extractFeatures(rows, Multimodal.ImageIoDecoder).head()
      assert(f.features.length == 18, format)
      assert(f.features(0) == 40f && f.features(1) == 20f, s"$format decoded dims")
      val hist = f.features.drop(2)
      // half the pixels are black (luma 0 → bin 0), half white (255 → bin 15)
      assert(math.abs(hist(0) - 0.5f) < 1e-6, s"$format black bin")
      assert(math.abs(hist(15) - 0.5f) < 1e-6, s"$format white bin")
      assert(hist.slice(1, 15).forall(_ == 0f), format)
    }
  }

  test("ImageIoDecoder falls back to the stub for non-image kinds and junk bytes") {
    import spark.implicits._
    val junk = "not an image".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", junk, 0, 0, 16000),
      Multimodal.MediaRow(2L, "image", junk, 0, 0, 0)).toDS()
    val fs = Multimodal.extractFeatures(rows, Multimodal.ImageIoDecoder)
      .collect().sortBy(_.media_id)
    val stub = Multimodal.StubDecoder.decode("audio", junk)
    assert(fs(0).features.toSeq == stub.toSeq) // non-image kind → stub
    assert(fs(1).features.toSeq == stub.toSeq) // undecodable image → stub
  }

  test("resample shrinks payload by the factor") {
    val before = media.filter(_.media_id == 0).head().bytes.length
    val after = Multimodal.resample(media, 4).filter(_.media_id == 0).head().bytes.length
    assert(after == (before + 3) / 4)
  }

  test("frame sampling explodes video rows into stride-spaced frames") {
    val frames = Multimodal.sampleFrames(media, frameSize = 32, stride = 2)
    val one = frames.filter("media_id = 2").collect() // doc 2 → kind video
    assert(one.nonEmpty)
    assert(one.map(_.getInt(1)).forall(_ % 2 == 0))
  }

  test("imageHeaderScan recovers dims from ENCODER-produced headers, not just hand-built ones") {
    import spark.implicits._
    // real javax.imageio encoder output for png/bmp/gif — the sniffer
    // must agree with the JDK's own containers, proving the parser
    // against genuine files rather than the harness's synthesized bytes
    // jpg exercises the segment-skipping SOF scan (real encoder output
    // leads with APP0/DQT/DHT segments before the SOF marker)
    val rows = Seq("png", "bmp", "gif", "jpg").zipWithIndex.map { case (fmt, i) =>
      (i.toLong, if (fmt == "jpg") "jpeg" else fmt, makeImage(40 + i, 20 + i, fmt))
    }
    val df = rows.toDF("media_id", "expected", "bytes")
    val out = Multimodal.imageHeaderScan(df, "bytes")
      .select("media_id", "expected", "format", "width", "height")
      .as[(Long, String, String, Int, Int)].collect().sortBy(_._1)
    out.foreach { case (i, expected, fmt, w, h) =>
      assert(fmt == expected, s"format sniff for $expected")
      assert(w == 40 + i && h == 20 + i, s"dims for $expected")
    }
    // junk and truncated payloads triage to unknown, never throw
    val junk = Seq((0L, "x".getBytes), (1L, Array[Byte](0x89.toByte, 'P')),
      (2L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)))
      .toDF("media_id", "bytes")
    val j = Multimodal.imageHeaderScan(junk, "bytes")
      .select("format", "width").as[(String, Int)].collect()
    assert(j.forall(r => r._1 == "unknown" && r._2 == -1))
  }

  test("webp/tiff sniff: all three VP8 flavors + both TIFF byte orders; junk unknown") {
    import spark.implicits._
    // the fixture builder emits REAL containers; ids chosen to hit
    // every id % 6 slot with distinct dims
    val ids = (0L to 11L).toDF("doc_id")
    val out = Multimodal.imageHeaderScan(
        Multimodal.webpTiffBytesFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "format", "width", "height")
      .as[(Long, String, Int, Int)].collect().sortBy(_._1)
    out.foreach { case (id, fmt, w, h) =>
      val expected = (id % 6) match {
        case 0 | 1 | 2 => "webp"
        case 3 | 4     => "tiff"
        case _         => "unknown"
      }
      assert(fmt == expected, s"format for id=$id")
      if (expected == "unknown") assert(w == -1 && h == -1)
      else assert(w == (id % 640 + 32).toInt && h == (id % 480 + 32).toInt,
        s"dims for id=$id ($fmt)")
    }
    // truncated WEBP/TIFF prefixes triage to unknown, never throw
    val junk = Seq(
      (0L, "RIFF1234WEBP".getBytes("US-ASCII")),
      (1L, "RIFF1234WEBPVP8 ".getBytes("US-ASCII")),
      (2L, Array[Byte](0x49, 0x49, 0x2a, 0)),
      (3L, Array[Byte](0x4d, 0x4d, 0, 0x2a, 0, 0, 0, 99)),
      // hostile TIFF: IFD offset near Int.MaxValue — `ifd + 2` once
      // wrapped negative and passed the bounds check; must triage clean
      (4L, Array[Byte](0x49, 0x49, 0x2a, 0,
        0xfe.toByte, 0xff.toByte, 0xff.toByte, 0x7f)))
      .toDF("media_id", "bytes")
    val j = Multimodal.imageHeaderScan(junk, "bytes")
      .select("format", "width").as[(String, Int)].collect()
    assert(j.forall(r => r._1 == "unknown" && r._2 == -1))
  }

  test("isobmff sniff: avif/heic brands, compat-list dispatch, largest ispe, largesize; junk unknown") {
    import spark.implicits._
    val ids = (0L to 11L).toDF("doc_id")
    val out = Multimodal.imageHeaderScan(
        Multimodal.isobmffBytesFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "format", "width", "height")
      .as[(Long, String, Int, Int)].collect().sortBy(_._1)
    out.foreach { case (id, fmt, w, h) =>
      val expected = (id % 6) match {
        case 1 => "heic"
        case 5 => "unknown"
        case _ => "avif" // 0 major, 2 compat-list, 3 two-ispe, 4 largesize
      }
      assert(fmt == expected, s"format for id=$id (got $fmt)")
      if (expected == "unknown") assert(w == -1 && h == -1)
      else assert(w == (id % 640 + 32).toInt && h == (id % 480 + 32).toInt,
        s"dims for id=$id ($fmt): $w x $h")
    }
    // truncated/hostile ISOBMFF prefixes triage clean, never throw
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val brandsNoMeta = be32(16) ++ "ftypavif".getBytes("US-ASCII") ++ be32(0)
    val unknownBrands = be32(16) ++ "ftypzzzz".getBytes("US-ASCII") ++ be32(0)
    val lyingSize = be32(999) ++ "ftypavif".getBytes("US-ASCII") ++ be32(0)
    val junk = Seq(
      (0L, "ab".getBytes("US-ASCII") ++ "ftyp".getBytes("US-ASCII")),
      (1L, brandsNoMeta), // brands ok, no meta: avif with -1 dims
      (2L, unknownBrands),
      (3L, lyingSize)) // ftyp size past the buffer: hands off
      .toDF("media_id", "bytes")
    val j = Multimodal.imageHeaderScan(junk, "bytes")
      .select("media_id", "format", "width").as[(Long, String, Int)].collect()
      .sortBy(_._1)
    assert(j(0)._2 == "unknown")
    assert(j(1)._2 == "avif" && j(1)._3 == -1)
    assert(j(2)._2 == "unknown")
    assert(j(3)._2 == "unknown")
  }

  test("audio_meta: WAV chunk walk (incl. JUNK chunk), FLAC STREAMINFO, MP3 frame (incl. ID3)") {
    import spark.implicits._
    val ids = (0L to 23L).toDF("doc_id")
    val out = Multimodal.audioHeaderScan(
        Multimodal.audioBytesFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "format", "channels", "sample_rate", "bits_per_sample")
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1)
    out.foreach { case (id, fmt, ch, rate, bits) =>
      val expCh = ((id / 4) % 2 + 1).toInt
      (id % 4) match {
        case 0 =>
          assert(fmt == "wav" && ch == expCh &&
            rate == ((id % 12 + 2) * 4000).toInt &&
            bits == (((id / 4) % 4 + 1) * 8).toInt, s"wav id=$id got ($fmt,$ch,$rate,$bits)")
        case 1 =>
          assert(fmt == "flac" && ch == expCh &&
            rate == ((id % 12 + 2) * 4000).toInt &&
            bits == (id % 24 + 8).toInt, s"flac id=$id got ($fmt,$ch,$rate,$bits)")
        case 2 =>
          val expRate = (id % 3) match {
            case 0 => 44100; case 1 => 48000; case _ => 32000
          }
          assert(fmt == "mp3" && ch == expCh && rate == expRate &&
            bits == -1, s"mp3 id=$id got ($fmt,$ch,$rate,$bits)")
        case _ =>
          assert(fmt == "unknown" && ch == -1 && rate == -1 && bits == -1)
      }
    }
    // truncated/hostile payloads triage to unknown, never throw
    val junk = Seq(
      (0L, "RIFF1234WAVE".getBytes("US-ASCII")),
      (1L, "RIFF1234WAVEfmt ".getBytes("US-ASCII")),
      (2L, "fLaC".getBytes("US-ASCII")),
      (3L, Array[Byte]()),
      // ID3 envelope claiming a size past the buffer end
      (4L, "ID3".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f)),
      // frame sync with reserved version+layer bits
      (5L, Array[Byte](0xff.toByte, 0xe0.toByte, 0x00, 0x00)),
      // frame sync with reserved sample-rate index
      (6L, Array[Byte](0xff.toByte, 0xfb.toByte, 0x9c.toByte, 0x40)),
      // hostile WAV: a JUNK chunk claiming size 0x7FFFFFF0 in a ~30-byte
      // payload — `p + 8 + sz` once wrapped Int-negative and aliased
      // back into the buffer (ArrayIndexOutOfBounds); must triage clean
      (7L, "RIFF$\u0000\u0000\u0000WAVEJUNK".getBytes("US-ASCII") ++
        Array[Byte](0xf0.toByte, 0xff.toByte, 0xff.toByte, 0x7f) ++
        Array.fill[Byte](10)(0)))
      .toDF("media_id", "bytes")
    val j = Multimodal.audioHeaderScan(junk, "bytes")
      .select("format", "channels").as[(String, Int)].collect()
    assert(j.forall(r => r._1 == "unknown" && r._2 == -1))
  }

  test("video_meta: MP4 tkhd v0/v1 + leading free box, WebM, unknown-size Matroska; junk unknown") {
    import spark.implicits._
    val ids = (0L to 11L).toDF("doc_id")
    val out = Multimodal.videoHeaderScan(
        Multimodal.videoBytesFromIds(ids, "doc_id"), "bytes")
      .select("media_id", "format", "width", "height")
      .as[(Long, String, Int, Int)].collect().sortBy(_._1)
    out.foreach { case (id, fmt, w, h) =>
      val expected = (id % 6) match {
        case 0 | 1 | 2 => "mp4"
        case 3         => "webm"
        case 4         => "mkv"
        case _         => "unknown"
      }
      assert(fmt == expected, s"format for id=$id got $fmt")
      if (expected == "unknown") assert(w == -1 && h == -1)
      else assert(w == (id % 640 + 32).toInt && h == (id % 480 + 32).toInt,
        s"dims for id=$id ($fmt): got ($w,$h)")
    }
    // truncated/hostile payloads triage to unknown, never throw
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val junk = Seq(
      // bare ftyp, no moov
      (0L, be32(16) ++ "ftypisom".getBytes("US-ASCII") ++ be32(0)),
      // hostile box size 0xFFFFFFF0 (reads as huge unsigned; `p + sz`
      // in Int would wrap) — must compare in Long and triage clean
      (1L, be32(16) ++ "ftypisom".getBytes("US-ASCII") ++ be32(0) ++
        Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xf0.toByte) ++
        "moov".getBytes("US-ASCII")),
      // largesize marker (size==1) with a truncated 64-bit field
      (2L, be32(16) ++ "ftypisom".getBytes("US-ASCII") ++ be32(0) ++
        be32(1) ++ "moov".getBytes("US-ASCII") ++ Array[Byte](0, 0)),
      // moov/trak present but tkhd truncated before the dims
      (3L, be32(16) ++ "ftypisom".getBytes("US-ASCII") ++ be32(0) ++
        be32(32) ++ "moov".getBytes("US-ASCII") ++
        be32(24) ++ "trak".getBytes("US-ASCII") ++
        be32(16) ++ "tkhd".getBytes("US-ASCII") ++ be32(0) ++ be32(0)),
      // EBML magic alone
      (4L, Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte)),
      // EBML header whose size vint claims 2^35 bytes
      (5L, Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte,
        0x0c, 0, 0, 0, 0)),
      // zero first byte where a vint ID must start (invalid: len > 8)
      (6L, Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte, 0x84.toByte,
        0, 0, 0, 0)),
      (7L, Array[Byte]()))
      .toDF("media_id", "bytes")
    val j = Multimodal.videoHeaderScan(junk, "bytes")
      .select("format", "width").as[(String, Int)].collect()
    assert(j.forall(r => r._1 == "unknown" && r._2 == -1), j.mkString(","))
  }
}
