package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata, processed in batched
  * per-partition passes (the Scala analogue of `mapInPandas`). The Spark
  * side — schema, partitioning, batch iteration, feature schema — is
  * real and tested. Codecs plug in behind [[Multimodal.MediaDecoder]]:
  * [[Multimodal.ImageIoDecoder]] is a REAL image decoder (JDK
  * `javax.imageio`, PNG/BMP/GIF); audio/video remain a clearly-marked
  * deterministic STUB (this container has no audio/video libraries).
  */
object Multimodal {

  /** A media row: payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String,           // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      features: Array[Float]) // decoder-derived embedding

  /** The codec seam: the ONE point a real deployment swaps for JNI/native
    * codecs. Implementations are objects (serialize as a class reference,
    * no closure-captured state shipped per task). */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): Array[Float]
  }

  /** ===== STUB: deterministic fake decoder =====
    * For audio/video (this container has no codecs) and as the default.
    * The fake derives a 16-dim byte-histogram feature — deterministic,
    * content-sensitive, schema-identical to a real decoder's output, so
    * every downstream stage exercises the true code path. */
  object StubDecoder extends MediaDecoder {
    override def decode(kind: String, bytes: Array[Byte]): Array[Float] = decodeStub(bytes)
  }

  /** REAL image decode via the JDK's built-in `javax.imageio` (PNG, BMP,
    * GIF — no external codecs required, works offline): features =
    * [width, height, 16-bin luminance histogram (normalized)]. Non-image
    * kinds and undecodable payloads fall back to the stub, so mixed-kind
    * corpora run one code path. Decode happens inside the same batched
    * per-partition pass — the executor-side shape a JNI codec needs. */
  object ImageIoDecoder extends MediaDecoder {
    // never spill decode scratch to executor-local disk
    javax.imageio.ImageIO.setUseCache(false)

    override def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      if (kind != "image") return StubDecoder.decode(kind, bytes)
      // NonFatal, not just IOException: hostile/malformed image bytes can
      // surface RuntimeExceptions from codec plugins (IndexOutOfBounds,
      // IllegalArgument…) and a mixed-kind corpus must not kill the task
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return StubDecoder.decode(kind, bytes)
      val w = img.getWidth; val h = img.getHeight
      val hist = new Array[Float](16)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // integer Rec.601 luma; >>4 buckets 0..255 into 16 bins
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          hist(lum >> 4) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(w * h, 1).toFloat
      Array(w.toFloat, h.toFloat) ++ hist.map(_ / n)
    }
  }

  private[ops] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Batched feature extraction: one pass per partition, constant memory
    * per batch — scales with partition count, never collects. */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        var crc = 0L
        r.bytes.foreach(b => crc = crc * 31 + (b & 0xff))
        MediaFeatures(r.media_id, r.kind, r.bytes.length, crc,
          decoder.decode(r.kind, r.bytes))
      }
    }
  }

  /** "Resize": deterministic byte-domain downsample keeping every k-th
    * byte (stands in for a pixel resample; plumbing-faithful). */
  def resample(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = r.bytes.indices.collect { case i if i % factor == 0 => r.bytes(i) }.toArray
        r.copy(bytes = out, width = math.max(r.width / factor, 1),
          height = math.max(r.height / factor, 1))
      }
    }
  }

  /** "Frame sampling" for video-kind rows: split payload into fixed-size
    * frames, emit every strideth frame as its own row (explode shape). */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.bytes.grouped(frameSize).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (frame, i) => (r.media_id, i, frame) }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Build a deterministic media table from the documents fixture (text
    * bytes as payload) — the harness input for the multimodal path. */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (col("doc_id") % 640 + 32).cast("int").as("width"),
      (col("doc_id") % 480 + 32).cast("int").as("height"),
      lit(16000).as("sample_rate"))
      .as[MediaRow]
  }

  /** HEADER TRIAGE: container format + CLAIMED dimensions from the
    * first bytes only ([[graft.functions.ImageDimsExpression]] — PNG /
    * GIF / BMP / JPEG-SOF magic dispatch, junk → ("unknown", −1, −1)).
    * The 100 TB point: a corpus triage pass ("what formats, what
    * resolutions, what's junk") must not DECODE every payload —
    * [[ImageIoDecoder]] reads every pixel, this reads ≤ a few dozen
    * bytes per row, map-only. Appends format/width/height. */
  def imageHeaderScan(df: DataFrame, bytesCol: String): DataFrame = {
    val dims = graft.functions.MediaFunctions.image_dims(col(bytesCol))
    df.withColumn("_dims", dims)
      .withColumn("format", col("_dims").getField("format"))
      .withColumn("width", col("_dims").getField("width"))
      .withColumn("height", col("_dims").getField("height"))
      .drop("_dims")
  }

  /** Perceptual-hash scan: appends `dhash` — the 64-bit difference
    * hash over real BMP pixel bytes ([[graft.functions
    * .DHash64Expression]]: 72 bounded pixel reads per image regardless
    * of size, NULL for non-BMP/hostile bytes). Map-only; feed the
    * result to [[Dedup.hashNearDups]] for banded Hamming dedup. */
  def imageDHashScan(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("dhash", graft.functions.MediaFunctions.dhash64(col(bytesCol)))

  /** Deterministic PIXEL-carrying BMP fixture: full 9×8 bottom-up
    * 24-bpp BMPs (278 bytes) whose per-cell luma follows an
    * LCG-mixed id arithmetic — SQL-replayable, so the dHash oracle
    * recomputes every bit. `idOffset` shifts the emitted id (planted
    * near-dup twins keep the BASE id's pixels); `bumpCell` perturbs
    * the single cell (x=3, y=2) by +bump mod 256 — a one-cell edit
    * moves at most 2 dHash bits, the planted near-dup signal. Every
    * (seed % 10 == 9) row is JUNK bytes (triage must yield NULL,
    * never die). */
  def bmpPixelsFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      bumpCell: Int = 0): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notabitmap:$seed".getBytes("US-ASCII")
        else {
          def lum(x: Int, y: Int): Int = {
            val base = (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
            if (bumpCell != 0 && x == 3 && y == 2) (base + bumpCell) % 256
            else base
          }
          val stride = 28 // ((9*3 + 3) / 4) * 4
          val out = new Array[Byte](54 + stride * 8)
          Array[Byte]('B', 'M').copyToArray(out, 0)
          le32(out.length).copyToArray(out, 2)
          le32(54).copyToArray(out, 10)
          le32(40).copyToArray(out, 14)
          le32(9).copyToArray(out, 18)
          le32(8).copyToArray(out, 22) // positive height = bottom-up
          le16(1).copyToArray(out, 26)
          le16(24).copyToArray(out, 28)
          // comp/sizeImage/ppm/clr fields stay zero
          var fr = 0
          while (fr < 8) {
            val y = 7 - fr // bottom-up storage
            var x = 0
            while (x < 9) {
              val v = lum(x, y).toByte
              val p = 54 + fr * stride + x * 3
              out(p) = v; out(p + 1) = v; out(p + 2) = v
              x += 1
            }
            fr += 1
          }
          out
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** Deterministic PNG fixture carrying the SAME LCG luma grid as
    * [[bmpPixelsFromIds]], encoded as a real 9×8 grayscale PNG
    * (color type 0, bit depth 8, filter 0 rows, one zlib-deflated
    * IDAT) — so a PNG and a BMP of the same id dHash IDENTICALLY and
    * the p340 oracle arithmetic replays verbatim. `filterMode` > 0
    * exercises the decoder's unfilter paths without changing pixels:
    * 1 = Sub on every row, 2 = Up, 3 = Average, 4 = Paeth (encoders
    * pick filters per row; a decoder must take them all); −1 picks
    * seed % 5, so one fixture exercises every unfilter path. Junk on
    * seed % 10 == 9, twins via idOffset/bumpCell as in the BMP
    * builder. `interlaced = true` stores the SAME pixels in Adam7
    * order (IHDR interlace 1, the 7 passes each independently
    * filtered against their own pass-local neighbors — the layout
    * real interlaced encoders emit). */
  def pngPixelsFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      bumpCell: Int = 0,
      filterMode: Int = -1,
      interlaced: Boolean = false): DataFrame = {
    require(filterMode >= -1 && filterMode <= 4,
      s"pngPixelsFromIds: filterMode=$filterMode")
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val filt = if (filterMode >= 0) filterMode else (seed % 5).toInt
      val bytes =
        if (seed % 10 == 9) s"notapng:$seed".getBytes("US-ASCII")
        else {
          def lum(x: Int, y: Int): Int = {
            val base = (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
            if (bumpCell != 0 && x == 3 && y == 2) (base + bumpCell) % 256
            else base
          }
          pngGrayBytes(lum, 9, 8, filt, interlaced, null)
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** 8-bit grayscale PNG over an arbitrary grid: raw scanlines with
    * the chosen filter applied (pass-local for Adam7), streaming
    * deflate, CRC-correct chunks; an optional `eXIf` chunk (PNG Third
    * Edition — the bare TIFF payload) lands between IHDR and IDAT. */
  private[graft] def pngGrayBytes(
      lum: (Int, Int) => Int, w: Int, h: Int, filt: Int,
      interlaced: Boolean, exif: Array[Byte]): Array[Byte] = {
    // raw scanlines: filter byte + gray bytes per row, the
    // chosen filter applied so the decoder must invert it.
    // Filtering is PASS-LOCAL: left/up neighbors step by the
    // pass strides (for the sequential "pass" that is 1/1).
    val passes: Seq[(Int, Int, Int, Int)] =
      if (!interlaced) Seq((0, 1, 0, 1))
      else Seq((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
        (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))
    val rawOut = new java.io.ByteArrayOutputStream(128)
    for ((px0, pdx, py0, pdy) <- passes) {
      val wP = if (w > px0) (w - px0 + pdx - 1) / pdx else 0
      val hP = if (h > py0) (h - py0 + pdy - 1) / pdy else 0
      for (ry <- 0 until hP; if wP > 0) {
        rawOut.write(filt)
        val y = py0 + ry * pdy
        for (rx <- 0 until wP) {
          val x = px0 + rx * pdx
          val v = lum(x, y)
          def left = if (rx > 0) lum(x - pdx, y) else 0
          def up = if (ry > 0) lum(x, y - pdy) else 0
          def upLeft = if (rx > 0 && ry > 0) lum(x - pdx, y - pdy) else 0
          val enc = filt match {
            case 0 => v
            case 1 => v - left // Sub
            case 2 => v - up // Up
            case 3 => v - ((left + up) >> 1) // Average
            case 4 => // Paeth
              val a = left; val b = up; val c = upLeft
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b)
              val pc = math.abs(p - c)
              val pred = if (pa <= pb && pa <= pc) a
                else if (pb <= pc) b else c
              v - pred
          }
          rawOut.write(enc & 0xff)
        }
      }
    }
    val raw = rawOut.toByteArray
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    // deflate() does not guarantee completion in one call — drain
    // until finished() or a larger fixture silently truncates IDAT
    val comp = new Array[Byte](raw.length + 64)
    var compLen = 0
    while (!deflater.finished() && compLen < comp.length)
      compLen += deflater.deflate(comp, compLen, comp.length - compLen)
    require(deflater.finished(), "pngGrayBytes: IDAT buffer too small")
    deflater.end()
    val out = new java.io.ByteArrayOutputStream(128)
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, payload: Array[Byte]): Unit = {
      out.write(be32(payload.length))
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(payload)
      out.write(t); out.write(payload); out.write(be32(crc.getValue.toInt))
    }
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    chunk("IHDR", be32(w) ++ be32(h) ++
      Array[Byte](8, 0, 0, 0, if (interlaced) 1 else 0))
    if (exif != null) chunk("eXIf", exif)
    chunk("IDAT", comp.take(compLen))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** [[jpegExifFromIds]]'s PNG sibling: upright pixels (the p340
    * arithmetic) with a planted `eXIf` chunk — orientation cycles
    * seed % 8 + 1, GPS-IFD pointer iff seed % 3 == 0, every third
    * TIFF big-endian. Junk on seed % 10 == 9. */
  def pngExifFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notanexifpng:$seed".getBytes("US-ASCII")
        else {
          def lum(x: Int, y: Int): Int =
            (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
          pngGrayBytes(lum, 9, 8, (seed % 5).toInt, interlaced = false,
            exifTiff(orientation = (seed % 8 + 1).toInt, gps = seed % 3 == 0,
              bigEndian = seed % 3 == 2))
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** [[jpegOrientedFromIds]]'s PNG sibling: the stored scanlines carry
    * the base LCG grid transformed by EXIF orientation seed % 8 + 1
    * (orientations 5–8 transpose the canvas to 8×9) and the `eXIf`
    * chunk carries the matching tag-274 TIFF. Display-normalizing
    * recovers the base grid. Junk on seed % 10 == 9, twins via
    * idOffset/bumpCell. */
  def pngOrientedFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      bumpCell: Int = 0): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notarotpng:$seed".getBytes("US-ASCII")
        else {
          def base(x: Int, y: Int): Int = {
            val v = (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
            if (bumpCell != 0 && x == 3 && y == 2) (v + bumpCell) % 256
            else v
          }
          val o = (seed % 8 + 1).toInt
          val (bw, bh) = if (o >= 5) (8, 9) else (9, 8)
          def stored(x: Int, y: Int): Int = o match {
            case 1 => base(x, y)
            case 2 => base(8 - x, y)
            case 3 => base(8 - x, 7 - y)
            case 4 => base(x, 7 - y)
            case 5 => base(y, x)
            case 6 => base(8 - y, x)
            case 7 => base(8 - y, 7 - x)
            case _ => base(y, 7 - x) // 8
          }
          pngGrayBytes(stored, bw, bh, (seed % 5).toInt, interlaced = false,
            exifTiff(orientation = o, gps = false, bigEndian = seed % 3 == 2))
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** Deterministic GIF fixture carrying the SAME LCG luma grid: a 9×8
    * GIF89a with a 256-entry grayscale global color table (palette
    * index k maps to luma k, so pixel index = luma) and a REAL LZW
    * stream — leading CLEAR, 72 literal codes, EOI, 9-bit codes
    * (the dictionary grows 71 entries, never reaching the 512-code
    * width bump) — so a GIF, PNG, JPEG and BMP of the same id dHash
    * identically and the p340 oracle arithmetic replays verbatim.
    * Junk on seed % 10 == 9, twins via idOffset/bumpCell. */
  def gifPixelsFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      bumpCell: Int = 0): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notagif:$seed".getBytes("US-ASCII")
        else {
          def lum(x: Int, y: Int): Int = {
            val base = (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
            if (bumpCell != 0 && x == 3 && y == 2) (base + bumpCell) % 256
            else base
          }
          val out = new java.io.ByteArrayOutputStream(1024)
          def w8(v: Int): Unit = out.write(v & 0xff)
          def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
          out.write("GIF89a".getBytes("US-ASCII"))
          w16(9); w16(8)
          w8(0xf7) // GCT present, 256 entries, 8-bit color resolution
          w8(0); w8(0) // background, aspect
          (0 until 256).foreach { k => w8(k); w8(k); w8(k) } // gray GCT
          w8(0x2c) // image descriptor
          w16(0); w16(0); w16(9); w16(8); w8(0) // no LCT, not interlaced
          w8(8) // LZW min code size
          // 9-bit literal codes, LSB-first: CLEAR, 72 pixels, EOI
          val codes = 256 +: (for (y <- 0 until 8; x <- 0 until 9)
            yield lum(x, y)) :+ 257
          val data = new java.io.ByteArrayOutputStream(96)
          var acc = 0; var nAcc = 0
          codes.foreach { c =>
            acc |= c << nAcc; nAcc += 9
            while (nAcc >= 8) { data.write(acc & 0xff); acc >>>= 8; nAcc -= 8 }
          }
          if (nAcc > 0) data.write(acc & 0xff)
          val d = data.toByteArray
          var i = 0
          while (i < d.length) { // 255-byte sub-blocks
            val n = math.min(255, d.length - i)
            w8(n); out.write(d, i, n); i += n
          }
          w8(0)    // sub-block terminator
          w8(0x3b) // trailer
          out.toByteArray
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** Deterministic baseline-JPEG fixture carrying the SAME LCG luma
    * grid: a 72×64 grayscale JPEG whose 8×8 blocks are each CONSTANT
    * at lum(bx, by) — the FDCT of a constant block is pure DC, and
    * with q00 = 8 the quantized DC is exactly v − 128, so the DC
    * thumbnail decodes LOSSLESSLY back to the 9×8 grid and the p340
    * oracle arithmetic replays verbatim (ITU T.81 sequential, minimal
    * custom Huffman tables, FF byte stuffing). Junk on
    * seed % 10 == 9, twins via idOffset/bumpCell. */
  def jpegDcFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      bumpCell: Int = 0): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notajpeg:$seed".getBytes("US-ASCII")
        else {
          def lum(x: Int, y: Int): Int = {
            val base = (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
            if (bumpCell != 0 && x == 3 && y == 2) (base + bumpCell) % 256
            else base
          }
          jpegBaselineGray(lum, 9, 8)
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** Baseline grayscale encoder shared by the JPEG fixtures: a
    * (bw·8)×(bh·8) SOF0 file whose 8×8 blocks are each CONSTANT at
    * dc(bx, by) — the FDCT of a constant block is pure DC, and with
    * q00 = 8 the quantized DC is exactly v − 128, so the DC thumbnail
    * decodes LOSSLESSLY (ITU T.81 sequential, minimal custom Huffman
    * tables, FF byte stuffing). */
  private def jpegBaselineGray(dc: (Int, Int) => Int, bw: Int, bh: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >>> 8); w8(v) }
    w16(0xffd8) // SOI
    // DQT: table 0, q[0]=8 (lossless DC for our blocks), rest 16
    w16(0xffdb); w16(2 + 1 + 64); w8(0x00)
    w8(8); (1 until 64).foreach(_ => w8(16))
    // SOF0: 8-bit, bh·8 rows × bw·8 cols, 1 component (1,1) q0
    w16(0xffc0); w16(2 + 6 + 3)
    w8(8); w16(bh * 8); w16(bw * 8); w8(1)
    w8(1); w8(0x11); w8(0)
    // DHT DC0: 9 symbols (categories 0..8), all length 4 —
    // canonical codes 0000..1000, a valid prefix code
    w16(0xffc4); w16(2 + 17 + 9); w8(0x00)
    val dcCounts = Array(0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcCounts.foreach(w8); (0 to 8).foreach(w8)
    // DHT AC0: single symbol EOB (0x00) at length 1 — code '0'
    w16(0xffc4); w16(2 + 17 + 1); w8(0x10)
    w8(1); (1 until 16).foreach(_ => w8(0)); w8(0x00)
    // SOS: component 1 uses DC0/AC0
    w16(0xffda); w16(2 + 1 + 2 + 3)
    w8(1); w8(1); w8(0x00); w8(0); w8(63); w8(0)
    // entropy stream: bit writer with FF 00 stuffing
    var acc = 0; var nAcc = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1); nAcc += 1
        if (nAcc == 8) {
          w8(acc)
          if ((acc & 0xff) == 0xff) w8(0x00)
          acc = 0; nAcc = 0
        }
        i -= 1
      }
    }
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val v = dc(bx, by) - 128
        var diff = v - pred
        pred = v
        // category = bit length of |diff| (0..8 here)
        var t = 0; var a = math.abs(diff)
        while (a > 0) { t += 1; a >>= 1 }
        putBits(t, 4) // DC code for category t is t itself, 4 bits
        if (t > 0) {
          if (diff < 0) diff += (1 << t) - 1
          putBits(diff, t)
        }
        putBits(0, 1) // AC EOB: code '0'
        bx += 1
      }
      by += 1
    }
    if (nAcc > 0) { // pad the final byte with 1s (T.81 F.1.2.3)
      acc = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)
      w8(acc)
      if ((acc & 0xff) == 0xff) w8(0x00)
    }
    w16(0xffd9) // EOI
    out.toByteArray
  }

  /** Camera-rotation fixture for the ORIENTATION-NORMALIZED hash
    * ([[graft.functions.DHash64OrientedExpression]]): each member
    * STORES the base LCG grid transformed by EXIF orientation
    * seed % 8 + 1 (orientations 5–8 transpose the canvas to 64×72)
    * and carries the matching tag-274 APP1 — exactly what a phone
    * camera emits. Display-normalizing recovers the base grid, so
    * every member's oriented hash equals the UPRIGHT member's p340
    * arithmetic hash, whatever its stored rotation. Junk on
    * seed % 10 == 9, twins via idOffset/bumpCell. */
  def jpegOrientedFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      bumpCell: Int = 0): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notarotjpeg:$seed".getBytes("US-ASCII")
        else {
          def base(x: Int, y: Int): Int = {
            val v = (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
            if (bumpCell != 0 && x == 3 && y == 2) (v + bumpCell) % 256
            else v
          }
          val o = (seed % 8 + 1).toInt
          // stored(x, y) = base(display position it shows at) — the
          // forward tag-274 map over a 9×8 display grid
          val (bw, bh) = if (o >= 5) (8, 9) else (9, 8)
          def stored(x: Int, y: Int): Int = o match {
            case 1 => base(x, y)
            case 2 => base(8 - x, y)
            case 3 => base(8 - x, 7 - y)
            case 4 => base(x, 7 - y)
            case 5 => base(y, x)
            case 6 => base(8 - y, x)
            case 7 => base(8 - y, 7 - x)
            case _ => base(y, 7 - x) // 8
          }
          val jpg = jpegBaselineGray(stored, bw, bh)
          val app1 = exifApp1(orientation = o, gps = false,
            bigEndian = seed % 3 == 2)
          val out = new Array[Byte](jpg.length + app1.length)
          out(0) = jpg(0); out(1) = jpg(1)
          app1.copyToArray(out, 2)
          System.arraycopy(jpg, 2, out, 2 + app1.length, jpg.length - 2)
          out
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** [[imageDHashScan]]'s display-space sibling: appends `dhash` from
    * [[graft.functions.DHash64OrientedExpression]] — the EXIF
    * tag-274 transform applied to the sample grid before hashing, so
    * camera-rotated duplicates pair with their upright twins.
    * Map-only, same contract otherwise. */
  def imageDHashOrientedScan(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("dhash",
      graft.functions.MediaFunctions.dhash64_oriented(col(bytesCol)))

  /** Deterministic PROGRESSIVE-JPEG fixture carrying the SAME LCG luma
    * grid as [[jpegDcFromIds]]: a 72×64 grayscale SOF2 file whose DC
    * coefficients arrive the way real progressive encoders ship them —
    * a DC FIRST scan at successive-approximation Al=1 (each block's
    * quantized DC arithmetic-shifted right one bit, Huffman-coded as
    * diffs), then a genuine AC first scan (Ss=1..63, per-block EOB —
    * the decoder must SKIP it bytewise), then a DC REFINEMENT scan
    * (Ah=1, Al=0: one raw bit per block restoring bit 0) — so the
    * refined DC thumbnail decodes LOSSLESSLY back to the 9×8 grid and
    * the p340 oracle arithmetic replays verbatim. Junk on
    * seed % 10 == 9, twins via idOffset/bumpCell. */
  def jpegProgressiveFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      bumpCell: Int = 0): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notaprogjpeg:$seed".getBytes("US-ASCII")
        else {
          def lum(x: Int, y: Int): Int = {
            val base = (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
            if (bumpCell != 0 && x == 3 && y == 2) (base + bumpCell) % 256
            else base
          }
          val out = new java.io.ByteArrayOutputStream(640)
          def w8(v: Int): Unit = out.write(v & 0xff)
          def w16(v: Int): Unit = { w8(v >>> 8); w8(v) }
          w16(0xffd8) // SOI
          // DQT: table 0, q[0]=8 (lossless DC for our blocks), rest 16
          w16(0xffdb); w16(2 + 1 + 64); w8(0x00)
          w8(8); (1 until 64).foreach(_ => w8(16))
          // SOF2: progressive, 8-bit, 64 rows × 72 cols, 1 comp (1,1) q0
          w16(0xffc2); w16(2 + 6 + 3)
          w8(8); w16(64); w16(72); w8(1)
          w8(1); w8(0x11); w8(0)
          // DHT DC0: categories 0..8, all code length 4 (canonical)
          w16(0xffc4); w16(2 + 17 + 9); w8(0x00)
          val dcCounts = Array(0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
          dcCounts.foreach(w8); (0 to 8).foreach(w8)
          // DHT AC0: single symbol EOB (0x00) at length 1 — code '0'
          w16(0xffc4); w16(2 + 17 + 1); w8(0x10)
          w8(1); (1 until 16).foreach(_ => w8(0)); w8(0x00)

          // per-scan entropy bit writer with FF 00 stuffing; each scan
          // byte-aligns at start and pads its last byte with 1s
          var acc = 0; var nAcc = 0
          def putBits(v: Int, n: Int): Unit = {
            var i = n - 1
            while (i >= 0) {
              acc = (acc << 1) | ((v >>> i) & 1); nAcc += 1
              if (nAcc == 8) {
                w8(acc)
                if ((acc & 0xff) == 0xff) w8(0x00)
                acc = 0; nAcc = 0
              }
              i -= 1
            }
          }
          def flushScan(): Unit = if (nAcc > 0) { // pad with 1s (F.1.2.3)
            acc = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)
            w8(acc)
            if ((acc & 0xff) == 0xff) w8(0x00)
            acc = 0; nAcc = 0
          }
          def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
            w16(0xffda); w16(2 + 1 + 2 + 3)
            w8(1); w8(1); w8(0x00); w8(ss); w8(se); w8((ah << 4) | al)
          }

          // SCAN 1 — DC first, Al=1: diffs of (dc >> 1), arithmetic
          // shift (the T.81 DC point transform)
          sos(0, 0, 0, 1)
          var pred = 0
          for (by <- 0 until 8; bx <- 0 until 9) {
            val dcApprox = (lum(bx, by) - 128) >> 1
            var diff = dcApprox - pred
            pred = dcApprox
            var t = 0; var a = math.abs(diff)
            while (a > 0) { t += 1; a >>= 1 }
            putBits(t, 4) // DC code for category t is t itself, 4 bits
            if (t > 0) {
              if (diff < 0) diff += (1 << t) - 1
              putBits(diff, t)
            }
          }
          flushScan()

          // SCAN 2 — AC first (Ss=1..63, Ah=Al=0): every block EOB
          // (all ACs are zero for constant blocks); a DC-only decoder
          // skips these bytes without Huffman work
          sos(1, 63, 0, 0)
          for (_ <- 0 until 72) putBits(0, 1)
          flushScan()

          // SCAN 3 — DC refinement (Ah=1, Al=0): bit 0 of each dc
          sos(0, 0, 1, 0)
          for (by <- 0 until 8; bx <- 0 until 9)
            putBits((lum(bx, by) - 128) & 1, 1)
          flushScan()

          w16(0xffd9) // EOI
          out.toByteArray
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** LSB-first bit writer for VP8L payload synthesis ([[webpVp8lFromIds]]
    * and the decode specs): `bits` packs little-endian as the format
    * reads them; `code` emits a canonical prefix code MSB-first (each
    * stream bit extends the code from the left — the DEFLATE-style
    * convention VP8L decodes with). */
  private[graft] final class Vp8lBits {
    private val out = new java.io.ByteArrayOutputStream(256)
    private var acc = 0L
    private var n = 0
    def bits(v: Int, k: Int): Unit = {
      acc |= (v.toLong & ((1L << k) - 1)) << n
      n += k
      while (n >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; n -= 8 }
    }
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bits((c >>> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      if (n > 0) { out.write((acc & 0xff).toInt); acc = 0; n = 0 }
      out.toByteArray
    }
  }

  /** Emit a 1-symbol SIMPLE prefix code (zero bits per decode). */
  private[graft] def vp8lSimple1(bw: Vp8lBits, sym: Int): Unit = {
    bw.bits(1, 1); bw.bits(0, 1)
    if (sym >= 2) { bw.bits(1, 1); bw.bits(sym, 8) }
    else { bw.bits(0, 1); bw.bits(sym, 1) }
  }

  /** Emit a 2-symbol SIMPLE prefix code (one bit per decode; the
    * smaller symbol decodes from bit 0). */
  private[graft] def vp8lSimple2(bw: Vp8lBits, s0: Int, s1: Int): Unit = {
    bw.bits(1, 1); bw.bits(1, 1)
    if (s0 >= 2) { bw.bits(1, 1); bw.bits(s0, 8) }
    else { bw.bits(0, 1); bw.bits(s0, 1) }
    bw.bits(s1, 8)
  }

  /** Emit the NORMAL-form "all 8-bit" code: symbols 0..255 at length
    * 8 (canonical code of symbol s is s itself), the rest of the
    * alphabet zero — transmitted through the 19-symbol code-length
    * code with 16/18 repeat tokens, the full decode path real
    * encoders exercise. */
  private[graft] def vp8lAll8(bw: Vp8lBits, alphabetSize: Int): Unit = {
    bw.bits(0, 1) // normal form
    // code-length code: symbol 8 -> len 1 (code 0), 16 -> len 2
    // (code 2), 18 -> len 2 (code 3); slot order per spec
    bw.bits(19 - 4, 4)
    val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
      13, 14, 15, 16)
    for (sym <- order)
      bw.bits(if (sym == 8) 1 else if (sym == 16 || sym == 18) 2 else 0, 3)
    bw.bits(0, 1) // no explicit token count: positions cover the alphabet
    // tokens: literal '8', then repeat-previous to 256 (42×6 + 1×3),
    // then one zero-run for the tail of the alphabet
    bw.code(0, 1) // symbol 8
    for (_ <- 0 until 42) { bw.code(2, 2); bw.bits(3, 2) } // 16, rep 6
    bw.code(2, 2); bw.bits(0, 2) // 16, rep 3 -> position 256
    if (alphabetSize > 256) {
      val zeros = alphabetSize - 256
      require(zeros >= 11 && zeros <= 138, s"vp8lAll8: tail $zeros")
      bw.code(3, 2); bw.bits(zeros - 11, 7) // 18, rep zeros
    }
  }

  /** Emit a NORMAL-form code with exactly two 1-bit symbols `sA < sB`
    * — the way to give a code to symbols ≥ 256 (length / color-cache
    * symbols), which the SIMPLE form's 8-bit fields cannot reach. */
  private[graft] def vp8lPair(bw: Vp8lBits, alphabetSize: Int, sA: Int, sB: Int): Unit = {
    require(sA < sB && sB < alphabetSize, s"vp8lPair: $sA $sB / $alphabetSize")
    bw.bits(0, 1) // normal form
    // code-length code over {0, 1, 17, 18}, all length 2 (canonical
    // codes 0..3 in symbol order); slots 17,18,0,1 are the first four
    bw.bits(4 - 4, 4)
    bw.bits(2, 3); bw.bits(2, 3); bw.bits(2, 3); bw.bits(2, 3)
    bw.bits(0, 1) // explicit tokens cover the whole alphabet
    var pos = 0
    def zeros(k: Int): Unit = {
      var left = k
      while (left > 0) {
        if (left >= 11) { val rep = math.min(left, 138)
          bw.code(3, 2); bw.bits(rep - 11, 7); left -= rep }
        else if (left >= 3) { bw.code(2, 2); bw.bits(left - 3, 3); left -= left }
        else { bw.code(0, 2); left -= 1 }
      }
    }
    zeros(sA); bw.code(1, 2); pos = sA + 1
    zeros(sB - pos); bw.code(1, 2); pos = sB + 1
    zeros(alphabetSize - pos)
  }

  /** Wrap a VP8L payload in its RIFF container. */
  /** [[vp8lGrayPayload]] with PER-PIXEL alpha from {0, 255} (a 1-bit
    * prefix code over the two symbols): the encoding animated frames
    * need for transparency holes. */
  private[graft] def vp8lGrayAlphaPayload(
      lum: (Int, Int) => Int, alpha: (Int, Int) => Int,
      w: Int, h: Int): Array[Byte] = {
    val bw = new Vp8lBits
    bw.bits(0x2f, 8) // signature
    bw.bits(w - 1, 14); bw.bits(h - 1, 14) // dims
    bw.bits(1, 1) // alpha hint
    bw.bits(0, 3) // version
    bw.bits(0, 1) // no transforms
    bw.bits(0, 1); bw.bits(0, 1) // no meta codes, no cache
    vp8lAll8(bw, 280) // green
    vp8lAll8(bw, 256); vp8lAll8(bw, 256) // red, blue
    vp8lPair(bw, 256, 0, 255) // alpha: {0, 255} -> canonical 1-bit code
    vp8lSimple1(bw, 0) // distance (unused)
    for (y <- 0 until h; x <- 0 until w) {
      val v = lum(x, y)
      bw.code(v, 8); bw.code(v, 8); bw.code(v, 8)
      bw.code(if (alpha(x, y) == 0) 0 else 1, 1)
    }
    bw.bytes
  }

  /** MULTI-FRAME animated-WebP fixture producing the SAME composited
    * frame sequence as [[gifAnimFromIds]] for the same seed — the
    * cross-container twin the p382 near-dup gate pairs. ANMF offsets
    * are stored halved (even-only), so the odd-row updates the GIF
    * fixture plants cannot be 1-row WebP frames; instead frame t is a
    * rect at y = 0 of height t+1 whose rows below t are FULLY
    * transparent (alpha 0, the blending no-op) and whose row t
    * carries the GIF frame's pixels with the same alpha-0 hole at
    * column t — compositing lands identically. Frame 0 overwrites
    * (blend bit set); later frames alpha-blend. */
  def webpAnimMultiFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      extraFrame: Boolean = false): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notanimwebp:$seed:m".getBytes("US-ASCII")
        else {
          def lcg(i: Long): Int =
            (((1103515245L * (i % 100000L) + 12345L) % 2147483648L) /
              65536L % 256L).toInt
          def anmf(x: Int, y: Int, w: Int, h: Int, flags: Int,
              payload: Array[Byte]): Array[Byte] = {
            val f = new java.io.ByteArrayOutputStream(payload.length + 32)
            def le24(v: Int): Unit = { f.write(v & 0xff)
              f.write((v >>> 8) & 0xff); f.write((v >>> 16) & 0xff) }
            def le32(v: Int): Unit = { le24(v); f.write((v >>> 24) & 0xff) }
            le24(x / 2); le24(y / 2)
            le24(w - 1); le24(h - 1)
            le24(100) // duration ms
            f.write(flags)
            f.write("VP8L".getBytes("US-ASCII")); le32(payload.length)
            f.write(payload, 0, payload.length)
            if ((payload.length & 1) == 1) f.write(0)
            f.toByteArray
          }
          val frame0 = anmf(0, 0, 9, 8, 0x02, // no-blend (overwrite)
            vp8lGrayPayload((x, y) => lcg(seed * 72 + y * 9 + x), 9, 8))
          val last = (seed % 3 + 2).toInt - 1 + (if (extraFrame) 1 else 0)
          val updates = (1 to last).map { t =>
            anmf(0, 0, 9, t + 1, 0x00, // alpha-blend, keep
              vp8lGrayAlphaPayload(
                (x, y) => if (y == t) lcg((seed + t * 131L) * 72 + x) % 254 else 0,
                (x, y) => if (y == t && x != t) 255 else 0,
                9, t + 1))
          }
          val anim = Array[Byte](0, 0, 0, 0, 1, 0)
          vp8xContainer(9, 8, 0x12,
            (("ANIM" -> anim) +: ("ANMF" -> frame0) +:
              updates.map("ANMF" -> _)): _*)
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  private[graft] def vp8lContainer(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 32)
    def le32(v: Int): Unit =
      { out.write(v & 0xff); out.write((v >>> 8) & 0xff)
        out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff) }
    out.write("RIFF".getBytes("US-ASCII"))
    le32(4 + 8 + payload.length + (payload.length & 1))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII"))
    le32(payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0) // chunk padding
    out.toByteArray
  }

  /** Plain-literal VP8L payload over an arbitrary gray grid: no
    * transforms, all-8-bit ARGB literal codes — the generalized form
    * of [[webpVp8lFromIds]]'s strategy 0 (which stays inline there so
    * the four-strategy cycle reads as one piece). */
  private[graft] def vp8lGrayPayload(lum: (Int, Int) => Int, w: Int, h: Int): Array[Byte] = {
    val bw = new Vp8lBits
    bw.bits(0x2f, 8) // signature
    bw.bits(w - 1, 14); bw.bits(h - 1, 14) // dims
    bw.bits(0, 1) // alpha hint
    bw.bits(0, 3) // version
    bw.bits(0, 1) // no transforms
    bw.bits(0, 1); bw.bits(0, 1) // no meta codes, no cache
    vp8lAll8(bw, 280) // green
    vp8lAll8(bw, 256); vp8lAll8(bw, 256) // red, blue
    vp8lSimple1(bw, 255) // alpha
    vp8lSimple1(bw, 0) // distance (unused)
    for (y <- 0 until h; x <- 0 until w) {
      val v = lum(x, y)
      bw.code(v, 8); bw.code(v, 8); bw.code(v, 8)
    }
    bw.bytes
  }

  /** Extended-format container: RIFF/WEBP opening with a VP8X header
    * (given feature flags, 24-bit canvas dims) followed by the named
    * chunks in order — the general builder behind the EXIF and
    * animation fixtures. Flags per spec byte 0: 0x08 = EXIF present,
    * 0x02 = animation. */
  private[graft] def vp8xContainer(
      w: Int, h: Int, flags: Int, chunks: (String, Array[Byte])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      chunks.map(_._2.length + 9).sum + 32)
    def le32(v: Int): Unit =
      { out.write(v & 0xff); out.write((v >>> 8) & 0xff)
        out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff) }
    def chunk(fourcc: String, body: Array[Byte]): Unit = {
      out.write(fourcc.getBytes("US-ASCII")); le32(body.length)
      out.write(body, 0, body.length)
      if ((body.length & 1) == 1) out.write(0)
    }
    val vp8xLen = 10
    val riffLen = 4 + (8 + vp8xLen) +
      chunks.map { case (_, b) => 8 + b.length + (b.length & 1) }.sum
    out.write("RIFF".getBytes("US-ASCII")); le32(riffLen)
    out.write("WEBP".getBytes("US-ASCII"))
    val vp8x = new java.io.ByteArrayOutputStream(vp8xLen)
    vp8x.write(flags); vp8x.write(0); vp8x.write(0); vp8x.write(0)
    def le24b(v: Int): Unit =
      { vp8x.write(v & 0xff); vp8x.write((v >>> 8) & 0xff); vp8x.write((v >>> 16) & 0xff) }
    le24b(w - 1); le24b(h - 1)
    chunk("VP8X", vp8x.toByteArray)
    chunks.foreach { case (f, b) => chunk(f, b) }
    out.toByteArray
  }

  /** [[vp8xContainer]] with a VP8L payload and an EXIF chunk wrapping
    * a bare TIFF — the layout a camera-aware encoder emits (metadata
    * chunks follow the image data per the spec). */
  private[graft] def vp8xExifContainer(
      payload: Array[Byte], tiff: Array[Byte], w: Int, h: Int): Array[Byte] =
    vp8xContainer(w, h, 0x08, "VP8L" -> payload, "EXIF" -> tiff)

  /** [[jpegExifFromIds]]'s WebP sibling — the governance-triage
    * fixture for the modern container: upright VP8L pixels (the same
    * LCG grid, so the dHash is the p340 arithmetic) in a VP8X
    * container whose EXIF chunk plants orientation seed % 8 + 1, a
    * GPS-IFD pointer iff seed % 3 == 0 (the PII flag), every third
    * TIFF big-endian, and a Make tag padding IFD0. Junk on
    * seed % 10 == 9. */
  def webpExifFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notanexifwebp:$seed".getBytes("US-ASCII")
        else {
          def lum(x: Int, y: Int): Int =
            (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
          vp8xExifContainer(
            vp8lGrayPayload(lum, 9, 8),
            exifTiff(orientation = (seed % 8 + 1).toInt, gps = seed % 3 == 0,
              bigEndian = seed % 3 == 2),
            9, 8)
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** ANIMATED WebP fixture: a VP8X container (animation flag) with an
    * ANIM chunk (background + loop count) and ONE ANMF frame whose
    * 16-byte frame header wraps the VP8L payload of the base LCG grid
    * — an animation must hash as its first frame (the GIF convention),
    * so the p340 arithmetic replays. Junk on seed % 10 == 9, twins via
    * idOffset/bumpCell. */
  def webpAnimFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      bumpCell: Int = 0): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notananimwebp:$seed".getBytes("US-ASCII")
        else {
          def lum(x: Int, y: Int): Int = {
            val base = (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
            if (bumpCell != 0 && x == 3 && y == 2) (base + bumpCell) % 256
            else base
          }
          val payload = vp8lGrayPayload(lum, 9, 8)
          // ANIM: 4-byte background ARGB + 2-byte loop count
          val anim = Array[Byte](0, 0, 0, 0, 1, 0)
          // ANMF: x/2, y/2, w-1, h-1 (24-bit LE each), duration (24),
          // flags (1: dispose-to-background | blend), then the frame's
          // own VP8L chunk
          val f = new java.io.ByteArrayOutputStream(payload.length + 32)
          def le24(v: Int): Unit =
            { f.write(v & 0xff); f.write((v >>> 8) & 0xff); f.write((v >>> 16) & 0xff) }
          def le32(v: Int): Unit = { le24(v); f.write((v >>> 24) & 0xff) }
          le24(0); le24(0) // frame x/2, y/2
          le24(9 - 1); le24(8 - 1) // frame dims - 1
          le24(100) // duration ms
          f.write(1) // dispose to background
          f.write("VP8L".getBytes("US-ASCII")); le32(payload.length)
          f.write(payload, 0, payload.length)
          if ((payload.length & 1) == 1) f.write(0)
          vp8xContainer(9, 8, 0x02, "ANIM" -> anim, "ANMF" -> f.toByteArray)
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** [[jpegOrientedFromIds]]'s WebP sibling: each member is a VP8X
    * container whose VP8L payload STORES the base LCG grid transformed
    * by EXIF orientation seed % 8 + 1 (orientations 5–8 transpose the
    * canvas to 8×9) and whose EXIF chunk carries the matching tag-274
    * TIFF — the modern-crawl shape of the camera-rotation problem.
    * Display-normalizing recovers the base grid, so every member's
    * oriented hash equals the upright p340 arithmetic. Junk on
    * seed % 10 == 9, twins via idOffset/bumpCell. */
  def webpOrientedFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      bumpCell: Int = 0): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notarotwebp:$seed".getBytes("US-ASCII")
        else {
          def base(x: Int, y: Int): Int = {
            val v = (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
            if (bumpCell != 0 && x == 3 && y == 2) (v + bumpCell) % 256
            else v
          }
          val o = (seed % 8 + 1).toInt
          val (bw, bh) = if (o >= 5) (8, 9) else (9, 8)
          def stored(x: Int, y: Int): Int = o match {
            case 1 => base(x, y)
            case 2 => base(8 - x, y)
            case 3 => base(8 - x, 7 - y)
            case 4 => base(x, 7 - y)
            case 5 => base(y, x)
            case 6 => base(8 - y, x)
            case 7 => base(8 - y, 7 - x)
            case _ => base(y, 7 - x) // 8
          }
          vp8xExifContainer(
            vp8lGrayPayload(stored, bw, bh),
            exifTiff(orientation = o, gps = false, bigEndian = seed % 3 == 2),
            bw, bh)
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** Deterministic WebP VP8L fixture carrying the SAME LCG luma grid:
    * real RFC 9649 lossless bitstreams over the 9×8 gray image, the
    * encoding strategy cycling by seed % 4 the way real encoders mix
    * their tools — 0: plain ARGB literals; 1: SUBTRACT-GREEN (red and
    * blue collapse to zero-bit codes); 2: PREDICTOR transform (two
    * 8-px blocks, modes L and T, residual-coded); 3: COLOR-INDEXING
    * (delta-coded palette of the image's distinct grays). Every
    * variant decodes to the same pixels, so the p340 oracle arithmetic
    * replays verbatim over a fifth container format. Junk on
    * seed % 10 == 9, twins via idOffset/bumpCell. */
  def webpVp8lFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      bumpCell: Int = 0): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notawebp:$seed".getBytes("US-ASCII")
        else {
          def lum(x: Int, y: Int): Int = {
            val base = (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
            if (bumpCell != 0 && x == 3 && y == 2) (base + bumpCell) % 256
            else base
          }
          val bw = new Vp8lBits
          bw.bits(0x2f, 8) // signature
          bw.bits(9 - 1, 14); bw.bits(8 - 1, 14) // dims
          bw.bits(0, 1) // alpha hint
          bw.bits(0, 3) // version
          (seed % 4).toInt match {
            case 0 => // plain literals
              bw.bits(0, 1) // no transforms
              bw.bits(0, 1); bw.bits(0, 1) // no meta codes, no cache
              vp8lAll8(bw, 280) // green
              vp8lAll8(bw, 256); vp8lAll8(bw, 256) // red, blue
              vp8lSimple1(bw, 255) // alpha
              vp8lSimple1(bw, 0) // distance (unused)
              for (y <- 0 until 8; x <- 0 until 9) {
                val v = lum(x, y)
                bw.code(v, 8); bw.code(v, 8); bw.code(v, 8)
              }
            case 1 => // subtract-green
              bw.bits(1, 1); bw.bits(2, 2) // transform: subtract green
              bw.bits(0, 1) // no more transforms
              bw.bits(0, 1); bw.bits(0, 1)
              vp8lAll8(bw, 280) // green carries the value
              vp8lSimple1(bw, 0); vp8lSimple1(bw, 0) // red, blue residual 0
              vp8lSimple1(bw, 255); vp8lSimple1(bw, 0)
              for (y <- 0 until 8; x <- 0 until 9) bw.code(lum(x, y), 8)
            case 2 => // predictor transform: block 8 -> modes (L | T)
              bw.bits(1, 1); bw.bits(0, 2)
              bw.bits(3 - 2, 3) // size_bits: blocks of 8
              // 2x1 mode image (level > 0: no meta codes)
              bw.bits(0, 1) // no cache
              vp8lSimple2(bw, 1, 2) // green: mode 1 then mode 2
              vp8lSimple1(bw, 0); vp8lSimple1(bw, 0); vp8lSimple1(bw, 0)
              vp8lSimple1(bw, 0)
              bw.bits(0, 1) // mode image px 0: symbol 1 (code 0)
              bw.bits(1, 1) // mode image px 1: symbol 2 (code 1)
              bw.bits(0, 1) // no more transforms
              bw.bits(0, 1); bw.bits(0, 1)
              vp8lAll8(bw, 280); vp8lAll8(bw, 256); vp8lAll8(bw, 256)
              vp8lSimple1(bw, 0) // alpha residual is 0 everywhere
              vp8lSimple1(bw, 0)
              for (y <- 0 until 8; x <- 0 until 9) {
                // mirror the decoder's overrides: (0,0) black, first
                // row L, first col T; else block mode (x<8: L, x=8: T)
                val pred =
                  if (x == 0 && y == 0) 0
                  else if (y == 0) lum(x - 1, y)
                  else if (x == 0) lum(x, y - 1)
                  else if (x < 8) lum(x - 1, y)
                  else lum(x, y - 1)
                val res = (lum(x, y) - pred) & 0xff
                bw.code(res, 8); bw.code(res, 8); bw.code(res, 8)
              }
            case _ => // color indexing: delta-coded gray palette
              val grays = (for (y <- 0 until 8; x <- 0 until 9)
                yield lum(x, y)).distinct.sorted
              // pad to >16 entries so no pixel bundling kicks in (the
              // bundled path is spec-pinned in the unit tests instead)
              val pal = (grays ++ (0 until math.max(0, 17 - grays.size))
                .map(k => 256 + k)).toArray // filler entries never referenced
              val n = pal.length
              val idxOf = grays.zipWithIndex.toMap
              bw.bits(1, 1); bw.bits(3, 2) // transform: color indexing
              bw.bits(n - 1, 8)
              // palette image (n x 1), delta-coded per channel; filler
              // entries use red=1 so their gray delta stays in range
              bw.bits(0, 1) // no cache
              vp8lAll8(bw, 280) // green deltas
              vp8lAll8(bw, 256); vp8lAll8(bw, 256) // red, blue deltas
              vp8lSimple2(bw, 0, 255) // alpha deltas: 255 then 0s
              vp8lSimple1(bw, 0)
              var prev = 0
              for (k <- 0 until n) {
                val v = pal(k)
                val (r, g, b2) =
                  if (v < 256) (v, v, v)
                  else (v - 256, 0, 0) // filler: arbitrary, never used
                val cur = (255 << 24) | (r << 16) | (g << 8) | b2
                val dg = ((cur >>> 8) - (prev >>> 8)) & 0xff
                val dr = ((cur >>> 16) - (prev >>> 16)) & 0xff
                val db = (cur - prev) & 0xff
                val da = ((cur >>> 24) - (prev >>> 24)) & 0xff
                bw.code(dg, 8); bw.code(dr, 8); bw.code(db, 8)
                bw.bits(if (da == 0) 0 else 1, 1) // simple2(0,255)
                prev = cur
              }
              bw.bits(0, 1) // no more transforms
              // spatial image: palette indices in green
              bw.bits(0, 1); bw.bits(0, 1)
              vp8lAll8(bw, 280)
              vp8lSimple1(bw, 0); vp8lSimple1(bw, 0); vp8lSimple1(bw, 0)
              vp8lSimple1(bw, 0)
              for (y <- 0 until 8; x <- 0 until 9)
                bw.code(idxOf(lum(x, y)), 8)
          }
          vp8lContainer(bw.bytes)
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** [[jpegDcFromIds]] with a PLANTED EXIF APP1 segment spliced after
    * the SOI — the governance-triage fixture: orientation cycles
    * seed % 8 + 1 (the eight valid EXIF orientations), a GPS-IFD
    * pointer is present iff seed % 3 == 0 (the PII flag
    * [[graft.functions.ExifMetaExpression]] must raise), every third
    * EXIF block big-endian (MM — both byte orders must parse), and a
    * Make tag pads IFD0 so tag-order walking is exercised. Pixels are
    * untouched — the EXIF fixture dHashes identically to the plain DC
    * fixture (the strip-then-hash gate relies on it). Junk on
    * seed % 10 == 9 as everywhere. */
  def jpegExifFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    jpegDcFromIds(ids, idCol, idOffset).as[(Long, Array[Byte])].map {
      case (id, b) =>
        val seed = id - idOffset
        val isJpeg = b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
        val bytes =
          if (!isJpeg) b // junk member: pass through
          else {
            val app1 = exifApp1(
              orientation = (seed % 8 + 1).toInt,
              gps = seed % 3 == 0,
              bigEndian = seed % 3 == 2)
            val out = new Array[Byte](b.length + app1.length)
            out(0) = b(0); out(1) = b(1)
            app1.copyToArray(out, 2)
            System.arraycopy(b, 2, out, 2 + app1.length, b.length - 2)
            out
          }
        (id, bytes)
    }.toDF("media_id", "bytes")
  }

  /** One APP1 `Exif\0\0` segment wrapping [[exifTiff]]. */
  private def exifApp1(orientation: Int, gps: Boolean, bigEndian: Boolean): Array[Byte] = {
    val t = exifTiff(orientation, gps, bigEndian)
    val out = new Array[Byte](4 + 6 + t.length)
    out(0) = 0xff.toByte; out(1) = 0xe1.toByte
    val segLen = 2 + 6 + t.length
    out(2) = (segLen >>> 8).toByte; out(3) = segLen.toByte
    "Exif".getBytes("US-ASCII").copyToArray(out, 4)
    // out(8), out(9) stay 0
    t.copyToArray(out, 10)
    out
  }

  /** Bare TIFF with IFD0: Make (271, ASCII), Orientation (274, SHORT)
    * and optionally GPSInfo (34853, LONG → an empty GPS IFD), entries
    * in tag order per TIFF 6.0 — the JPEG APP1 segment and the WebP
    * EXIF chunk both wrap exactly this. */
  private def exifTiff(orientation: Int, gps: Boolean, bigEndian: Boolean): Array[Byte] = {
    val make = "graftcam\u0000".getBytes("US-ASCII") // 9 bytes incl. NUL
    val nEntries = if (gps) 3 else 2
    // TIFF layout: hdr(8) + count(2) + entries(12·n) + next(4) + make
    // + [gps IFD: count(2) + next(4)]
    val makeOff = 8 + 2 + 12 * nEntries + 4
    val gpsOff = makeOff + make.length
    val tiffLen = gpsOff + (if (gps) 6 else 0)
    val t = new Array[Byte](tiffLen)
    def w16(i: Int, v: Int): Unit =
      if (bigEndian) { t(i) = (v >>> 8).toByte; t(i + 1) = v.toByte }
      else { t(i) = v.toByte; t(i + 1) = (v >>> 8).toByte }
    def w32(i: Int, v: Int): Unit =
      if (bigEndian) { w16(i, v >>> 16); w16(i + 2, v & 0xffff) }
      else { w16(i, v & 0xffff); w16(i + 2, v >>> 16) }
    if (bigEndian) { t(0) = 'M'; t(1) = 'M' } else { t(0) = 'I'; t(1) = 'I' }
    w16(2, 42); w32(4, 8)
    w16(8, nEntries)
    var e = 10
    def entry(tag: Int, typ: Int, cnt: Int)(value: Int => Unit): Unit = {
      w16(e, tag); w16(e + 2, typ); w32(e + 4, cnt); value(e + 8); e += 12
    }
    entry(271, 2, make.length)(off => w32(off, makeOff)) // Make → offset
    entry(274, 3, 1)(off => w16(off, orientation))       // SHORT in situ
    if (gps) entry(34853, 4, 1)(off => w32(off, gpsOff)) // GPS IFD ptr
    w32(e, 0) // next-IFD
    make.copyToArray(t, makeOff)
    if (gps) { w16(gpsOff, 0); w32(gpsOff + 2, 0) } // empty GPS IFD
    t
  }

  /** PCM signal scan: appends the exact-integer stats struct from
    * [[graft.functions.AudioPcmStatsExpression]] over real 16-bit PCM
    * WAV bytes (bounded `maxFrames` window per record; NULL for
    * non-PCM/hostile bytes). Map-only. */
  def audioPcmScan(df: DataFrame, bytesCol: String, maxFrames: Int = 4096): DataFrame =
    df.withColumn("_pcm",
        graft.functions.MediaFunctions.audio_pcm_stats(col(bytesCol), maxFrames))
      .withColumn("sample_rate", col("_pcm").getField("sample_rate"))
      .withColumn("channels", col("_pcm").getField("channels"))
      .withColumn("n_frames", col("_pcm").getField("n_frames"))
      .withColumn("n_measured", col("_pcm").getField("n_measured"))
      .withColumn("sum_sq", col("_pcm").getField("sum_sq"))
      .withColumn("peak", col("_pcm").getField("peak"))
      .withColumn("clipped", col("_pcm").getField("clipped"))
      .drop("_pcm")

  /** Deterministic PCM-carrying WAV fixture: 64-frame 16-bit PCM WAVs
    * (mono for even seeds, stereo for odd) whose samples follow a
    * SQL-replayable arithmetic (v = (seed·37 + j·11) mod 2003 − 1001),
    * with a planted FULL-SCALE sample (32767 at index 5) on every
    * seed % 7 == 0 member and JUNK bytes on every seed % 10 == 9. */
  def wavPcmFromIds(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notawav:$seed".getBytes("US-ASCII")
        else {
          val ch = 1 + (seed % 2).toInt
          val frames = 64
          val nSamples = frames * ch
          val dataLen = nSamples * 2
          val out = new Array[Byte](44 + dataLen)
          Array[Byte]('R', 'I', 'F', 'F').copyToArray(out, 0)
          le32(36 + dataLen).copyToArray(out, 4)
          Array[Byte]('W', 'A', 'V', 'E', 'f', 'm', 't', ' ').copyToArray(out, 8)
          le32(16).copyToArray(out, 16)
          le16(1).copyToArray(out, 20) // PCM
          le16(ch).copyToArray(out, 22)
          le32(16000).copyToArray(out, 24)
          le32(16000 * ch * 2).copyToArray(out, 28)
          le16(ch * 2).copyToArray(out, 32)
          le16(16).copyToArray(out, 34)
          Array[Byte]('d', 'a', 't', 'a').copyToArray(out, 36)
          le32(dataLen).copyToArray(out, 40)
          var j = 0
          while (j < nSamples) {
            val v =
              if (seed % 7 == 0 && j == 5) 32767
              else (((seed * 37 + j * 11) % 2003) - 1001).toInt
            le16(v & 0xffff).copyToArray(out, 44 + j * 2)
            j += 1
          }
          out
        }
      (seed, bytes)
    }.toDF("media_id", "bytes")
  }

  /** AUDIO fingerprint scan: appends the 61-bit energy-delta
    * fingerprint from [[graft.functions.AudioFingerprintExpression]]
    * (NULL for non-PCM/hostile bytes). Map-only — the scan side of
    * the audio near-dup pipeline; pair it with
    * [[graft.ops.Dedup.hashNearDups]] for the banded join. */
  def audioFingerprintScan(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("afp",
      graft.functions.MediaFunctions.audio_fingerprint(col(bytesCol)))

  /** Deterministic TRANSCODE-FAMILY WAV fixture: the same recording
    * written the four ways a crawl actually delivers it. The base
    * signal is 128 mono frames whose quantized amplitude follows a
    * SQL-replayable xorshift-multiply hash of the frame index —
    * idx = (seed·128 + j) mod 10^6, x = idx·2654435761 mod 2^32,
    * x ^= x≫16, x = x·1103515245 mod 2^32, q = (x≫16 mod 256) − 128 —
    * stored as the 16-bit sample q·256. The NONLINEAR scramble
    * matters: any linear recipe (the raster fixtures' LCG included)
    * makes consecutive samples an arithmetic progression whose window
    * energies collapse to a small envelope family, flooding the
    * near-dup join with accidental collisions; the xor step breaks
    * linearity and measured cross-seed near-pairs to zero through
    * 10k seeds. Each `encoding` re-encodes that EXACT signal:
    *  - 0: 16-bit mono 16 kHz (the base),
    *  - 1: 8-bit unsigned mono 16 kHz (samples q+128 — the same
    *    ladder the 16-bit file quantizes),
    *  - 2: 16-bit stereo 16 kHz (the mono signal duplicated to both
    *    channels),
    *  - 3: 16-bit mono 32 kHz (each frame written twice — the
    *    duplicate-sample upsample).
    * [[graft.functions.AudioFingerprintExpression]] must hash all
    * four IDENTICALLY — that invariance is the near-dup property the
    * p370 gate pins. JUNK bytes on every seed % 10 == 9 member (the
    * fingerprint must NULL them, never die). `idOffset` keeps twin
    * member ids disjoint from the base range. */
  def wavEncodedFromIds(
      ids: DataFrame,
      idCol: String,
      encoding: Int,
      idOffset: Long = 0L): DataFrame = {
    require(encoding >= 0 && encoding <= 3,
      s"wavEncodedFromIds: encoding must be 0..3, got $encoding")
    val spark = ids.sparkSession
    import spark.implicits._
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notawav:$seed:$encoding".getBytes("US-ASCII")
        else {
          def q(j: Int): Int = {
            val idx = (seed * 128 + j) % 1000000
            var x = (idx * 2654435761L) % 4294967296L
            x ^= x >>> 16
            x = (x * 1103515245L) % 4294967296L
            ((x >>> 16) % 256).toInt - 128
          }
          val baseFrames = 128
          val (ch, bits, rate, frames) = encoding match {
            case 0 => (1, 16, 16000, baseFrames)
            case 1 => (1, 8, 16000, baseFrames)
            case 2 => (2, 16, 16000, baseFrames)
            case _ => (1, 16, 32000, baseFrames * 2)
          }
          val blockAlign = ch * bits / 8
          val dataLen = frames * blockAlign
          val out = new Array[Byte](44 + dataLen)
          Array[Byte]('R', 'I', 'F', 'F').copyToArray(out, 0)
          le32(36 + dataLen).copyToArray(out, 4)
          Array[Byte]('W', 'A', 'V', 'E', 'f', 'm', 't', ' ').copyToArray(out, 8)
          le32(16).copyToArray(out, 16)
          le16(1).copyToArray(out, 20) // PCM
          le16(ch).copyToArray(out, 22)
          le32(rate).copyToArray(out, 24)
          le32(rate * blockAlign).copyToArray(out, 28)
          le16(blockAlign).copyToArray(out, 32)
          le16(bits).copyToArray(out, 34)
          Array[Byte]('d', 'a', 't', 'a').copyToArray(out, 36)
          le32(dataLen).copyToArray(out, 40)
          var j = 0
          while (j < frames) {
            // encoding 3 plays each base frame twice (j/2); others 1:1
            val v = q(if (encoding == 3) j / 2 else j)
            var k = 0
            while (k < ch) {
              val off = 44 + j * blockAlign + k * (bits / 8)
              if (bits == 16) le16((v * 256) & 0xffff).copyToArray(out, off)
              else out(off) = (v + 128).toByte
              k += 1
            }
            j += 1
          }
          out
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** VIDEO frame sampling over animated GIFs: one row per sampled
    * frame — (media_id, frame_no, dhash) — via
    * [[graft.functions.VideoFrameHashesExpression]] + `posexplode`.
    * `stride` keeps every strideth frame (stride 1 = all frames).
    * Map-only + one generator; rows with undecodable payloads vanish
    * (posexplode of NULL), the triage-not-crash contract. */
  def videoFrameSample(df: DataFrame, bytesCol: String, stride: Int = 1): DataFrame = {
    require(stride >= 1, s"videoFrameSample: stride must be >= 1, got $stride")
    df.select(col("media_id"),
        posexplode(graft.functions.MediaFunctions.video_frame_hashes(col(bytesCol)))
          .as(Seq("frame_no", "dhash")))
      .where(col("frame_no") % stride === 0)
  }

  /** VIDEO near-dup: two videos pair when they share >= `minShared`
    * distinct frame hashes — the sampled-frame containment test that
    * catches re-encodes, trims and extended cuts of the same clip.
    * Candidate generation is an EQUI-JOIN on the frame hash (each
    * shared frame is a band key), never an all-pairs comparison;
    * dedup to distinct (video, hash) first so a clip looping one
    * frame cannot vote itself past the threshold. */
  def videoNearDups(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      minShared: Int = 2): DataFrame = {
    val frames = df.select(col(idCol),
        explode(graft.functions.MediaFunctions.video_frame_hashes(col(bytesCol)))
          .as("fh"))
      .distinct()
    val a = frames.select(col(idCol).as("a"), col("fh"))
    val b = frames.select(col(idCol).as("b"), col("fh"))
    a.join(b, Seq("fh"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** VIDEO scene-cut detection: a frame starts a new scene when its
    * perceptual hash lands >= `minHamming` bits from the previous
    * frame's — the frame-sample primitive that turns "sample every
    * Nth frame" into "sample every SCENE", the shape video curation
    * actually wants (uniform stride oversamples static shots and
    * misses fast cuts). One generator + one per-video window (the
    * only exchange; frame counts are MaxFrames-bounded so no window
    * partition can be large). Emits (media_id, frame_no, hamming)
    * for cut frames. */
  def videoSceneCuts(
      df: DataFrame,
      bytesCol: String,
      minHamming: Int = 4): DataFrame = {
    require(minHamming >= 1 && minHamming <= 64,
      s"videoSceneCuts: minHamming must be in [1, 64], got $minHamming")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_no")
    videoFrameSample(df, bytesCol)
      .withColumn("_prev", lag(col("dhash"), 1).over(w))
      .where(col("_prev").isNotNull)
      .withColumn("hamming",
        graft.ops.Dedup.popcount64(expr("dhash ^ _prev")))
      .where(col("hamming") >= minHamming)
      .select(col("media_id"), col("frame_no"), col("hamming"))
  }

  /** SUBTITLE cue extraction: SRT/WebVTT caption payloads exploded to
    * one row per cue — (media_id, cue_no, start_ms, end_ms, text) —
    * the bridge from the video pipeline into langid / quality /
    * dedup. Map-only + one generator; unparseable payloads vanish
    * (posexplode of NULL). */
  def subtitleCueScan(df: DataFrame, textCol: String): DataFrame =
    df.select(col("media_id"),
        posexplode(graft.functions.SubtitleFunctions.subtitle_cues(col(textCol)))
          .as(Seq("_pos", "cue")))
      .select(col("media_id"), col("cue.cue_no").as("cue_no"),
        col("cue.start_ms").as("start_ms"), col("cue.end_ms").as("end_ms"),
        col("cue.text").as("text"))

  /** Per-video CAPTION statistics: cue count, total speech time,
    * caption characters, and the integer reading rate (chars/sec) —
    * the quality numbers a caption-curation pass filters on. One
    * partial agg over the exploded cues. */
  def captionStats(df: DataFrame, textCol: String): DataFrame =
    subtitleCueScan(df, textCol)
      .groupBy("media_id")
      .agg(count(lit(1)).cast("int").as("n_cues"),
        sum(col("end_ms") - col("start_ms")).as("speech_ms"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .withColumn("chars_per_sec",
        (col("n_chars") * 1000L / col("speech_ms")).cast("long"))

  /** Deterministic SUBTITLE fixture: id % 3 cycles SRT (index lines +
    * comma millis), WebVTT (magic + dot millis, cue-identifier lines
    * on odd ids, a NOTE block up front), and JUNK prose (no cues —
    * must parse to NULL). Cue k of n = id % 4 + 1 starts at
    * (id % 50 + 10k) s, lasts k+1 s, and reads "cue <id> <k>" — all
    * SQL-replayable. */
  def subtitlesFromIds(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id")).as[Long].map { id =>
      def ts(ms: Long, comma: Boolean): String = {
        val s = ms / 1000
        f"${s / 3600}%02d:${s / 60 % 60}%02d:${s % 60}%02d" +
          (if (comma) f",${ms % 1000}%03d" else f".${ms % 1000}%03d")
      }
      val n = (id % 4 + 1).toInt
      val cues = (0 until n).map { k =>
        val start = (id % 50 + k * 10) * 1000
        val end = start + (k + 1) * 1000
        (start, end, s"cue $id $k")
      }
      val text = (id % 3) match {
        case 0 => // SRT
          cues.zipWithIndex.map { case ((s0, e0, t), k) =>
            s"${k + 1}\n${ts(s0, comma = true)} --> ${ts(e0, comma = true)}\n$t\n"
          }.mkString("\n")
        case 1 => // WebVTT
          "WEBVTT\n\nNOTE generated fixture\n\n" +
            cues.zipWithIndex.map { case ((s0, e0, t), k) =>
              val ident = if (id % 2 == 1) s"c$k\n" else ""
              s"$ident${ts(s0, comma = false)} --> ${ts(e0, comma = false)}\n$t\n"
            }.mkString("\n")
        case _ =>
          s"just some prose about item $id with no timestamps at all"
      }
      (id, text)
    }.toDF("media_id", "text")
  }

  /** Deterministic ANIMATED-GIF fixture: seed % 3 + 2 frames on a 9×8
    * canvas with a 256-entry grayscale GCT. Frame 0 is the full p340
    * LCG grid (so frame 0's hash replays the p352 arithmetic
    * verbatim); each later frame t is a PARTIAL update — a
    * one-row rect at top = t behind a Graphic Control Extension whose
    * transparency index (254) is planted at column c == t, so the
    * compositor must both place the rect and let the frame-0 pixel
    * show through the hole. Row pixels follow lcg((seed + t·131)·72 +
    * c mod 100000) mod 254 (the mod 254 keeps payload indices clear
    * of the transparency index). `extraFrame` appends one more
    * update (row F) — the twin shape the p372 near-dup gate pairs:
    * an EXTENDED CUT sharing every base frame. JUNK bytes on every
    * seed % 10 == 9 member. */
  def gifAnimFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      extraFrame: Boolean = false): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notanim:$seed".getBytes("US-ASCII")
        else {
          def lcg(i: Long): Int =
            (((1103515245L * (i % 100000L) + 12345L) % 2147483648L) /
              65536L % 256L).toInt
          val out = new java.io.ByteArrayOutputStream(2048)
          def w8(v: Int): Unit = out.write(v & 0xff)
          def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
          def writeCodes(px: Seq[Int]): Unit = {
            w8(8) // LZW min code size
            val codes = 256 +: px :+ 257 // CLEAR, literals, EOI (9-bit)
            val data = new java.io.ByteArrayOutputStream(96)
            var acc = 0; var nAcc = 0
            codes.foreach { c =>
              acc |= c << nAcc; nAcc += 9
              while (nAcc >= 8) { data.write(acc & 0xff); acc >>>= 8; nAcc -= 8 }
            }
            if (nAcc > 0) data.write(acc & 0xff)
            val d = data.toByteArray
            var i = 0
            while (i < d.length) {
              val n = math.min(255, d.length - i)
              w8(n); out.write(d, i, n); i += n
            }
            w8(0) // sub-block terminator
          }
          out.write("GIF89a".getBytes("US-ASCII"))
          w16(9); w16(8)
          w8(0xf7); w8(0); w8(0) // 256-entry GCT, background 0, aspect
          (0 until 256).foreach { k => w8(k); w8(k); w8(k) } // gray GCT
          // frame 0: the full p340 grid, no GCE
          w8(0x2c); w16(0); w16(0); w16(9); w16(8); w8(0)
          writeCodes(for (y <- 0 until 8; x <- 0 until 9)
            yield lcg(seed * 72 + y * 9 + x))
          // frames 1..F-1 (+ the extra): one-row rects with a
          // transparent hole at column t
          val last = (seed % 3 + 2).toInt - 1 + (if (extraFrame) 1 else 0)
          for (t <- 1 to last) {
            w8(0x21); w8(0xf9); w8(4) // GCE
            w8(1)                     // transparency flag on
            w16(0)                    // delay
            w8(254)                   // transparent index
            w8(0)                     // terminator
            w8(0x2c); w16(0); w16(t); w16(9); w16(1); w8(0)
            writeCodes((0 until 9).map { c =>
              if (c == t) 254
              else lcg((seed + t * 131L) * 72 + c) % 254
            })
          }
          w8(0x3b) // trailer
          out.toByteArray
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** Deterministic TIFF fixture: REAL baseline uncompressed TIFF 6.0
    * files — 8-bit grayscale, MULTI-STRIP (RowsPerStrip 4, so strip
    * arithmetic is exercised, not just single-strip), external
    * StripOffsets/StripByteCounts LONG arrays, byte order II for even
    * seeds and MM for odd (both orders must parse) — whose pixels
    * follow the standard p340 LCG grid, so the dHash oracle replays
    * the same arithmetic as every other raster fixture. With
    * `oriented = true` the file stores the grid camera-rotated by
    * orientation seed % 8 + 1 and carries tag 274 IN IFD0 (TIFF needs
    * no APP1 wrapper — the pixel IFD is the EXIF IFD), the input
    * shape for the orientation-normalized hash. JUNK bytes on every
    * seed % 10 == 9 member. */
  def tiffPixelsFromIds(
      ids: DataFrame,
      idCol: String,
      idOffset: Long = 0L,
      oriented: Boolean = false,
      bumpCell: Int = 0,
      gps: Boolean = false): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("_id")).as[Long].map { seed =>
      val bytes =
        if (seed % 10 == 9) s"notatiff:$seed".getBytes("US-ASCII")
        else {
          def base(x: Int, y: Int): Int = {
            val v = (((1103515245L * ((seed * 72 + y * 9 + x) % 100000L) +
              12345L) % 2147483648L) / 65536L % 256L).toInt
            if (bumpCell != 0 && x == 3 && y == 2) (v + bumpCell) % 256
            else v
          }
          val o = if (oriented) (seed % 8 + 1).toInt else 0
          val (bw, bh) = if (o >= 5) (8, 9) else (9, 8)
          def stored(x: Int, y: Int): Int = o match {
            case 0 | 1 => base(x, y)
            case 2 => base(8 - x, y)
            case 3 => base(8 - x, 7 - y)
            case 4 => base(x, 7 - y)
            case 5 => base(y, x)
            case 6 => base(8 - y, x)
            case 7 => base(8 - y, 7 - x)
            case _ => base(y, 7 - x) // 8
          }
          val be = seed % 2 == 1
          val rps = 4
          val nStrips = (bh + rps - 1) / rps
          // GPS planted on every gps-fixture seed % 3 == 0 member: a
          // tag-34853 pointer to a one-entry GPS IFD (the PII channel
          // the p385 redaction gate must find, wipe, and re-verify)
          val hasGps = gps && seed % 3 == 0
          val nEntries = (if (o > 0) 10 else 9) + (if (hasGps) 1 else 0)
          val soOff = 8 + 2 + nEntries * 12 + 4
          val scOff = soOff + 4 * nStrips
          val gpsOff = scOff + 4 * nStrips
          val dataOff = gpsOff + (if (hasGps) 18 else 0)
          val out = new Array[Byte](dataOff + bw * bh)
          def w16(i: Int, v: Int): Unit =
            if (be) { out(i) = (v >>> 8).toByte; out(i + 1) = v.toByte }
            else { out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte }
          def w32(i: Int, v: Int): Unit =
            if (be) { w16(i, v >>> 16); w16(i + 2, v & 0xffff) }
            else { w16(i, v & 0xffff); w16(i + 2, v >>> 16) }
          out(0) = if (be) 'M' else 'I'
          out(1) = out(0)
          w16(2, 42)
          w32(4, 8) // IFD0 right after the header
          var p = 8
          w16(p, nEntries); p += 2
          def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit = {
            w16(p, tag); w16(p + 2, typ); w32(p + 4, cnt)
            if (typ == 3) { w16(p + 8, value); w16(p + 10, 0) }
            else w32(p + 8, value)
            p += 12
          }
          entry(256, 3, 1, bw)
          entry(257, 3, 1, bh)
          entry(258, 3, 1, 8)
          entry(259, 3, 1, 1) // uncompressed
          entry(262, 3, 1, 1) // BlackIsZero
          entry(273, 4, nStrips, soOff)
          if (o > 0) entry(274, 3, 1, o)
          entry(277, 3, 1, 1)
          entry(278, 3, 1, rps)
          entry(279, 4, nStrips, scOff)
          if (hasGps) entry(34853, 4, 1, gpsOff)
          w32(p, 0) // no next IFD
          if (hasGps) {
            // GPS IFD: one GPSLatitudeRef entry ("N"), no next IFD
            w16(gpsOff, 1)
            w16(gpsOff + 2, 1); w16(gpsOff + 4, 2) // tag 1, ASCII
            w32(gpsOff + 6, 2) // count
            out(gpsOff + 10) = 'N'; out(gpsOff + 11) = 0
            w32(gpsOff + 14, 0)
          }
          var s = 0
          while (s < nStrips) {
            val rowsIn = math.min(rps, bh - s * rps)
            w32(soOff + 4 * s, dataOff + s * rps * bw)
            w32(scOff + 4 * s, rowsIn * bw)
            s += 1
          }
          var y = 0
          while (y < bh) {
            var x = 0
            while (x < bw) {
              out(dataOff + y * bw + x) = stored(x, y).toByte
              x += 1
            }
            y += 1
          }
          out
        }
      (seed + idOffset, bytes)
    }.toDF("media_id", "bytes")
  }

  /** Deterministic header-bytes fixture: builds REAL container headers
    * (PNG IHDR, GIF89a logical screen, BMP BITMAPINFOHEADER, minimal
    * JPEG SOI+SOF0) with dimensions derived from the id — width
    * id % 640 + 32, height id % 480 + 32, format cycling by id % 5
    * with the fifth slot JUNK bytes (triage must map them to unknown,
    * never die). The p312 harness input: the oracle recomputes the
    * dims arithmetically, so any parser drift hash-fails. */
  def headerBytesFromIds(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    ids.select(col(idCol).cast("long").as("media_id"))
      .as[Long]
      .map { id =>
        val w = (id % 640 + 32).toInt
        val h = (id % 480 + 32).toInt
        val bytes = (id % 5) match {
          case 0 => // PNG signature + IHDR chunk
            Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
              be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
              Array[Byte](8, 6, 0, 0, 0)
          case 1 => // GIF89a logical screen descriptor
            "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
              Array[Byte](0, 0, 0)
          case 2 => // BM + file header + BITMAPINFOHEADER prefix
            "BM".getBytes("US-ASCII") ++ le32(0) ++ le32(0) ++ le32(54) ++
              le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24)
          case 3 => // SOI + SOF0 (len 17, precision 8, h, w, 3 comps)
            Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xc0.toByte,
              0x00, 0x11, 0x08) ++ be16(h) ++ be16(w) ++ Array[Byte](3)
          case _ => // junk: must triage to unknown
            s"notanimage:$id".getBytes("US-ASCII")
        }
        (id, bytes)
      }
      .toDF("media_id", "bytes")
  }

  /** AUDIO header triage: container format + CLAIMED stream parameters
    * from the first bytes only ([[graft.functions.AudioMetaExpression]]
    * — WAV `fmt ` chunk walk + FLAC STREAMINFO, junk →
    * ("unknown", −1, −1, −1)). Same ≤-a-few-dozen-bytes-per-row
    * map-only shape as [[imageHeaderScan]]. Appends
    * format/channels/sample_rate/bits_per_sample. */
  def audioHeaderScan(df: DataFrame, bytesCol: String): DataFrame = {
    val meta = graft.functions.MediaFunctions.audio_meta(col(bytesCol))
    df.withColumn("_meta", meta)
      .withColumn("format", col("_meta").getField("format"))
      .withColumn("channels", col("_meta").getField("channels"))
      .withColumn("sample_rate", col("_meta").getField("sample_rate"))
      .withColumn("bits_per_sample", col("_meta").getField("bits_per_sample"))
      .drop("_meta")
  }

  /** Deterministic WEBP/TIFF header fixture — [[headerBytesFromIds]]'s
    * round-13 sibling covering the formats a modern crawl actually
    * carries: id % 6 cycles WEBP-VP8 (lossy frame tag + 9D012A sync),
    * WEBP-VP8L (lossless bit-packed dims), WEBP-VP8X (24-bit canvas),
    * TIFF little-endian and TIFF big-endian (2-entry IFD, SHORT
    * width/LONG height to exercise both value widths), and JUNK. Same
    * dim arithmetic as p312 (width id % 640 + 32, height
    * id % 480 + 32 — both < 2¹⁴, inside VP8's 14-bit fields), so the
    * oracle recomputes everything arithmetically. */
  /** ISOBMFF (AVIF/HEIC) header fixture for the dims triage: real
    * `ftyp` + `meta`→`iprp`→`ipco`→`ispe` box trees with id-derived
    * dims (the p317 arithmetic), cycling by id % 6 — 0: avif major
    * brand; 1: heic major; 2: generic `mif1` major with avif in the
    * COMPATIBLE list (the common libavif layout); 3: avif with TWO
    * ispe properties, thumbnail first (largest-area must win); 4: avif
    * whose meta box uses the 64-bit largesize header; 5: junk. */
  def isobmffBytesFromIds(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]) =
      be32(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    def fullbox(typ: String, payload: Array[Byte]) =
      box(typ, Array[Byte](0, 0, 0, 0) ++ payload)
    def ispe(w: Int, h: Int) = fullbox("ispe", be32(w) ++ be32(h))
    def tree(ispes: Array[Byte]) =
      fullbox("meta", box("iprp", box("ipco", ispes)))
    def ftyp(major: String, compat: String*) =
      box("ftyp", major.getBytes("US-ASCII") ++ be32(0) ++
        compat.flatMap(_.getBytes("US-ASCII")).toArray)
    val mdat = box("mdat", Array[Byte](1, 2, 3, 4))
    ids.select(col(idCol).cast("long").as("media_id"))
      .as[Long]
      .map { id =>
        val w = (id % 640 + 32).toInt
        val h = (id % 480 + 32).toInt
        val bytes = (id % 6) match {
          case 0 => ftyp("avif", "mif1") ++ tree(ispe(w, h)) ++ mdat
          case 1 => ftyp("heic", "mif1") ++ tree(ispe(w, h)) ++ mdat
          case 2 => ftyp("mif1", "miaf", "avif") ++ tree(ispe(w, h)) ++ mdat
          case 3 => // thumbnail ispe first: the primary (larger) wins
            ftyp("avif", "mif1") ++
              tree(ispe(w / 4 + 1, h / 4 + 1) ++ ispe(w, h)) ++ mdat
          case 4 => // meta via the 64-bit largesize header
            val inner = Array[Byte](0, 0, 0, 0) ++
              box("iprp", box("ipco", ispe(w, h)))
            ftyp("avif", "mif1") ++
              (be32(1) ++ "meta".getBytes("US-ASCII") ++
                be32(0) ++ be32(16 + inner.length) ++ inner) ++ mdat
          case _ => s"notanisobmff:$id".getBytes("US-ASCII")
        }
        (id, bytes)
      }
      .toDF("media_id", "bytes")
  }

  def webpTiffBytesFromIds(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le24(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def riff(fourcc: String, payload: Array[Byte]) =
      "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + payload.length) ++
        "WEBP".getBytes("US-ASCII") ++ fourcc.getBytes("US-ASCII") ++
        le32(payload.length) ++ payload
    ids.select(col(idCol).cast("long").as("media_id"))
      .as[Long]
      .map { id =>
        val w = (id % 640 + 32).toInt
        val h = (id % 480 + 32).toInt
        val bytes = (id % 6) match {
          case 0 => // VP8 lossy: frame tag + sync + 14-bit dims
            riff("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++
              le16(w) ++ le16(h))
          case 1 => // VP8L lossless: 2F + (w-1 | (h-1)<<14) LE
            riff("VP8L", Array[Byte](0x2f) ++
              le32((w - 1) | ((h - 1) << 14)))
          case 2 => // VP8X extended: 4 flag bytes + 24-bit canvas-1
            riff("VP8X", Array[Byte](0, 0, 0, 0) ++ le24(w - 1) ++ le24(h - 1))
          case 3 => // TIFF LE: IFD at 8, SHORT width + LONG height
            "II".getBytes("US-ASCII") ++ Array[Byte](0x2a, 0) ++ le32(8) ++
              le16(2) ++
              le16(256) ++ le16(3) ++ le32(1) ++ le16(w) ++ le16(0) ++
              le16(257) ++ le16(4) ++ le32(1) ++ le32(h) ++
              le32(0)
          case 4 => // TIFF BE: same IFD, big-endian, value left-justified
            "MM".getBytes("US-ASCII") ++ Array[Byte](0, 0x2a) ++ be32(8) ++
              be16(2) ++
              be16(256) ++ be16(3) ++ be32(1) ++ be16(w) ++ be16(0) ++
              be16(257) ++ be16(4) ++ be32(1) ++ be32(h) ++
              be32(0)
          case _ => // junk: must triage to unknown
            s"notanimage:$id".getBytes("US-ASCII")
        }
        (id, bytes)
      }
      .toDF("media_id", "bytes")
  }

  /** VIDEO header triage: container format + CLAIMED track dimensions
    * from the first bytes only ([[graft.functions.VideoMetaExpression]]
    * — ISO-BMFF box walk to `tkhd`, EBML walk to PixelWidth/Height;
    * junk → ("unknown", −1, −1)). Same ≤-a-few-dozen-bytes-per-row
    * map-only shape as [[imageHeaderScan]]. Appends
    * format/width/height. */
  def videoHeaderScan(df: DataFrame, bytesCol: String): DataFrame = {
    val meta = graft.functions.MediaFunctions.video_meta(col(bytesCol))
    df.withColumn("_meta", meta)
      .withColumn("format", col("_meta").getField("format"))
      .withColumn("width", col("_meta").getField("width"))
      .withColumn("height", col("_meta").getField("height"))
      .drop("_meta")
  }

  /** Deterministic video header fixture — the p323 harness input.
    * id % 6 cycles: a REAL MP4 (ftyp + moov/trak/tkhd) with a
    * version-0 tkhd, a version-1 tkhd (64-bit time fields — the other
    * width offset), the same v0 MP4 behind a leading `free` box (the
    * top-level walk must skip it), a WebM (EBML header with DocType
    * "webm" + Segment/Tracks/TrackEntry/Video/PixelWidth+Height), a
    * Matroska whose Segment claims UNKNOWN size (all-ones vint — the
    * live-remux shape, must extend to EOF), and JUNK. Same dim
    * arithmetic as p312/p317 (width id % 640 + 32, height
    * id % 480 + 32), so the oracle recomputes everything
    * arithmetically and any walker drift hash-fails. */
  def videoBytesFromIds(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]) =
      be32(payload.length + 8) ++ typ.getBytes("US-ASCII") ++ payload
    // single-byte EBML size vint (content < 127 bytes in this fixture)
    def el(id: Array[Byte], content: Array[Byte]) =
      id ++ Array((0x80 | content.length).toByte) ++ content
    ids.select(col(idCol).cast("long").as("media_id"))
      .as[Long]
      .map { id =>
        val w = (id % 640 + 32).toInt
        val h = (id % 480 + 32).toInt
        def mp4(v1: Boolean, leadingFree: Boolean): Array[Byte] = {
          val tkhd = box("tkhd",
            Array[Byte](if (v1) 1 else 0, 0, 0, 0) ++
              new Array[Byte](if (v1) 32 else 20) ++ // times/id/reserved/duration
              new Array[Byte](16) ++ // reserved/layer/group/volume/reserved
              new Array[Byte](36) ++ // identity-less matrix: zeros fine for triage
              be32(w << 16) ++ be32(h << 16)) // 16.16 fixed-point
          val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
          val free = if (leadingFree) box("free", new Array[Byte](4))
            else Array.emptyByteArray
          ftyp ++ free ++ box("moov", box("trak", tkhd))
        }
        def ebml(docType: String, unknownSegSize: Boolean): Array[Byte] = {
          val header = el(Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte),
            el(Array(0x42, 0x82).map(_.toByte), docType.getBytes("US-ASCII")))
          val video = el(Array(0xe0.toByte),
            el(Array(0xb0.toByte), be16(w)) ++ el(Array(0xba.toByte), be16(h)))
          val tracks = el(Array(0x16, 0x54, 0xae, 0x6b).map(_.toByte),
            el(Array(0xae.toByte), video))
          val segId = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte)
          val seg = if (unknownSegSize) segId ++ Array(0xff.toByte) ++ tracks
            else el(segId, tracks)
          header ++ seg
        }
        val bytes = (id % 6) match {
          case 0 => mp4(v1 = false, leadingFree = false)
          case 1 => mp4(v1 = true, leadingFree = false)
          case 2 => mp4(v1 = false, leadingFree = true)
          case 3 => ebml("webm", unknownSegSize = false)
          case 4 => ebml("matroska", unknownSegSize = true)
          case _ => s"notavideo:$id".getBytes("US-ASCII")
        }
        (id, bytes)
      }
      .toDF("media_id", "bytes")
  }

  /** AUDIO metadata governance scan: appends container + tag-channel
    * presence flags + envelope byte counts from
    * [[graft.functions.AudioMetaGovExpression]]. Map-only. */
  def audioMetaGovScan(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("_gov",
        graft.functions.MediaFunctions.audio_meta_gov(col(bytesCol)))
      .withColumn("container", col("_gov").getField("container"))
      .withColumn("has_id3v2", col("_gov").getField("has_id3v2"))
      .withColumn("has_id3v1", col("_gov").getField("has_id3v1"))
      .withColumn("has_comment", col("_gov").getField("has_comment"))
      .withColumn("meta_bytes", col("_gov").getField("meta_bytes"))
      .drop("_gov")

  /** Deterministic TAGGED-audio fixture for the governance pair:
    * id % 4 cycles WAV / FLAC / MP3 / junk, each (where planted —
    * (id/4) % 2 == 0) carrying its container's metadata channel with
    * id-derived envelope sizes, so the triage AND the post-strip
    * lengths replay arithmetically:
    *  - WAV: `LIST`/`INFO` chunk with one `IART` entry of
    *    (id%6)·2+4 bytes, between the fmt chunk and a REAL 64-frame
    *    16-bit PCM data chunk whose samples follow the p369 xorshift
    *    recipe (the strip must leave them byte-identical);
    *  - FLAC: STREAMINFO (rate (id%12+2)·4000) + a VORBIS_COMMENT
    *    block of (id%7)·3+8 payload bytes carrying the last-block
    *    flag (the strip must repair the flag onto STREAMINFO);
    *  - MP3: ID3v2 envelope with syncsafe payload (id%9)+4 ahead of
    *    the frame header (rate table id%3), plus an ID3v1 128-byte
    *    trailer on planted members. */
  def audioTaggedFromIds(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    ids.select(col(idCol).cast("long").as("media_id")).as[Long].map { id =>
      val planted = (id / 4) % 2 == 0
      val rate = ((id % 12 + 2) * 4000).toInt
      val bytes = (id % 4) match {
        case 0 =>
          val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
            le16(1) ++ le16(1) ++ le32(rate) ++ le32(rate * 2) ++
            le16(2) ++ le16(16)
          val artLen = ((id % 6) * 2 + 4).toInt
          val info = if (planted)
            "LIST".getBytes("US-ASCII") ++ le32(12 + artLen) ++
              "INFOIART".getBytes("US-ASCII") ++ le32(artLen) ++
              Array.fill[Byte](artLen)('a')
          else Array.emptyByteArray
          val data = new Array[Byte](8 + 128)
          "data".getBytes("US-ASCII").copyToArray(data, 0)
          le32(128).copyToArray(data, 4)
          var j = 0
          while (j < 64) {
            val idx = (id * 128 + j) % 1000000
            var x = (idx * 2654435761L) % 4294967296L
            x ^= x >>> 16
            x = (x * 1103515245L) % 4294967296L
            val v = (((x >>> 16) % 256).toInt - 128) * 256
            data(8 + j * 2) = v.toByte
            data(8 + j * 2 + 1) = (v >>> 8).toByte
            j += 1
          }
          "RIFF".getBytes("US-ASCII") ++
            le32(4 + fmt.length + info.length + data.length) ++
            "WAVE".getBytes("US-ASCII") ++ fmt ++ info ++ data
        case 1 =>
          val si = new Array[Byte](34)
          si(10) = (rate >>> 12).toByte
          si(11) = ((rate >>> 4) & 0xff).toByte
          si(12) = (((rate & 0xf) << 4) | 0x00).toByte // mono, bits-1 high 0
          si(13) = (15 << 4).toByte // bits 16
          val vcLen = ((id % 7) * 3 + 8).toInt
          if (planted)
            "fLaC".getBytes("US-ASCII") ++
              Array[Byte](0, 0, 0, 34) ++ si ++
              Array[Byte]((0x80 | 4).toByte, 0, 0, vcLen.toByte) ++
              Array.fill[Byte](vcLen)('c')
          else
            "fLaC".getBytes("US-ASCII") ++
              Array[Byte](0x80.toByte, 0, 0, 34) ++ si
        case 2 =>
          val r = (id % 3).toInt
          val frame = Array[Byte](0xff.toByte, 0xfb.toByte,
            (0x90 | (r << 2)).toByte, 0x40.toByte)
          if (planted) {
            val tagSize = ((id % 9) + 4).toInt
            val v1 = new Array[Byte](128)
            v1(0) = 'T'; v1(1) = 'A'; v1(2) = 'G'
            "ID3".getBytes("US-ASCII") ++
              Array[Byte](4, 0, 0, 0, 0, 0, tagSize.toByte) ++
              new Array[Byte](tagSize) ++ frame ++ v1
          } else frame
        case _ =>
          s"notameta:$id".getBytes("US-ASCII")
      }
      (id, bytes)
    }.toDF("media_id", "bytes")
  }

  /** Deterministic audio header fixture: id % 4 cycles a REAL WAV
    * (RIFF/WAVE with a leading JUNK chunk on every third row to
    * exercise the chunk walk, PCM `fmt `), a REAL FLAC (fLaC +
    * STREAMINFO with bit-packed rate/channels/bits), a REAL MP3 frame
    * header (MPEG1 Layer III, behind an ID3v2 envelope on every third
    * row), and JUNK bytes. Parameters derive from the id so every
    * branch genuinely VARIES within its slot (the vacuous-fixture
    * trap): channels (id div 4) % 2 + 1; WAV/FLAC rate
    * (id % 12 + 2)·4000 (< 2²⁰, inside FLAC's 20-bit field); WAV bits
    * ((id div 4) % 4 + 1)·8, FLAC bits id % 24 + 8 (≤ 31, inside the
    * 5-bit bits-1 field); MP3 rate from the (MPEG1, id % 3) table —
    * the oracle recomputes all of it arithmetically, so any parser
    * drift hash-fails. */
  def audioBytesFromIds(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    ids.select(col(idCol).cast("long").as("media_id"))
      .as[Long]
      .map { id =>
        val rate = ((id % 12 + 2) * 4000).toInt
        val ch = ((id / 4) % 2 + 1).toInt
        val bytes = (id % 4) match {
          case 0 =>
            val bits = (((id / 4) % 4 + 1) * 8).toInt
            val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
              le16(1) ++ le16(ch) ++ le32(rate) ++
              le32(rate * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits)
            val lead = if ((id / 4) % 3 == 0)
              "JUNK".getBytes("US-ASCII") ++ le32(4) ++ Array[Byte](0, 0, 0, 0)
            else Array.emptyByteArray
            "RIFF".getBytes("US-ASCII") ++ le32(4 + lead.length + fmt.length) ++
              "WAVE".getBytes("US-ASCII") ++ lead ++ fmt
          case 1 =>
            val bits = (id % 24 + 8).toInt
            val si = new Array[Byte](34)
            si(10) = (rate >>> 12).toByte
            si(11) = ((rate >>> 4) & 0xff).toByte
            si(12) = (((rate & 0xf) << 4) | ((ch - 1) << 1) |
              ((bits - 1) >>> 4)).toByte
            si(13) = (((bits - 1) & 0xf) << 4).toByte
            "fLaC".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 34) ++ si
          case 2 =>
            val r = (id % 3).toInt // MPEG1 table: 44100 / 48000 / 32000
            val frame = Array[Byte](0xff.toByte, 0xfb.toByte,
              (0x90 | (r << 2)).toByte,
              (if (ch == 1) 0xc0 else 0x40).toByte)
            val id3 = if ((id / 4) % 3 == 0)
              "ID3".getBytes("US-ASCII") ++
                Array[Byte](4, 0, 0, 0, 0, 0, 8) ++ new Array[Byte](8)
            else Array.emptyByteArray
            id3 ++ frame
          case _ =>
            s"notaudio:$id".getBytes("US-ASCII")
        }
        (id, bytes)
      }
      .toDF("media_id", "bytes")
  }

  /** End-to-end multimodal profile: media table → batched decode →
    * per-row feature digest; the driver-surface query. The feature is
    * surfaced as the INTEGER bucket-0 byte count (recovered exactly from
    * the float histogram: count = ratio × n, exact below 2^24) so the
    * DuckDB oracle compares integers, not float32 round-offs. */
  def profile(spark: SparkSession, documents: DataFrame): DataFrame = {
    val feats = extractFeatures(mediaFromDocuments(spark, documents))
    feats.toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"),
        round(element_at(col("features"), 1).cast("double") *
          greatest(col("n_bytes"), lit(1))).cast("long").as("f0_count"))
      .orderBy("media_id")
  }
}
