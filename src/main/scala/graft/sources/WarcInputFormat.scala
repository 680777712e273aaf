package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, InputStream}

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{BytesWritable, NullWritable}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}

/** LOSSLESS splittable WARC (ISO 28500) input — the "custom InputFormat
  * that walks Content-Length from each split boundary" upgrade that
  * [[Warc]]'s text-split path documents as its drop-in alternative.
  *
  * Why it exists: the `lineSep` reader splits on the inter-record byte
  * sequence, so a payload that EMBEDS that sequence false-splits (the
  * committed fixture's pathological record) — detectable via
  * `length_ok`, but the record itself is unrecoverable on that path.
  * This format never splits on content: within a split it walks the
  * record grammar exactly — version line, headers to the blank line,
  * `Content-Length` payload octets, trailing CRLF CRLF — so embedded
  * boundary bytes are just payload.
  *
  * Distribution contract (the standard Hadoop text-input convention):
  * a record belongs to the split holding its FIRST byte; a reader whose
  * split starts mid-file scans forward to the next `WARC/1.` magic and
  * validates it by parsing headers (a candidate without a well-formed
  * header block + Content-Length is skipped and the scan resumes), then
  * walks records until the current record's start crosses the split
  * end — no overlap, no gap, and the resync risk is confined to split
  * boundaries (one per ~128 MB) instead of every record. Compressed
  * inputs (`.warc.gz`) are detected via the codec factory and read
  * whole-file (not splittable — gzip is not seekable); at crawl scale
  * the standard layout is many multi-GB files, which parallelizes by
  * file there and by block here.
  *
  * Emits one `BytesWritable` per record: the header block (version
  * line dropped), the blank-line CRLF, then the RAW payload octets —
  * exactly the `_rec` shape [[Warc.records]]' column parser consumes.
  * Truncated tails (EOF inside a payload) emit short, surfacing as
  * `length_ok = false` downstream rather than dying. */
class WarcInputFormat extends FileInputFormat[NullWritable, BytesWritable] {
  override protected def isSplitable(ctx: JobContext, file: Path): Boolean =
    new CompressionCodecFactory(ctx.getConfiguration).getCodec(file) == null
  override def createRecordReader(
      split: InputSplit,
      ctx: TaskAttemptContext): RecordReader[NullWritable, BytesWritable] =
    new WarcRecordReader
}

class WarcRecordReader extends RecordReader[NullWritable, BytesWritable] {
  private val Magic = "WARC/1.".getBytes("US-ASCII")
  private val MaxHeaderBytes = 1 << 16
  // a hostile Content-Length must not allocate the heap: records past
  // this are skipped via resync (crawl WARCs cap records ~1 GiB; this
  // reader is for header+payload records that fit a task comfortably)
  private val MaxRecordBytes = (1L << 30) - 16

  private var in: InputStream = _
  private var pos = 0L // absolute (uncompressed-stream) offset
  private var start = 0L
  private var end = 0L
  private var done = false
  private var afterMagic = false // resync already consumed the magic
  private val value = new BytesWritable()

  override def initialize(genericSplit: InputSplit, ctx: TaskAttemptContext): Unit = {
    val split = genericSplit.asInstanceOf[FileSplit]
    val conf = ctx.getConfiguration
    val path = split.getPath
    val fs = path.getFileSystem(conf)
    val raw = fs.open(path)
    val codec = new CompressionCodecFactory(conf).getCodec(path)
    if (codec != null) {
      // isSplitable said no: one split, whole file through the codec
      start = 0L
      end = Long.MaxValue
      in = new BufferedInputStream(codec.createInputStream(raw), 1 << 16)
      pos = 0L
    } else {
      start = split.getStart
      end = start + split.getLength
      raw.seek(start)
      in = new BufferedInputStream(raw, 1 << 16)
      pos = start
      if (start > 0) syncToMagic()
    }
  }

  private def read1(): Int = { val b = in.read(); if (b >= 0) pos += 1; b }

  /** Scan forward to just past the next `WARC/1.` occurrence. */
  private def syncToMagic(): Unit = {
    var m = 0
    while (true) {
      val b = read1()
      if (b < 0) { done = true; return }
      if (b == Magic(m)) {
        m += 1
        if (m == Magic.length) { afterMagic = true; return }
      } else m = if (b == Magic(0)) 1 else 0
    }
  }

  /** One CRLF-terminated line, CRLF stripped, byte-transparent
    * (ISO-8859-1); null on EOF or an overlong line. */
  private def readLine(): String = {
    val out = new ByteArrayOutputStream(128)
    var prev = -1
    while (out.size() < MaxHeaderBytes) {
      val b = read1()
      if (b < 0) return null
      if (prev == '\r' && b == '\n') {
        val a = out.toByteArray
        return new String(a, 0, a.length - 1, "ISO-8859-1")
      }
      out.write(b)
      prev = b
    }
    null
  }

  override def nextKeyValue(): Boolean = {
    while (!done) {
      val recStart = if (afterMagic) pos - Magic.length else pos
      // ownership: first byte of the record decides the split
      if (recStart >= end) return false
      if (afterMagic) {
        afterMagic = false
        // consume the rest of the version line ("0"/"1"); anything
        // longer is payload that happened to contain the magic — resync
        val rest = readLine()
        if (rest == null) { done = true; return false }
        if (rest.length > 8) { syncToMagic(); () }
        else if (!parseOne()) () else return true
      } else {
        val vline = readLine()
        if (vline == null) { done = true; return false }
        if (vline.isEmpty) () // stray blank between records: skip
        else if (!vline.startsWith("WARC/1.")) syncToMagic()
        else if (parseOne()) return true
      }
    }
    false
  }

  /** Headers + Content-Length payload from the current position (just
    * past the version line). True when `value` holds a record; false
    * to make the caller resync/continue. */
  private def parseOne(): Boolean = {
    val hdr = new ByteArrayOutputStream(512)
    var contentLength = -1L
    var line = readLine()
    while (line != null && line.nonEmpty) {
      hdr.write(line.getBytes("ISO-8859-1"), 0, line.length)
      hdr.write('\r'); hdr.write('\n')
      val ci = line.indexOf(':')
      if (ci > 0 && line.substring(0, ci).trim.equalsIgnoreCase("Content-Length"))
        contentLength =
          try line.substring(ci + 1).trim.toLong
          catch { case _: NumberFormatException => -1L }
      line = readLine()
    }
    if (line == null) { done = true; return false } // truncated header block
    if (contentLength < 0 || contentLength > MaxRecordBytes) {
      syncToMagic() // malformed or hostile length: skip this candidate
      return false
    }
    hdr.write('\r'); hdr.write('\n') // the header/payload blank line
    val payload = new Array[Byte](contentLength.toInt)
    var off = 0
    var eof = false
    while (off < payload.length && !eof) {
      val n = in.read(payload, off, payload.length - off)
      if (n < 0) eof = true
      else { off += n; pos += n }
    }
    if (eof) done = true // truncated tail: emit short, then stop
    else {
      // consume the trailing CRLF CRLF when present; leave anything
      // else in place (the next loop pass resyncs on it)
      in.mark(8)
      val t = new Array[Byte](4)
      var k = 0
      var r = 0
      while (k < 4 && { r = in.read(t, k, 4 - k); r > 0 }) k += r
      if (k == 4 && t(0) == '\r' && t(1) == '\n' && t(2) == '\r' && t(3) == '\n')
        pos += 4
      else in.reset()
    }
    val h = hdr.toByteArray
    val rec = new Array[Byte](h.length + off)
    System.arraycopy(h, 0, rec, 0, h.length)
    System.arraycopy(payload, 0, rec, h.length, off)
    value.set(rec, 0, rec.length)
    true
  }

  override def getCurrentKey: NullWritable = NullWritable.get()
  override def getCurrentValue: BytesWritable = value
  override def getProgress: Float =
    if (end <= start || end == Long.MaxValue) 0f
    else math.min(1f, (pos - start).toFloat / (end - start))
  override def close(): Unit = if (in != null) in.close()
}
