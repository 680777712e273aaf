package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis
import graft.sources.Warc

/** WARC ingestion ([[Warc]]): the committed ISO 28500 fixture pins
  * record splitting, header extraction, Content-Length validation, the
  * false-split detection contract (a payload embedding the inter-record
  * byte sequence must surface as length_ok = false, never parse
  * silently wrong), and the composed WARC → HTTP body → html→text
  * chain. Fixture generated offline by `tools/make_warc_fixture.py`. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val path = "src/test/resources/fixture_crawl.warc"

  test("records: types, headers, payload length validation") {
    val rows = Warc.records(spark, path)
      .orderBy("record_id").collect()
    // 5 real records; the pathological one splits into 2 fragments
    assert(rows.length == 6)
    val byId = rows.filter(!_.isNullAt(1))
      .map(r => r.getString(1) -> r).toMap
    assert(byId("<urn:uuid:00000000-0000-0000-0000-000000000001>").getString(0) == "warcinfo")
    assert(byId("<urn:uuid:00000000-0000-0000-0000-000000000002>").getString(0) == "request")
    val a = byId("<urn:uuid:00000000-0000-0000-0000-000000000003>")
    assert(a.getString(2) == "http://example.org/a" && a.getBoolean(7))
    val b = byId("<urn:uuid:00000000-0000-0000-0000-000000000004>")
    assert(b.getBoolean(7), "multibyte body must validate by OCTET length")
    assert(b.getString(6).contains("中文"))
    // false split: the evil record's first fragment is short of its
    // declared Content-Length; the injected tail fragment has no
    // parseable headers — BOTH are flagged, neither is silently ok
    val evil = byId("<urn:uuid:00000000-0000-0000-0000-000000000005>")
    assert(!evil.getBoolean(7))
    val tail = rows.filter(_.isNullAt(1))
    assert(tail.length == 1 && !tail.head.getBoolean(7))
  }

  test("responses → htmlText: the three-stage crawl chain end to end") {
    val out = Warc.responses(spark, path)
      .select(col("target_uri"), TextAnalysis.htmlText(col("body")).as("text"))
      .orderBy("target_uri").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // the length-invalid evil response is excluded by contract
    assert(out.toSeq == Seq(
      ("http://example.org/a", "A alpha & beta"),
      ("http://example.org/b", "Ünïcode — 中文 páge b")))
  }

  test("recordsLossless: the pathological boundary-embedding record parses WHOLE") {
    val rows = Warc.recordsLossless(spark, path).collect()
    // the text-split path yields 6 rows (evil split into 2 fragments,
    // both length_ok=false); the Content-Length walk yields exactly the
    // 5 real records, every one length-valid — including evil
    assert(rows.length == 5)
    assert(rows.forall(_.getBoolean(7)), rows.mkString("\n"))
    val evil = rows.find(r =>
      r.getString(1) == "<urn:uuid:00000000-0000-0000-0000-000000000005>").get
    assert(evil.getString(6).contains("\r\n\r\nWARC/1.0\r\n"),
      "evil payload must come back intact, boundary bytes and all")
    // text-path schema + the appended decode_lossy flag (round-15:
    // length_ok here is RAW octets, so non-UTF-8 pages pass and the
    // flag carries the decode story separately)
    assert(Warc.recordsLossless(spark, path).drop("decode_lossy").schema
      == Warc.records(spark, path).schema)
  }

  test("recordsLossless: forced multi-split read recovers every record exactly once") {
    val crlf = "\r\n"
    def rec(i: Int): String = {
      // every 5th payload embeds the inter-record byte sequence — the
      // split-resync scan must step over it, not duplicate or drop
      val body =
        if (i % 5 == 0) s"evil $i pre$crlf${crlf}WARC/1.0${crlf}WARC-Type: fake$crlf$i post"
        else s"plain payload $i " + ("x" * (i % 97))
      val b = body.getBytes("UTF-8")
      Seq("WARC/1.0",
        "WARC-Type: response",
        s"WARC-Record-ID: <urn:uuid:rec-$i>",
        s"WARC-Target-URI: http://example.org/$i",
        s"Content-Length: ${b.length}").mkString(crlf) +
        crlf + crlf + body + crlf + crlf
    }
    val n = 300
    val tmp = java.nio.file.Files.createTempDirectory("warc_splits")
      .resolve("big.warc")
    java.nio.file.Files.write(tmp,
      (0 until n).map(rec).mkString.getBytes("UTF-8"))

    val df = Warc.recordsLossless(spark, tmp.toString, maxSplitBytes = Some(4096L))
    assert(df.rdd.getNumPartitions > 4,
      s"expected >4 input splits, got ${df.rdd.getNumPartitions}")
    val rows = df.collect()
    assert(rows.length == n, s"expected $n records, got ${rows.length}")
    assert(rows.forall(_.getBoolean(7)), "every record must length-validate")
    val ids = rows.map(_.getString(1)).sorted.toSeq
    assert(ids == (0 until n).map(i => s"<urn:uuid:rec-$i>").sorted,
      "exactly-once per record id across splits")
    // payload spot-integrity: the boundary-embedding ones came back whole
    rows.filter(_.getString(1) == "<urn:uuid:rec-25>").foreach { r =>
      assert(r.getString(6) ==
        s"evil 25 pre$crlf${crlf}WARC/1.0${crlf}WARC-Type: fake${crlf}25 post")
    }
    // and the whole read equals the single-split read row-for-row
    val one = Warc.recordsLossless(spark, tmp.toString).collect()
      .map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet == one)
  }

  test("recordsLossless: split-resync fuzz — random payloads with planted magics, three split sizes, sets identical") {
    // the resync scan at a split boundary must reject payload bytes
    // that LOOK like a record start (magic + junk that never yields a
    // Content-Length header block) and land on the next real record —
    // ground truth is the single-split read; seeded, so reproducible
    val rnd = new java.util.Random(1234)
    val crlf = "\r\n"
    def rec(i: Int): Array[Byte] = {
      val body = new java.io.ByteArrayOutputStream()
      val n = rnd.nextInt(300)
      val junk = new Array[Byte](n); rnd.nextBytes(junk)
      body.write(junk)
      if (i % 3 == 0) // planted magic mid-payload, then more junk
        body.write(s"${crlf}${crlf}WARC/1.0${crlf}garbage no headers".getBytes("UTF-8"))
      if (i % 7 == 0) // CRLFCRLF inside the payload (parser splits on FIRST)
        body.write(s"$crlf$crlf more".getBytes("UTF-8"))
      val b = body.toByteArray
      val hdr = Seq("WARC/1.0", "WARC-Type: resource",
        s"WARC-Record-ID: <urn:uuid:fz-$i>",
        s"Content-Length: ${b.length}").mkString(crlf) + crlf + crlf
      hdr.getBytes("UTF-8") ++ b ++ (crlf + crlf).getBytes("UTF-8")
    }
    val n = 120
    val out = new java.io.ByteArrayOutputStream()
    (0 until n).foreach(i => out.write(rec(i)))
    val tmp = java.nio.file.Files.createTempDirectory("warc_fuzz")
      .resolve("fuzz.warc")
    java.nio.file.Files.write(tmp, out.toByteArray)

    val truth = Warc.recordsLossless(spark, tmp.toString).collect()
      .map(_.toSeq).toSet
    assert(truth.size == n)
    for (split <- Seq(512L, 2048L, 7777L)) {
      val got = Warc.recordsLossless(spark, tmp.toString,
        maxSplitBytes = Some(split)).collect().map(_.toSeq).toSet
      assert(got == truth, s"split=$split: ${got.size} vs ${truth.size}")
    }
  }

  test("recordsLossless: overlong hostile region after resync — planted magic + 64 KiB CRLF-free run, splits resync past it") {
    // ADVICE r14: readLine() conflated a >64 KiB CRLF-free line with
    // EOF, so a split-start resync landing in a hostile payload
    // (WARC/1. followed by a long CRLF-free run) silently dropped the
    // REST OF THE SPLIT. Now the reader resyncs past the region.
    val crlf = "\r\n"
    def rec(i: Int): Array[Byte] = {
      val body =
        if (i % 4 == 1)
          // the hostile shape: an embedded magic then 70 KiB with no
          // CRLF anywhere — any split resync landing before it must
          // step over and still recover every later record
          (s"pre $i ${crlf}WARC/1." + ("A" * (70 * 1024)) + s" post $i")
            .getBytes("UTF-8")
        else s"plain payload $i ".getBytes("UTF-8")
      val hdr = Seq("WARC/1.0", "WARC-Type: resource",
        s"WARC-Record-ID: <urn:uuid:ov-$i>",
        s"Content-Length: ${body.length}").mkString(crlf) + crlf + crlf
      hdr.getBytes("UTF-8") ++ body ++ (crlf + crlf).getBytes("UTF-8")
    }
    val n = 40
    val out = new java.io.ByteArrayOutputStream()
    (0 until n).foreach(i => out.write(rec(i)))
    val tmp = java.nio.file.Files.createTempDirectory("warc_overlong")
      .resolve("overlong.warc")
    java.nio.file.Files.write(tmp, out.toByteArray)

    val truth = Warc.recordsLossless(spark, tmp.toString).collect()
      .map(_.toSeq).toSet
    assert(truth.size == n)
    for (split <- Seq(4096L, 16384L, 40000L)) {
      val df = Warc.recordsLossless(spark, tmp.toString,
        maxSplitBytes = Some(split))
      val got = df.collect().map(_.toSeq).toSet
      assert(got == truth,
        s"split=$split: ${got.size} vs ${truth.size} — overlong region must resync, not abort")
    }
  }

  test("recordsLossless: gzip input auto-detected, read whole-file, identical rows") {
    val gz = java.nio.file.Files.createTempDirectory("warc_gz")
      .resolve("fixture_crawl.warc.gz")
    val in = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    out.write(in); out.close()
    val got = Warc.recordsLossless(spark, gz.toString).collect()
      .map(_.toSeq).toSet
    val plain = Warc.recordsLossless(spark, path).collect()
      .map(_.toSeq).toSet
    assert(got == plain && got.size == 5)
  }

  test("recordsLossless: per-member gzip — record-per-member file splits member-parallel, set-identical") {
    // CommonCrawl's production layout: one gzip MEMBER per record, so
    // a .warc.gz splits at member boundaries (scan 1f 8b 08, validate
    // by inflating to the WARC/1. magic)
    val crlf = "\r\n"
    def rec(i: Int): Array[Byte] = {
      val body = s"member payload $i " + ("y" * (i % 61))
      val b = body.getBytes("UTF-8")
      (Seq("WARC/1.0", "WARC-Type: resource",
        s"WARC-Record-ID: <urn:uuid:gzm-$i>",
        s"Content-Length: ${b.length}").mkString(crlf) + crlf + crlf)
        .getBytes("UTF-8") ++ b ++ (crlf + crlf).getBytes("UTF-8")
    }
    val n = 120
    val dir = java.nio.file.Files.createTempDirectory("warc_gz_members")
    val gz = dir.resolve("members.warc.gz")
    val fos = java.nio.file.Files.newOutputStream(gz)
    (0 until n).foreach { i =>
      val g = new java.util.zip.GZIPOutputStream(fos)
      g.write(rec(i)); g.finish(); g.flush() // finish, not close: fos stays open
    }
    fos.close()

    val truth = Warc.recordsLossless(spark, gz.toString).collect()
      .map(_.toSeq).toSet
    assert(truth.size == n, s"whole read: ${truth.size}")
    val df = Warc.recordsLossless(spark, gz.toString,
      maxSplitBytes = Some(1024L))
    assert(df.rdd.getNumPartitions > 2,
      s"expected >2 member-granular splits, got ${df.rdd.getNumPartitions}")
    val got = df.collect().map(_.toSeq).toSet
    assert(got == truth, s"forced splits: ${got.size} vs ${truth.size}")
  }

  test("recordsLossless: chopped-stream gzip members (not record-aligned) degrade losslessly") {
    // members cut every 997 bytes mid-record: unclaimable members flow
    // into the reader already inside them — set-identical to the
    // uncompressed read, at ANY split size, exactly once
    val plain = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val dir = java.nio.file.Files.createTempDirectory("warc_gz_chop")
    val gz = dir.resolve("chopped.warc.gz")
    val fos = java.nio.file.Files.newOutputStream(gz)
    plain.grouped(997).foreach { chunk =>
      val g = new java.util.zip.GZIPOutputStream(fos)
      g.write(chunk); g.finish(); g.flush()
    }
    fos.close()
    val truth = Warc.recordsLossless(spark, path).collect().map(_.toSeq).toSet
    for (split <- Seq(None, Some(512L))) {
      val got = Warc.recordsLossless(spark, gz.toString, maxSplitBytes = split)
        .collect().map(_.toSeq).toSet
      assert(got == truth, s"split=$split: ${got.size} vs ${truth.size}")
    }
  }

  test("recordsBinary + charset: raw bytes survive, latin-1 pages keep text on the lossless path") {
    import spark.implicits._
    val crlf = "\r\n"
    def rec(id: Int, typ: String, uri: String, ctHdr: String,
        payload: Array[Byte]): Array[Byte] =
      (Seq("WARC/1.0", s"WARC-Type: $typ",
        s"WARC-Record-ID: <urn:uuid:bin-$id>",
        s"WARC-Target-URI: $uri",
        s"Content-Length: ${payload.length}").mkString(crlf) +
        (if (ctHdr.isEmpty) "" else crlf + ctHdr) + crlf + crlf)
        .getBytes("UTF-8") ++ payload ++ (crlf + crlf).getBytes("UTF-8")

    // a REAL PNG header (16x9) — binary, full of non-UTF-8 bytes
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(16) ++ be32(9) ++
      Array[Byte](8, 6, 0, 0, 0)
    // a latin-1 HTML page: 0xE9 = 'é' in ISO-8859-1, malformed in UTF-8
    val latinBody = "<html><body>café crème</body></html>"
      .getBytes("ISO-8859-1")
    val latinHttp = ("HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html; charset=iso-8859-1" + crlf + crlf)
      .getBytes("US-ASCII") ++ latinBody
    val utfBody = "<html><body>plain utf8</body></html>".getBytes("UTF-8")
    val utfHttp = ("HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html; charset=utf-8" + crlf + crlf)
      .getBytes("US-ASCII") ++ utfBody

    val out = new java.io.ByteArrayOutputStream()
    out.write(rec(1, "resource", "media://img/1", "Content-Type: image/png", png))
    out.write(rec(2, "response", "http://x.example/latin",
      "Content-Type: application/http; msgtype=response", latinHttp))
    out.write(rec(3, "response", "http://x.example/utf8",
      "Content-Type: application/http; msgtype=response", utfHttp))
    val tmp = java.nio.file.Files.createTempDirectory("warc_bin")
      .resolve("bin.warc")
    java.nio.file.Files.write(tmp, out.toByteArray)

    // binary path: payload bytes byte-identical, length_ok raw-exact
    val bin = Warc.recordsBinary(spark, tmp.toString)
      .select("record_id", "payload", "length_ok")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(bin.values.forall(_.getBoolean(2)), "raw octet length must validate")
    assert(java.util.Arrays.equals(
      bin("<urn:uuid:bin-1>").getAs[Array[Byte]](1), png))
    assert(java.util.Arrays.equals(
      bin("<urn:uuid:bin-2>").getAs[Array[Byte]](1), latinHttp))

    // text path: the latin-1 record FAILS its octet check (U+FFFD
    // inflation) — the honest text-path contract...
    val textPath = Warc.records(spark, tmp.toString)
      .select("record_id", "length_ok").as[(String, Boolean)]
      .collect().toMap
    assert(!textPath("<urn:uuid:bin-2>"))
    // ...while the lossless path length-validates on RAW bytes and
    // flags the decode instead of dropping the page
    val lossless = Warc.recordsLossless(spark, tmp.toString)
      .select("record_id", "length_ok", "decode_lossy")
      .as[(String, Boolean, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(lossless("<urn:uuid:bin-2>") == ((true, true)))
    assert(lossless("<urn:uuid:bin-3>") == ((true, false)))
    assert(lossless("<urn:uuid:bin-1>") == ((true, true)),
      "binary payload: raw length ok, decode lossy")

    // charset-aware HTTP path: latin-1 body decodes INTACT
    val http = Warc.httpResponsesLossless(spark, tmp.toString)
      .select("target_uri", "http_status", "mime_type", "charset", "body",
        "decode_lossy")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(http.size == 2)
    val lat = http("http://x.example/latin")
    assert(lat.getInt(1) == 200 && lat.getString(2) == "text/html" &&
      lat.getString(3) == "iso-8859-1" && !lat.getBoolean(5))
    assert(lat.getString(4) == "<html><body>café crème</body></html>")
    assert(http("http://x.example/utf8").getString(4)
      == "<html><body>plain utf8</body></html>")
  }

  test("httpResponses: status / mime / charset triage columns") {
    import spark.implicits._
    val out = Warc.httpResponses(spark, path)
      .select("target_uri", "http_status", "mime_type", "charset")
      .as[(String, Option[Int], String, String)].collect()
      .sortBy(_._1).toSeq
    assert(out == Seq(
      ("http://example.org/a", Some(200), "text/html", "utf-8"),
      ("http://example.org/b", Some(200), "text/html", "utf-8")))
    // the evil record is length-invalid on the text path — excluded;
    // on the LOSSLESS path it parses whole, so the same triage over a
    // lossless-read frame keeps it and reads its text/plain type.
    // (httpResponses composes over `records`; this pins the column
    // derivation itself against the lossless rows too)
    val lossless = Warc.recordsLossless(spark, path)
      .where(col("warc_type") === "response")
    val head = regexp_extract(col("payload"), "(?s)\\A(.*?)\\r\\n\\r\\n", 1)
    val types = lossless.select(lower(regexp_extract(head,
        "(?mi)^Content-Type:\\s*([^\\r\\n;]*)", 1)).as("t"))
      .as[String].collect().sorted.toSeq
    assert(types == Seq("text/html", "text/html", "text/plain"))
  }

  test("crawlDedup: WARC responses → canonical-URL keep-best, longest text wins") {
    import spark.implicits._
    // plant a duplicate spelling of /a (case + default port + tracker)
    // carrying a SHORTER body, and a NULL-body duplicate: the original
    // must win on byte length — in particular the NULL-text row must
    // LOSE (a 0 - Long.MinValue coalesce wrap once made it win the
    // struct-min and keep NULL text; pinned here so it can't return)
    val dup = Seq(
      ("<urn:uuid:dup-1>", "HTTP://EXAMPLE.ORG:80/a?utm_source=feed",
        "<html><body>short</body></html>"),
      ("<urn:uuid:dup-0>", "http://example.org/a#frag", null))
      .toDF("record_id", "target_uri", "body")
    val out = graft.ops.UrlOps.crawlDedup(
        Warc.responses(spark, path)
          .select("record_id", "target_uri", "body")
          .unionByName(dup))
      .orderBy("canonical_url")
      .as[(String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      ("http://example.org/a",
        "<urn:uuid:00000000-0000-0000-0000-000000000003>",
        "A alpha & beta", 3L),
      ("http://example.org/b",
        "<urn:uuid:00000000-0000-0000-0000-000000000004>",
        "Ünïcode — 中文 páge b", 1L)))
  }
}
