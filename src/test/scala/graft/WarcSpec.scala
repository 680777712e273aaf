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
    // same schema, drop-in: column-for-column equal to the text path
    assert(rows.head.schema == Warc.records(spark, path).schema)
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
