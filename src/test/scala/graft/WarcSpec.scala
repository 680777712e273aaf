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
