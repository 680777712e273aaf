package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlNormalizeExpression.normalize
import graft.ops.UrlOps

class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("urlNormalize: each RFC 3986 rule hand-pinned") {
    // scheme + host lowercase, default port strip
    assert(normalize("HTTP://EXample.COM:80/a") == "http://example.com/a")
    assert(normalize("HTTPS://X.org:443/") == "https://x.org/")
    // non-default and empty ports
    assert(normalize("http://x.org:8080/a") == "http://x.org:8080/a")
    assert(normalize("http://x.org:/a") == "http://x.org/a")
    assert(normalize("https://x.org:80/a") == "https://x.org:80/a") // 80 not default for https
    // empty path -> "/"
    assert(normalize("http://x.org") == "http://x.org/")
    // unreserved escapes decode; reserved escapes uppercase
    assert(normalize("http://x.org/p%61th%2fq") == "http://x.org/path%2Fq")
    // invalid escape passes through untouched
    assert(normalize("http://x.org/a%zz") == "http://x.org/a%zz")
    // dot segments (RFC 3986 5.2.4)
    assert(normalize("http://x.org/a/./b/../c") == "http://x.org/a/c")
    assert(normalize("http://x.org/a/..") == "http://x.org/")
    assert(normalize("http://x.org/../a") == "http://x.org/a")
    assert(normalize("http://x.org/a/.") == "http://x.org/a/")
    // tracker strip + byte-wise query sort + fragment drop
    assert(normalize("http://x.org/p?utm_source=s&b=2&a=1#frag") ==
      "http://x.org/p?a=1&b=2")
    assert(normalize("http://x.org/p?gclid=9") == "http://x.org/p")
    assert(normalize("http://x.org/p?fbclid=1&_ga=2&q=k") == "http://x.org/p?q=k")
    // userinfo kept; IPv6 literal host with port
    assert(normalize("http://U:p@X.org/a") == "http://U:p@x.org/a")
    assert(normalize("http://[2001:DB8::1]:80/a") == "http://[2001:db8::1]/a")
    assert(normalize("http://[2001:DB8::1]:8080/a") == "http://[2001:db8::1]:8080/a")
    // non-URL passthrough; NULL
    assert(normalize("not a url 7") == "not a url 7")
    assert(normalize("ht tp://x/y") == "ht tp://x/y")
    assert(normalize(null) == null)
  }

  test("urlNormalize: idempotent over the fixture space") {
    val messy = Seq(
      "HTTP://EXample.COM:80/a/5?utm_source=x&b=5&a=1#frag",
      "https://Site9.ORG:443/p%61th/19",
      "http://h.net/x/./y/../z44",
      "https://a.b.c/3?gclid=1&fbclid=9&q=t3",
      "http://e.com/a%2fb/10",
      "not a url 11")
    messy.foreach { u =>
      val once = normalize(u)
      assert(normalize(once) == once, s"not idempotent for $u")
    }
  }

  test("urlNormalize as a column: codegen path agrees with the static fn") {
    import spark.implicits._
    val urls = Seq("HTTP://EXample.COM:80/a?utm_source=1&z=2&a=3#f",
      "https://B.io/%61/./x/..", "junk")
    val out = urls.toDF("url")
      .select(UrlOps.urlNormalize(col("url")).as("c"))
      .as[String].collect().toSeq
    assert(out == urls.map(normalize))
  }

  test("urlDedup: keep-best by quality, smallest-id ties; per-canonical counts") {
    import spark.implicits._
    val df = Seq(
      // three spellings of the same canonical, quality 5/9/9
      (1L, "https://DUP.example:443/g/0?utm_campaign=x", 5L),
      (2L, "https://dup.EXAMPLE/g/0#top", 9L),
      (3L, "https://dup.example/g/0", 9L),
      // a singleton
      (4L, "https://solo.example/x", 7L))
      .toDF("id", "url", "q")
    val out = UrlOps.urlDedup(df, "url", "id", "q")
      .orderBy("canonical_url")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("https://dup.example/g/0", "dup.example", 3L, 2L), // q ties 9/9 -> min id
      ("https://solo.example/x", "solo.example", 1L, 4L)))
  }

  test("robots: group parsing, exact-group exclusivity, * fallback, longest-match allow wins") {
    import spark.implicits._
    val bodyA = Seq(
      "# crawl policy", "User-agent: *", "Disallow: /priv", "",
      "user-Agent: GraftBot", "Disallow: /bot", "Allow: /bot/ok",
      "Disallow:").mkString("\n")
    val bodyB = Seq(
      "User-agent: *", "Disallow: /priv", "Allow: /priv/open").mkString("\n")
    val bodyC = Seq( // stacked agents share one group
      "User-agent: graftbot", "User-agent: otherbot",
      "Disallow: /x").mkString("\n")
    val robots = Seq(("a.example", bodyA), ("b.example", bodyB),
      ("c.example", bodyC)).toDF("host", "body")
    val rules = UrlOps.robotsRules(robots)
    val got = rules.as[(String, String, String, String)].collect().toSet
    assert(got == Set(
      ("a.example", "*", "disallow", "/priv"),
      ("a.example", "graftbot", "disallow", "/bot"),
      ("a.example", "graftbot", "allow", "/bot/ok"),
      ("b.example", "*", "disallow", "/priv"),
      ("b.example", "*", "allow", "/priv/open"),
      ("c.example", "graftbot", "disallow", "/x"),
      ("c.example", "otherbot", "disallow", "/x")))
    val urls = Seq(
      (1L, "http://a.example/priv/x"),      // exact group governs: * rules ignored
      (2L, "http://a.example/bot/x"),       // disallowed by the exact group
      (3L, "http://a.example/bot/ok/x"),    // allow wins on longest match
      (4L, "http://b.example/priv/x"),      // no exact group -> * fallback
      (5L, "http://b.example/priv/open/x"), // allow wins on longest match
      (6L, "http://c.example/x/y"),         // stacked-agent group applies
      (7L, "http://d.example/anything"))    // no robots -> allowed
      .toDF("id", "url")
    val out = UrlOps.robotsAllowed(urls, rules, "GraftBot")
      .orderBy("id").select("id", "allowed")
      .as[(Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, true), (2L, false), (3L, true), (4L, false),
      (5L, true), (6L, false), (7L, true)))
  }

  test("domainStats: duplicate fraction in ppm per host") {
    import spark.implicits._
    val df = Seq(
      "http://A.net/p/1", "http://a.NET/p/1", "http://a.net/p/2", // 3 pages, 2 urls
      "http://b.net/q")                                           // 1 page, 1 url
      .toDF("url")
    val out = UrlOps.domainStats(df, "url").orderBy("host")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a.net", 3L, 2L, 333333L), ("b.net", 1L, 1L, 0L)))
  }
}
