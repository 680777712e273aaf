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

  test("robots_match: RFC 9309 * and $ semantics, hand-pinned table") {
    import graft.functions.RobotsMatchExpression.matchesBytes
    def m(path: String, pattern: String): Boolean =
      matchesBytes(path.getBytes("UTF-8"), pattern.getBytes("UTF-8"))
    // plain prefix (no specials) — unchanged semantics
    assert(m("/priv/x", "/priv") && !m("/pub/x", "/priv"))
    assert(m("/priv", "/priv") && !m("/pri", "/priv"))
    // '*' spans any octets, including none
    assert(m("/page7.php", "/*.php"))
    assert(m("/a/b/c.php?x", "/*.php")) // prefix: match may end mid-path
    assert(m("/x.php", "/*.php") && m("/.php", "/*.php"))
    assert(!m("/x.phx", "/*.php"))
    // trailing '$' anchors at the end
    assert(m("/page7.php", "/*.php$"))
    assert(!m("/page7.phpx", "/*.php$"))
    assert(!m("/page7.php/more", "/*.php$"))
    // longest-match carve-out shape: both patterns match the file path
    assert(m("/files/f1.php", "/files/*.php$") && m("/files/f1.php", "/*.php$"))
    // multiple stars with backtracking-ish structure (leftmost-greedy)
    assert(m("/aXbYc", "/a*b*c"))
    assert(m("/abbc", "/a*b*c") && !m("/ac", "/a*b*c"))
    // star at the end; star absorbing to an anchored end
    assert(m("/tmp123/x", "/tmp*") && m("/tmp", "/tmp*"))
    assert(m("/tmp123", "/tmp*$") && m("/tmp", "/tmp*$"))
    // '$' alone and '/$' (root-only rule)
    assert(m("/", "/$") && !m("/a", "/$"))
    // interior '$' is literal
    assert(m("/a$b/c", "/a$b") && !m("/ab", "/a$b"))
    // multibyte path octets never half-match
    assert(m("/páge", "/p*e") && !m("/páge", "/pa*"))
    // empty pattern = empty prefix: matches anything
    assert(m("/whatever", ""))
  }

  test("robots wildcards end-to-end: extension block, longer allow carve-out, anchor miss") {
    import spark.implicits._
    val body = Seq("User-agent: *", "Disallow: /*.php$",
      "Allow: /files/*.php$", "Disallow: /tmp*").mkString("\n")
    val robots = Seq(("w.example", body)).toDF("host", "body")
    val urls = Seq(
      (1L, "http://w.example/page1.php"),     // /*.php$ blocks
      (2L, "http://w.example/page2.phpx"),    // anchor miss -> allowed
      (3L, "http://w.example/files/f3.php"),  // longer allow rescues
      (4L, "http://w.example/tmp4/x"),        // /tmp* blocks
      (5L, "http://w.example/ok/5"))          // nothing matches
      .toDF("id", "url")
    val out = UrlOps.robotsAllowed(urls, UrlOps.robotsRules(robots), "graftbot")
      .orderBy("id").select("id", "allowed")
      .as[(Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, false), (2L, true), (3L, true), (4L, false),
      (5L, true)))
  }

  test("robots specificity is OCTET length: multibyte pattern ties an equal-octet ASCII pattern") {
    import spark.implicits._
    // "/p/é" = 4 chars / 5 octets; "/p/*z" = 5 chars / 5 octets.
    // "/p/éz" matches both. RFC 9309 most-specific-match counts
    // OCTETS: a 5-5 tie, so allow wins the tie-break → allowed.
    // Character-length specificity (the pre-round-15 bug) scored the
    // multibyte allow 4 < 5 and let the disallow win.
    val body = Seq("User-agent: *", "Allow: /p/é",
      "Disallow: /p/*z").mkString("\n")
    val robots = Seq(("m.example", body)).toDF("host", "body")
    val urls = Seq((1L, "http://m.example/p/éz")).toDF("id", "url")
    val out = UrlOps.robotsAllowed(urls, UrlOps.robotsRules(robots),
        "graftbot")
      .select("id", "allowed").as[(Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, true)),
      "octet-length specificity must tie 5=5 and let allow win")
    // and the explicit smallDim hint changes nothing but the probe
    val hinted = UrlOps.robotsAllowed(urls, UrlOps.robotsRules(robots),
        "graftbot", smallDim = Some(UrlOps.hostDimIsSmall(robots)))
      .select("id", "allowed").as[(Long, Boolean)].collect().toSeq
    assert(hinted == out)
  }

  test("sitemapUrls: urlset + index blocks, entity unescape, absent tags NULL") {
    import spark.implicits._
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc> http://e.com/a?x=1&amp;y=2 </loc>
        |    <lastmod>2024-03-01</lastmod><priority>0.8</priority></url>
        |  <url><loc>http://e.com/b</loc><changefreq>daily</changefreq></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex><sitemap><loc>http://e.com/sm1.xml</loc>
        |<lastmod>2024-04-01</lastmod></sitemap></sitemapindex>""".stripMargin
    val out = UrlOps.sitemapUrls(
        Seq((1L, urlset), (2L, index)).toDF("id", "body"))
      .orderBy("id", "loc")
      .as[(Long, String, Option[String], Option[String], Option[Long], Boolean)]
      .collect().toSeq
    assert(out == Seq(
      (1L, "http://e.com/a?x=1&y=2", Some("2024-03-01"), None, Some(800000L), false),
      (1L, "http://e.com/b", None, Some("daily"), None, false),
      (2L, "http://e.com/sm1.xml", Some("2024-04-01"), None, None, true)))
  }

  test("robotsSitemaps: Sitemap directives extracted outside group logic") {
    import spark.implicits._
    val body = Seq("User-agent: *", "Disallow: /x",
      "Sitemap: http://e.com/sitemap.xml", "# note",
      "sitemap:   http://e.com/sm2.xml  ").mkString("\n")
    val out = UrlOps.robotsSitemaps(Seq(("e.com", body)).toDF("host", "body"))
      .as[(String, String)].collect().toSet
    assert(out == Set(("e.com", "http://e.com/sitemap.xml"),
      ("e.com", "http://e.com/sm2.xml")))
  }

  test("robotsCrawlDelay + politenessSchedule: group selection, fractional seconds, default") {
    import spark.implicits._
    val robots = Seq(
      ("a.example", "User-agent: graftbot\nCrawl-delay: 2\n\nUser-agent: *\nCrawl-delay: 9"),
      ("b.example", "User-agent: *\nCrawl-delay: 0.5"),
      ("c.example", "User-agent: *\nDisallow: /x")) // no delay record
      .toDF("host", "body")
    val delays = UrlOps.robotsCrawlDelay(robots)
    assert(delays.as[(String, String, Long)].collect().toSet == Set(
      ("a.example", "graftbot", 2000L), ("a.example", "*", 9000L),
      ("b.example", "*", 500L)))
    val urls = Seq(
      (10L, "http://a.example/1"), (11L, "http://a.example/2"),
      (12L, "http://a.example/3"),
      (20L, "http://b.example/1"), (21L, "http://b.example/2"),
      (30L, "http://c.example/1"), (31L, "http://c.example/2"))
      .toDF("doc_id", "url")
    val out = UrlOps.politenessSchedule(urls, delays, "GraftBot")
      .select("doc_id", "fetch_seq", "fetch_offset_ms")
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (10L, 0, 0L), (11L, 1, 2000L), (12L, 2, 4000L), // exact beats *
      (20L, 0, 0L), (21L, 1, 500L),                   // fractional * delay
      (30L, 0, 0L), (31L, 1, 1000L)))                 // default fallback
  }

  test("urlPatternStats: digit/hex folds, exact ppm shares, trap flag") {
    val s = spark
    import s.implicits._
    val urls = (Seq.tabulate(8)(i => s"http://h.example/item/$i") ++
      Seq("http://h.example/s/deadbeefcafe42",
        "http://h.example/about",
        "http://q.example/x/1",
        // an 8+-digit NUMERIC id is {n}, not a hex fold (the fold
        // requires a letter — the x20 replica-id lesson)
        "http://n.example/item/10000123"))
      .toDF("url")
    val got = graft.ops.UrlOps.urlPatternStats(urls,
        trapSharePpm = 500000L, trapMinUrls = 5L)
      .orderBy("host", "pattern")
      .select("host", "pattern", "n_urls", "host_total", "share_ppm", "trap")
      .as[(String, String, Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      ("h.example", "/about", 1L, 10L, 100000L, 0),
      ("h.example", "/item/{n}", 8L, 10L, 800000L, 1),
      ("h.example", "/s/{h}", 1L, 10L, 100000L, 0),
      ("n.example", "/item/{n}", 1L, 1L, 1000000L, 0),
      ("q.example", "/x/{n}", 1L, 1L, 1000000L, 0))) // share 100% but < 5 urls
  }

  test("urlPatternStats: uppercase/mixed-case hex session ids fold to {h}") {
    val s = spark
    import s.implicits._
    // 6 distinct UPPERCASE session ids on one host — case must not
    // defeat the fold, or each id stays its own pattern and the trap
    // share never crosses the threshold
    val urls = (Seq.tabulate(6)(i => f"http://t.example/S/DEADBEEF${i}%08d") ++
      Seq("http://t.example/about",
        "http://t.example/s/aBcDeF0012345"))
      .toDF("url")
    val got = graft.ops.UrlOps.urlPatternStats(urls,
        trapSharePpm = 500000L, trapMinUrls = 5L)
      .orderBy("host", "pattern")
      .select("pattern", "n_urls", "trap")
      .as[(String, Long, Int)].collect().toSeq
    assert(got == Seq(
      ("/S/{h}", 6L, 1),
      ("/about", 1L, 0),
      ("/s/{h}", 1L, 0)))
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
