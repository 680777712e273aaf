package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LinkOps

class LinkOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val page =
    """<html><head><base href="/root/"><title>t</title></head><body>
      |<a href="rel.html">r</a>
      |<A HREF='/abs/page'>a</A>
      |<a class="c" href=bare1>b</a>
      |<a href="?q=2">q</a>
      |<a href="https://ext.example/e?utm_source=x&amp;id=7">e</a>
      |<a href="javascript:void(0)">j</a>
      |<a href="#frag">f</a>
      |<a href="mailto:x@y.z">m</a>
      |<a href="//proto.example/pp">p</a>
      |</body></html>""".stripMargin

  test("extractLinks: quote styles, base tag, entity decode, drops") {
    val pages = Seq((1L, "http://w.example/d/index.html", page))
      .toDF("doc_id", "url", "html")
    val got = LinkOps.extractLinks(pages)
      .orderBy("link_pos")
      .select("link_pos", "dst_url")
      .as[(Int, String)].collect().toSeq
    assert(got == Seq(
      0 -> "http://w.example/root/rel.html",
      1 -> "http://w.example/abs/page",
      2 -> "http://w.example/root/bare1",
      3 -> "http://w.example/root/?q=2",
      4 -> "https://ext.example/e?id=7",
      8 -> "http://proto.example/pp"))
  }

  test("extractLinks: no base tag resolves against the page URL; no anchors -> no rows") {
    val pages = Seq(
      (1L, "http://h.example/a/b.html", """<p><a href="x.html">x</a></p>"""),
      (2L, "http://h.example/plain", "<p>no links at all</p>"))
      .toDF("doc_id", "url", "html")
    val got = LinkOps.extractLinks(pages)
      .select("doc_id", "dst_url").as[(Long, String)].collect().toSeq
    assert(got == Seq(1L -> "http://h.example/a/x.html"))
  }

  test("extractLinks/extractAnchors/pageMeta ignore comments and script/style blocks") {
    val html =
      """<html><head>
        |<!-- <base href="/wrong/"> <a href="/commented">c</a> -->
        |<script>document.write('<a href="/phantom1">p</a>');
        |var s = "<a href=/phantom2>q</a>";</script>
        |<style>a[href="/styled"] { color: red }</style>
        |<!-- <link rel="canonical" href="/fake-canon"> -->
        |<!-- <meta name="robots" content="noindex"> -->
        |</head><body>
        |<a href="/real1">one</a>
        |<!-- split <a href="/phantom3">x</a> comment -->
        |<a href="/real2">two</a>
        |</body></html>""".stripMargin
    val pages = Seq((1L, "http://h.example/p", html)).toDF("doc_id", "url", "html")
    // phantom anchors contribute neither rows NOR link positions
    val links = LinkOps.extractLinks(pages)
      .select("link_pos", "dst_url").as[(Int, String)].collect().toSeq.sorted
    assert(links == Seq(
      0 -> "http://h.example/real1",
      1 -> "http://h.example/real2"))
    val anchors = LinkOps.extractAnchors(pages)
      .select("anchor_pos", "dst_url", "anchor_text")
      .as[(Int, String, String)].collect().toSeq.sorted
    assert(anchors == Seq(
      (0, "http://h.example/real1", "one"),
      (1, "http://h.example/real2", "two")))
    // commented-out canonical/robots tags are inert
    val meta = LinkOps.pageMeta(pages)
      .select("canonical_url", "meta_noindex", "meta_nofollow")
      .as[(Option[String], Int, Int)].collect().head
    assert(meta == ((None, 0, 0)))
  }

  test("extractLinks: map-only plan, no shuffle") {
    val pages = Seq((1L, "http://h.example/", page)).toDF("doc_id", "url", "html")
    val plan = LinkOps.extractLinks(pages).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"link extraction must not shuffle:\n$plan")
  }

  test("frontierDiscover: inlink ranking, host cap, anti join vs crawled") {
    val links = Seq(
      ("http://s.example/1", "http://t.example/a"),
      ("http://s.example/2", "http://t.example/a"),
      ("http://s.example/3", "http://t.example/b"),
      ("http://s.example/1", "http://t.example/c"),
      ("http://s.example/1", "http://u.example/z"),
      ("http://s.example/2", "http://t.example/seen"))
      .toDF("url", "dst_url")
    val crawled = Seq("http://t.example/seen").toDF("url")
    def run(small: Option[Boolean]) = LinkOps
      .frontierDiscover(links, crawled, maxPerHost = 2, smallCrawled = small)
      .orderBy("host", "host_rank")
      .select("dst_url", "host", "n_inlinks", "host_rank")
      .as[(String, String, Long, Int)].collect().toSeq
    val want = Seq(
      ("http://t.example/a", "t.example", 2L, 1),
      ("http://t.example/b", "t.example", 1L, 2), // /c tied, /b wins on URL
      ("http://u.example/z", "u.example", 1L, 1))
    assert(run(Some(true)) == want)
    // forced large-crawled mode: identical rows through SHUFFLE_HASH
    assert(run(Some(false)) == want)
  }

  test("frontierDiscover: size-adaptive join modes are plan-pinned") {
    val links = Seq(("http://s.example/1", "http://t.example/a")).toDF("url", "dst_url")
    val crawled = Seq("http://x.example/c").toDF("url")
    val small = LinkOps.frontierDiscover(links, crawled, smallCrawled = Some(true))
      .queryExecution.executedPlan.toString
    val large = LinkOps.frontierDiscover(links, crawled, smallCrawled = Some(false))
      .queryExecution.executedPlan.toString
    assert(small.contains("BroadcastHashJoin") && small.contains("LeftAnti"),
      s"small mode must broadcast the fetched set:\n$small")
    assert(large.contains("ShuffledHashJoin") && large.contains("LeftAnti") &&
      !large.contains("SortMergeJoin"),
      s"large mode must shuffle-hash, never sort-merge:\n$large")
  }

  test("extractLinks is batch-agnostic: identical rows under a streaming source") {
    // stateless map+generate => runs unchanged in append mode
    val stage = java.nio.file.Files.createTempDirectory("links_stream")
    val pages = Seq(
      (1L, "http://h.example/a/b.html",
        """<a href="x.html">x</a><a href='/y'>y</a><a href="#s">s</a>"""))
      .toDF("doc_id", "url", "html")
    pages.write.mode("overwrite").parquet(stage.toString)
    val stream = spark.readStream.schema(pages.schema).parquet(stage.toString)
    val q = graft.ops.LinkOps.extractLinks(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("links_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("links_out").orderBy("link_pos")
      .select("link_pos", "dst_url").as[(Int, String)].collect().toSeq
    assert(got == Seq(
      0 -> "http://h.example/a/x.html",
      1 -> "http://h.example/y"))
    spark.sql("DROP TABLE IF EXISTS links_out")
  }

  test("extractAnchors: anchor text, nofollow forms, nested tags, entities") {
    val html =
      """<html><body>
        |<a href="/a" rel="nofollow">skip me</a>
        |<a href='/b' rel='external nofollow'>also skip</a>
        |<a rel=nofollow href="/c">unquoted rel</a>
        |<a href="/d"><b>Bold</b> &amp; nested</a>
        |<a href="/e"><img src="i.png"></a>
        |<a href="#top">frag</a>
        |</body></html>""".stripMargin
    val pages = Seq((1L, "http://h.example/p", html)).toDF("doc_id", "url", "html")
    val got = graft.ops.LinkOps.extractAnchors(pages)
      .orderBy("anchor_pos")
      .select("anchor_pos", "dst_url", "anchor_text", "nofollow")
      .as[(Int, String, String, Int)].collect().toSeq
    assert(got == Seq(
      (0, "http://h.example/a", "skip me", 1),
      (1, "http://h.example/b", "also skip", 1),
      (2, "http://h.example/c", "unquoted rel", 1),
      (3, "http://h.example/d", "Bold & nested", 0),
      (4, "http://h.example/e", "", 0)))
  }

  test("anchorTextAgg: follow-only counts, most-common text, documented tie-break") {
    val anchors = Seq(
      ("http://t/x", "alpha", 0),
      ("http://t/x", "alpha", 0),
      ("http://t/x", "beta", 0),
      ("http://t/x", "gamma", 1), // nofollow: excluded
      ("http://t/x", "", 0),      // empty: excluded
      ("http://t/y", "a", 0),
      ("http://t/y", "b", 0))     // 1-1 tie -> lexicographically larger wins
      .toDF("dst_url", "anchor_text", "nofollow")
    val got = graft.ops.LinkOps.anchorTextAgg(anchors)
      .orderBy("dst_url")
      .select("dst_url", "n_anchors", "n_texts", "top_text", "top_text_n")
      .as[(String, Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      ("http://t/x", 3L, 2L, "alpha", 2L),
      ("http://t/y", 2L, 2L, "b", 1L)))
  }

  test("redirectChains: terminal chains, exact-cap, over-cap, loops, dup sources") {
    def u(i: Int) = s"http://r/$i"
    val edges = Seq(
      // chain 0->1->2->3 (3 hops, terminal)
      u(0) -> u(1), u(1) -> u(2), u(2) -> u(3),
      // chain of exactly 5 hops: 10->11->12->13->14->15
      u(10) -> u(11), u(11) -> u(12), u(12) -> u(13), u(13) -> u(14),
      u(14) -> u(15),
      // chain of 6 hops (over the cap): 20..26
      u(20) -> u(21), u(21) -> u(22), u(22) -> u(23), u(23) -> u(24),
      u(24) -> u(25), u(25) -> u(26),
      // 2-cycle and self-loop
      u(30) -> u(31), u(31) -> u(30),
      u(40) -> u(40),
      // duplicate source: smallest target wins
      u(50) -> u(52), u(50) -> u(51))
      .toDF("url", "location")
    val got = graft.ops.LinkOps.redirectChains(edges, maxHops = 5)
      .orderBy("url")
      .select("url", "final_url", "hops", "resolved")
      .as[(String, String, Int, Boolean)].collect().toSeq
    assert(got.filter(_._1 == u(0)) == Seq((u(0), u(3), 3, true)))
    assert(got.filter(_._1 == u(1)) == Seq((u(1), u(3), 2, true)))
    assert(got.filter(_._1 == u(10)) == Seq((u(10), u(15), 5, true)))
    // 6 hops from u(20): deeper than the cap -> unresolved at the cap
    val g20 = got.filter(_._1 == u(20)).head
    assert(!g20._4 && g20._3 == 5)
    // loops never resolve, never hang
    assert(got.filter(_._1 == u(30)).head._4 == false)
    assert(got.filter(_._1 == u(40)).head._4 == false)
    // dup source collapsed to min target; u(51) is terminal
    assert(got.filter(_._1 == u(50)) == Seq((u(50), u(51), 1, true)))
  }

  test("pageMeta: canonical link (both attr orders), robots meta, none implies both") {
    val pages = Seq(
      (1L, "http://h.example/a/p1",
        """<head><link rel="canonical" href="/canon/1">
          |<meta name="robots" content="noindex, follow"></head>""".stripMargin),
      (2L, "http://h.example/a/p2",
        """<head><link href='canon2.html' rel='canonical'>
          |<meta content='NOFOLLOW' name='robots'></head>""".stripMargin),
      (3L, "http://h.example/a/p3",
        """<head><meta name="robots" content="none"></head>"""),
      (4L, "http://h.example/a/p4", "<head><title>nothing</title></head>"))
      .toDF("doc_id", "url", "html")
    val got = graft.ops.LinkOps.pageMeta(pages)
      .orderBy("doc_id")
      .select("doc_id", "canonical_url", "meta_noindex", "meta_nofollow")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getInt(2), r.getInt(3)))
      .toSeq
    assert(got == Seq(
      (1L, "http://h.example/canon/1", 1, 0),
      (2L, "http://h.example/a/canon2.html", 0, 1),
      (3L, null, 1, 1),
      (4L, null, 0, 0)))
    val plan = graft.ops.LinkOps.pageMeta(pages)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pageMeta must not shuffle:\n$plan")
  }

  test("crawlBudget: proportional floor-division split never exceeds the total") {
    val auth = Seq(("a", 600000L), ("b", 300000L), ("c", 100000L))
      .toDF("host", "score_micro")
    val got = graft.ops.LinkOps.crawlBudget(auth, totalBudget = 1000L,
        minPerHost = 10L)
      .orderBy("host").select("host", "budget")
      .as[(String, Long)].collect().toSeq
    // pool = 1000 - 30 = 970: floors 582 + 291 + 97 = 970, +3x10 = 1000
    assert(got == Seq("a" -> 592L, "b" -> 301L, "c" -> 107L))
    assert(got.map(_._2).sum <= 1000L)
    // infeasible floor (total < minPerHost * H) -> NULL budgets, no throw
    val bad = graft.ops.LinkOps.crawlBudget(auth, totalBudget = 20L,
        minPerHost = 10L)
      .select("budget").collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("hostLinkGraph: edge counts, distinct pages, intra flag") {
    val links = Seq(
      ("http://A.example/p1", "http://b.example/x"),
      ("http://a.example/p1", "http://b.example/y"),
      ("http://a.example/p2", "http://b.example/x"),
      ("http://a.example/p1", "http://a.example/p2"))
      .toDF("url", "dst_url")
    val got = LinkOps.hostLinkGraph(links)
      .orderBy("src_host", "dst_host")
      .select("src_host", "dst_host", "n_links", "n_src_pages", "intra")
      .as[(String, String, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      ("a.example", "a.example", 1L, 1L, 1),
      ("a.example", "b.example", 3L, 3L, 0)))
  }
}
