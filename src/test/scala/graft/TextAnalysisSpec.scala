package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** Text-analysis signals: tokens, ratios, lang-id, fingerprints. */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("htmlText: blocks, comments, tags, entity order, whitespace collapse") {
    val html =
      "<html><head><style>p{c:1}</style><script>if (1<2) document.x('&amp;');</script>" +
        "</head><body>\n<h1 class=\"t\">A &amp; B</h1>\n" +
        "<p>x &lt;y&gt;&nbsp;z &amp;lt; &#39;q&#39;</p><!-- note\nnote --></body></html>"
    val out = Seq(html).toDF("h")
      .select(TextAnalysis.htmlText($"h")).as[String].head()
    // &amp; decodes LAST: `&amp;lt;` reads as the literal text `&lt;`,
    // never double-decodes to `<`
    assert(out == "A & B x <y> z &lt; 'q'")
    val edge = Seq("no markup at all", "<p></p>", "  a  ").toDF("h")
      .select(TextAnalysis.htmlText($"h")).as[String].collect()
    assert(edge.toSeq == Seq("no markup at all", "", "a"))
  }

  test("mainContent: link-dense blocks drop, article body survives, script pre-strips") {
    val html =
      """<html><body><script>var nav = "<div>decoy</div>";</script>
        |<div><a href="/a">Navigation link alpha here</a> <a href="/b">Navigation link beta here</a></div>
        |<p>This is the real article body with plenty of prose characters.
        |<a href="/more">more</a></p>
        |<div>tiny</div>
        |<footer><a href="/about">About us page link</a> <a href="/terms">Terms of service link</a></footer>
        |</body></html>""".stripMargin
    val got = graft.ops.TextAnalysis.mainContent(
        Seq((1L, html)).toDF("doc_id", "html"))
      .select("n_kept", "main_text").as[(Long, String)].head()
    assert(got._1 == 1L)
    assert(got._2 ==
      "This is the real article body with plenty of prose characters. more")
    // the script's embedded "<div>decoy</div>" must not create blocks:
    // stripping happens BEFORE the block split
    assert(!got._2.contains("decoy"))
    // density boundary: exactly at the cap keeps, just above drops
    val boundary = Seq(
      // 23 base chars + L link chars: keep iff 100L <= 33(23+L), i.e.
      // L <= 11.3 — so 12 link chars drop...
      (2L, """<p>abcdefghijklmnopqrst u <a href="/x">linklinklink</a></p>"""),
      // ...and 11 keep
      (3L, """<p>abcdefghijklmnopqrst u <a href="/x">linklinklin</a></p>"""))
      .toDF("doc_id", "html")
    val b = graft.ops.TextAnalysis.mainContent(boundary)
      .orderBy("doc_id").select("n_kept").as[Long].collect().toSeq
    assert(b == Seq(0L, 1L))
    // map-only plan
    val plan = graft.ops.TextAnalysis.mainContent(boundary)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mainContent must not shuffle:\n$plan")
  }

  test("mainContent: link-density test survives 32-bit overflow on huge blocks") {
    // a ~22M-char pure link farm: nl * 100 overflows Int (2.2e9),
    // flipping the sign and passing the density gate before the Long
    // cast — the block must DROP (100% link density). Built inside the
    // expression (repeat), not on the driver.
    val farm = Seq((9L, 11000000)).toDF("doc_id", "n")
      .select($"doc_id", concat(
        lit("""<p><a href="/f">"""),
        expr("repeat('xy', n)"),
        lit("</a></p><p>This short real block of prose text survives fine.</p>"))
        .as("html"))
    val got = graft.ops.TextAnalysis.mainContent(farm)
      .select("n_blocks", "n_kept", "main_text").as[(Long, Long, String)].head()
    assert(got._2 == 1L, s"overflowing link farm leaked: $got")
    assert(got._3 == "This short real block of prose text survives fine.")
  }

  test("templateFingerprint/templateClusters: same tags same fp, content-blind") {
    val pages = Seq(
      (5L, "<html><body><div><p>alpha</p></div></body></html>"),
      (2L, "<HTML><BODY><DIV><P>totally different words</P></DIV></BODY></HTML>"),
      (3L, "<html><body><ul><li>x</li></ul></body></html>"))
      .toDF("doc_id", "html")
    val got = graft.ops.TextAnalysis.templateClusters(pages)
      .orderBy("exemplar_id")
      .select("n_pages", "exemplar_id").as[(Long, Long)].collect().toSeq
    // docs 5 and 2 share the template (case-insensitive tags), doc 3 differs
    assert(got == Seq((2L, 2L), (1L, 3L)))
  }

  test("token counts: whitespace and subword") {
    val df = Seq("hello world", "  a  b   c ", "", "can't stop-me v2.0").toDF("t")
    val out = df.select(
      TextAnalysis.tokenCount($"t"),
      size(TextAnalysis.subwordTokens($"t"))).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(out(0) == ((2, 2)))
    assert(out(1) == ((3, 3)))
    assert(out(2) == ((0, 0)))
    // can't → can ' t ; stop-me → stop - me ; v2.0 → v 2 . 0
    assert(out(3) == ((3, 10)))
  }

  test("char-class ratios") {
    val df = Seq("ab!?12").toDF("t")
    val r = df.select(
      TextAnalysis.punctRatio($"t"), TextAnalysis.digitRatio($"t"),
      TextAnalysis.upperRatio($"t")).first()
    assert(math.abs(r.getDouble(0) - 2.0 / 6) < 1e-9)
    assert(math.abs(r.getDouble(1) - 2.0 / 6) < 1e-9)
    assert(r.getDouble(2) == 0.0)
  }

  test("language id picks the dominant stopword language") {
    val df = Seq(
      "the cat and the dog went to the store",
      "el perro y la casa de los vecinos en madrid",
      "der hund und die katze ist nicht hier mit ein",
      "xyzzy plugh qwerty").toDF("t")
    val out = df.select(TextAnalysis.langIdHeuristic($"t")).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "de", "unknown"))
  }

  test("quality score rewards natural text, punishes noise") {
    val good = "the quick brown fox jumps over the lazy dog and runs away to the hills"
    val noise = "!!!! #### 1234 5678 $$$$"
    val df = Seq(good, noise).toDF("t")
    val out = df.select(TextAnalysis.qualityScore($"t")).as[Double].collect()
    assert(out(0) == 1.0)
    assert(out(1) <= 0.5)
  }

  test("fingerprint is whitespace-reflow stable; rolling hash deterministic") {
    val df = Seq(("a  b\tc", 1), ("a b c", 2), ("a b d", 3)).toDF("t", "id")
    val fps = df.select(TextAnalysis.fingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    val rh = df.select(TextAnalysis.rollingHash($"t")).as[Long].collect()
    assert(rh(0) == rh(1))
    assert(rh(0) != rh(2))
  }

  test("shingles: char and word") {
    val df = Seq("abcd efg").toDF("t")
    val ch = df.select(TextAnalysis.charShingles($"t", 3)).first().getSeq[String](0)
    assert(ch.contains("abc") && ch.contains("d e") && ch.size == 6)
    val df2 = Seq("w1 w2 w3 w4").toDF("t")
    val ws = df2.select(TextAnalysis.wordShingles($"t", 3)).first().getSeq[String](0)
    assert(ws.toSet == Set("w1 w2 w3", "w2 w3 w4"))
  }

  test("piiRedact scrubs emails, phones, IPs; counts match; clean text untouched") {
    val df = Seq(
      (1L, "mail a.b+c@sub.example.org then call +56-555-1234 from 192.168.1.10 ok"),
      (2L, "no pii here, just text with numbers 12 and a dot."),
      (3L, "two mails x@y.io and z@w.co")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiStats(df).orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 1 && out(0).getInt(3) == 1)
    assert(out(0).getString(4) == "mail [EMAIL] then call [PHONE] from [IP] ok")
    assert(out(1).getInt(1) == 0 && out(1).getInt(2) == 0 && out(1).getInt(3) == 0)
    assert(out(1).getString(4) == "no pii here, just text with numbers 12 and a dot.")
    assert(out(2).getInt(1) == 2)
    assert(out(2).getString(4) == "two mails [EMAIL] and [EMAIL]")
  }

  test("c4LineClean keeps prose lines, cuts short ones, drops banned pages") {
    val df = Seq(
      (1L, "one two three\nxx\nfour five six seven"), // "xx" cut, 2 kept
      (2L, "good line here\nsome Lorem Ipsum filler\nmore text here"), // page drop
      (3L, "a b\nc d") // every line too short -> kept 0, md5("")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4LineClean(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4)))
    def m(s: String): String = spark.sql(s"SELECT md5('$s')").first().getString(0)
    assert(out(0) == ((1L, 3L, 2L, 0, m("one two three\\nfour five six seven"))))
    assert(out(1) == ((2L, 3L, 0L, 1, null)))
    assert(out(2) == ((3L, 2L, 0L, 0, m(""))))
  }

  test("c4LineClean terminal-punctuation rule cuts unpunctuated lines") {
    val df = Seq((1L, "this line ends well.\nthis line does not end")).toDF("doc_id", "text")
    val out = TextAnalysis.c4LineClean(df, requireTerminalPunct = true).first()
    assert(out.getLong(1) == 2L && out.getLong(2) == 1L)
  }

  test("gopherRules: each rule trips on its own planted violation") {
    // a healthy 60-word doc: every rule passes
    val good = (("the be to of and that have with " +
      "alpha words everywhere ") * 5).trim  // 55 words, all alphabetic
    val docs = Seq(
      (1L, good),
      (2L, "the be short"),                        // < 50 words
      (3L, good + " " + Seq.fill(10)("#####").mkString(" ")), // symbol ratio
      (4L, good.split(" ").map(w => s"- $w").mkString("\n")), // bullet lines
      (5L, good + " " + Seq.fill(20)("12345").mkString(" ")), // alpha share
      (6L, Seq.fill(60)("zq").mkString(" "))       // no stop words, len ok
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L) == ((1L, true, true, true, true, true, true, true)))
    assert(!byId(2L)._2 && !byId(2L)._8)           // word count fails
    assert(!byId(3L)._4 && !byId(3L)._8)           // symbol ratio fails
    assert(!byId(4L)._5 && !byId(4L)._8)           // bullet lines fail
    assert(!byId(5L)._6 && !byId(5L)._8)           // alpha share fails
    assert(!byId(6L)._7 && !byId(6L)._8)           // stop words fail
  }

  test("gopherBySource: per-rule pass rates roll up per source") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val good = Seq.fill(8)("the fox and dog that have with jumped").mkString(" ")
    val docs = Seq(
      (1L, "A", good),   // passes every rule (64 words, stopwords, clean)
      (2L, "A", "hi")    // fails word count, mean length, stop words
    ).toDF("doc_id", "source", "text")
    val r = graft.ops.TextAnalysis.gopherBySource(docs).collect()(0)
    assert((r.getString(0), r.getLong(1)) == (("A", 2L)))
    // (word, len, symbol, bullet, alpha, stop, pass)
    assert((2 to 8).map(r.getLong).toSeq ==
      Seq(500000L, 500000L, 1000000L, 1000000L, 1000000L, 500000L, 500000L))
  }

  test("mixedLanguage: line-level disagreement share, unknown lines vote for nobody, tie to first lang") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val docs = Seq(
      // 2 en lines + 1 es line + 1 unknown line → 1/3 disagree
      (1L, "the cat is here\nthe dog and the fox\nel perro que corre y los gatos\n42"),
      // en/es tie → majority 'en' (alphabetical), half disagree
      (2L, "the cat is in the house\nel perro que ladra y los gatos"),
      // all lines unknown → absent from the output
      (3L, "12345\n67890")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.mixedLanguage(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 4L, 3L, "en", 1L, 333333L),
      (2L, 2L, 2L, "en", 1L, 500000L)))
  }
}
