package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlResolveExpression.resolve
import graft.functions.UrlFunctions.url_resolve

/** RFC 3986 §5 relative-reference resolution, pinned to the spec's own
  * published test vectors (§5.4.1 normal + §5.4.2 abnormal — a public
  * conformance table), then differentially fuzzed against
  * `java.net.URI.resolve` on the well-formed subset where the JDK is
  * known-conformant (the JDK deviates on empty refs, fragment-only
  * refs, and above-root `..` — those paths are pinned by the vector
  * table instead). */
class UrlResolveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val B = "http://a/b/c/d;p?q"

  test("RFC 3986 §5.4.1 normal examples") {
    val vectors = Seq(
      "g:h" -> "g:h",
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s",
      "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    for ((ref, want) <- vectors)
      assert(resolve(B, ref) == want, s"ref=<$ref>")
  }

  test("RFC 3986 §5.4.2 abnormal examples (strict)") {
    val vectors = Seq(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      // dot segments in query/fragment are data, not path
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g#s/./x",
      "g#s/../x" -> "http://a/b/c/g#s/../x",
      // strict parser: same-scheme reference is NOT rewritten
      "http:g" -> "http:g")
    for ((ref, want) <- vectors)
      assert(resolve(B, ref) == want, s"ref=<$ref>")
  }

  test("edges: invalid base, scheme-looking segments, authority roots") {
    // base must be scheme://… — everything else is a row-level null
    assert(resolve("not a url", "g") == null)
    assert(resolve("mailto:x@y.z", "g") == null)
    assert(resolve(null, "g") == null)
    assert(resolve(B, null) == null)
    // ./g:h is a path reference (the ./ guard the RFC prescribes)
    assert(resolve(B, "./g:h") == "http://a/b/c/g:h")
    // 1:x has no valid scheme (must start ALPHA) -> path reference
    assert(resolve(B, "1:x") == "http://a/b/c/1:x")
    // authority with empty path merges onto "/"
    assert(resolve("http://h.example", "g") == "http://h.example/g")
    assert(resolve("http://h.example?q=1", "g") == "http://h.example/g")
    // network-path ref keeps its own query/fragment and dot-cleans
    assert(resolve(B, "//h/x/../y?a#b") == "http://h/y?a#b")
    // empty query / empty fragment are present-but-empty, not absent
    assert(resolve(B, "g?") == "http://a/b/c/g?")
    assert(resolve(B, "g#") == "http://a/b/c/g#")
    // uppercase scheme in ref is still a scheme
    assert(resolve(B, "HTTPS://x/y") == "HTTPS://x/y")
  }

  test("scheme'd refs still get §5.2.2 remove_dot_segments on the path") {
    // T.path = remove_dot_segments(R.path) applies even when R.scheme
    // is defined — an absolute ref is not returned verbatim
    assert(resolve(B, "http://h/a/../b") == "http://h/b")
    assert(resolve(B, "http://h/./x/./y") == "http://h/x/y")
    assert(resolve(B, "https://h/a/b/../../c?q#f") == "https://h/c?q#f")
    // rootless scheme'd path: dot segments removed there too
    assert(resolve(B, "x-s:a/../b") == "x-s:b")
    // strict §5.4.2 row is untouched (no dot segments to remove)
    assert(resolve(B, "http:g") == "http:g")
    // genuinely opaque payloads pass through unchanged
    assert(resolve(B, "mailto:user@h.example") == "mailto:user@h.example")
    assert(resolve(B, "urn:isbn:0451450523") == "urn:isbn:0451450523")
    // authority-only ref with dotted path and empty authority parse
    assert(resolve(B, "http://h") == "http://h")
  }

  test("differential fuzz vs java.net.URI on the JDK-conformant subset") {
    val rnd = new scala.util.Random(20260816L)
    val seg = () => {
      val alpha = "abcdefgh"
      (0 until 1 + rnd.nextInt(4)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    var checked = 0
    for (_ <- 0 until 2000) {
      val baseDepth = 1 + rnd.nextInt(4)
      val base = "http://" + seg() + ".example/" +
        (0 until baseDepth).map(_ => seg()).mkString("/") +
        (if (rnd.nextBoolean()) "?" + seg() + "=" + seg() else "")
      // well-formed relative refs: optional ../ climb below root,
      // segments, optional trailing slash, optional query+fragment
      val climbs = rnd.nextInt(baseDepth) // never above root
      val nSegs = 1 + rnd.nextInt(3)
      val ref = ("../" * climbs) +
        (0 until nSegs).map(_ => seg()).mkString("/") +
        (if (rnd.nextBoolean()) "/" else "") +
        (if (rnd.nextBoolean()) "?" + seg() + "=" + seg() else "") +
        (if (rnd.nextBoolean()) "#" + seg() else "")
      val got = resolve(base, ref)
      val want = java.net.URI.create(base).resolve(ref).toString
      assert(got == want, s"base=<$base> ref=<$ref>")
      checked += 1
    }
    assert(checked == 2000)
  }

  test("column form: codegen path, null semantics, plan stays map-only") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0, B, "g"),
      (1, B, "../x?b=2&a=1"),
      (2, "junk", "g"),
      (3, B, null.asInstanceOf[String]))
      .toDF("id", "base", "ref")
      .select($"id", url_resolve($"base", $"ref").as("u"))
    val got = df.orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(got.toSeq == Seq(
      "http://a/b/c/g", "http://a/b/x?b=2&a=1", null, null))
    // the projection itself is map-only: no shuffle in its plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
