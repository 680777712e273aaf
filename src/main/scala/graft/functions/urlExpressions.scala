package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `url_normalize(url)`: canonical URL form for crawl-scale dedup —
  * the FIRST key a web corpus dedups on, before any content hash
  * (CCNet/C4 pipelines are URL-keyed first; see `sources/Warc.scala`
  * for the ingest this feeds). RFC 3986 §6 syntax-based normalization
  * plus the crawl-standard tracker strip:
  *
  *  - scheme and host lowercased; default ports stripped (http:80,
  *    https:443) along with empty `:`;
  *  - percent-escapes of UNRESERVED bytes (ALPHA / DIGIT / - . _ ~)
  *    decoded; all other escapes uppercased (%2f → %2F) — reserved
  *    bytes stay escaped because decoding them would change the parse;
  *  - dot-segments removed from the path (RFC 3986 §5.2.4); an empty
  *    path becomes "/";
  *  - query parameters: tracking params dropped (utm_* prefix, gclid,
  *    dclid, fbclid, msclkid, mc_cid, mc_eid, igshid, _ga), the rest
  *    percent-normalized and SORTED byte-wise (param order never
  *    distinguishes documents); an emptied query drops its "?";
  *  - the fragment is dropped (never sent to the server).
  *
  * Strings without a `scheme://` prefix pass through UNCHANGED — the
  * triage discipline: a malformed row must map to itself, not kill the
  * task or silently collide on an error sentinel. NULL → NULL.
  * Idempotent: normalize(normalize(x)) == normalize(x) (spec-pinned).
  *
  * Native `doGenCode` (one static call per row inside whole-stage
  * codegen — no ScalaUDF boxing): a 100 TB crawl runs this on every
  * record, so it must fuse into the scan stage. */
case class UrlNormalizeExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UrlNormalizeExpression.evalUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UrlNormalizeExpression.evalUtf8($c);")
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "url_normalize"
}

object UrlNormalizeExpression {

  /** Codegen entry point: one static call per row. */
  def evalUtf8(u: UTF8String): UTF8String =
    UTF8String.fromString(normalize(u.toString))

  private val trackerExact = Set(
    "gclid", "dclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "igshid",
    "_ga")
  private def isTracker(name: String): Boolean =
    name.startsWith("utm_") || trackerExact.contains(name)

  private def isUnreserved(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Percent-normalization: decode unreserved escapes, uppercase the
    * rest, pass invalid escapes through untouched. */
  private def pctNormalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 &&
          hexVal(s.charAt(i + 2)) >= 0) {
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over a percent-normalized
    * path. */
  private[functions] def removeDotSegments(path: String): String = {
    if (path.isEmpty) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    // split keeping the leading-slash structure; -1 keeps trailing ""
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "."  => // skip; a trailing "." still implies a trailing slash
          if (i == segs.length - 1) out += ""
        case ".." =>
          if (out.nonEmpty && out.last != "") out.remove(out.length - 1)
          if (i == segs.length - 1) out += ""
        case s => out += s
      }
      i += 1
    }
    val joined = out.mkString("/")
    if (path.startsWith("/") && !joined.startsWith("/")) "/" + joined
    else joined
  }

  /** Canonicalize one URL; non-`scheme://` strings return unchanged. */
  def normalize(url: String): String = {
    if (url == null) return null
    val sep = url.indexOf("://")
    if (sep <= 0) return url
    var k = 0
    var schemeOk = true
    while (k < sep && schemeOk) {
      val c = url.charAt(k)
      schemeOk = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      k += 1
    }
    if (!schemeOk) return url
    val scheme = url.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = url.substring(sep + 3)
    // authority ends at the first /, ? or #
    var authEnd = rest.length
    var j = 0
    while (j < rest.length && authEnd == rest.length) {
      val c = rest.charAt(j)
      if (c == '/' || c == '?' || c == '#') authEnd = j
      j += 1
    }
    val auth = rest.substring(0, authEnd)
    val tail = rest.substring(authEnd)
    // userinfo kept verbatim; host lowercased; default/empty port stripped
    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at + 1) else ""
    val hostport = if (at >= 0) auth.substring(at + 1) else auth
    // IPv6 literals carry ':' inside brackets — port is after the ']'
    val colon =
      if (hostport.startsWith("[")) {
        val close = hostport.indexOf(']')
        if (close >= 0 && close + 1 < hostport.length &&
            hostport.charAt(close + 1) == ':') close + 1 else -1
      } else hostport.indexOf(':')
    val (host0, port) =
      if (colon >= 0) (hostport.substring(0, colon), hostport.substring(colon + 1))
      else (hostport, null)
    val host = host0.toLowerCase(java.util.Locale.ROOT)
    val keepPort = port != null && port.nonEmpty &&
      !(scheme == "http" && port == "80") &&
      !(scheme == "https" && port == "443")
    val authority = userinfo + host + (if (keepPort) ":" + port else "")
    // split tail into path / query / fragment (fragment dropped)
    val hashAt = tail.indexOf('#')
    val noFrag = if (hashAt >= 0) tail.substring(0, hashAt) else tail
    val qAt = noFrag.indexOf('?')
    val rawPath = if (qAt >= 0) noFrag.substring(0, qAt) else noFrag
    val rawQuery = if (qAt >= 0) noFrag.substring(qAt + 1) else null
    val path0 = removeDotSegments(pctNormalize(rawPath))
    val path = if (path0.isEmpty) "/" else path0
    val query =
      if (rawQuery == null || rawQuery.isEmpty) null
      else {
        val kept = rawQuery.split("&", -1).toSeq
          .filter(_.nonEmpty)
          .map(pctNormalize)
          .filterNot { p =>
            val eq = p.indexOf('=')
            isTracker(if (eq >= 0) p.substring(0, eq) else p)
          }
          .sorted
        if (kept.isEmpty) null else kept.mkString("&")
      }
    scheme + "://" + authority + path +
      (if (query == null) "" else "?" + query)
  }
}

/** `robots_match(path, pattern)`: RFC 9309 §2.2.2 path-pattern match —
  * `*` matches any span of octets (including none), a TRAILING `$`
  * anchors the match at the end of the path, anything else (including
  * an interior `$`) is literal; without the anchor the pattern must
  * match a PREFIX of the path. Matching is over UTF-8 OCTETS (the
  * RFC's unit — multi-byte characters never half-match).
  *
  * Algorithm: split on `*` and scan segments leftmost-greedy — the
  * first segment pins to position 0, middle segments take their
  * earliest occurrence (optimal for existence), the last segment pins
  * to the path end when anchored. Linear in |path|·|segments|, no
  * regex compilation — this runs inside the per-rule fold of
  * [[graft.ops.UrlOps.robotsAllowed]] on every crawl row, where a
  * per-row `rlike` would pay a regex compile per (row, rule). */
case class RobotsMatchExpression(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override protected def nullSafeEval(path: Any, pattern: Any): Any =
    RobotsMatchExpression.matches(
      path.asInstanceOf[UTF8String], pattern.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, q) =>
      s"${ev.value} = graft.functions.RobotsMatchExpression.matches($p, $q);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "robots_match"
}

object RobotsMatchExpression {
  def matches(path: UTF8String, pattern: UTF8String): Boolean =
    matchesBytes(path.getBytes, pattern.getBytes)

  private def indexOf(t: Array[Byte], seg: Array[Byte], segFrom: Int,
      segLen: Int, from: Int): Int = {
    if (segLen == 0) return from
    var i = from
    val last = t.length - segLen
    while (i <= last) {
      var k = 0
      while (k < segLen && t(i + k) == seg(segFrom + k)) k += 1
      if (k == segLen) return i
      i += 1
    }
    -1
  }

  def matchesBytes(t: Array[Byte], p0: Array[Byte]): Boolean = {
    val anchored = p0.nonEmpty && p0(p0.length - 1) == '$'
    val pLen = if (anchored) p0.length - 1 else p0.length
    // split positions of '*' within p0[0, pLen)
    var segStart = 0
    var pos = 0 // current match position in t
    var first = true
    var i = 0
    while (i <= pLen) {
      if (i == pLen || p0(i) == '*') {
        val segLen = i - segStart
        val isLast = i == pLen
        if (first) {
          // first segment pins to the path start
          if (segLen > t.length) return false
          var k = 0
          while (k < segLen) {
            if (t(k) != p0(segStart + k)) return false
            k += 1
          }
          pos = segLen
          first = false
        } else if (isLast && anchored) {
          // last segment pins to the path END (preceded by a '*')
          val at = t.length - segLen
          if (at < pos) return false
          var k = 0
          while (k < segLen) {
            if (t(at + k) != p0(segStart + k)) return false
            k += 1
          }
          pos = t.length
        } else {
          val at = indexOf(t, p0, segStart, segLen, pos)
          if (at < 0) return false
          pos = at + segLen
        }
        if (isLast) {
          // anchored: the tail was pinned to the path end above (a
          // trailing '*' pins an empty segment there — absorbs the
          // rest). Un-anchored: prefix semantics — pattern exhausted
          // means match.
          return !anchored || pos == t.length
        }
        segStart = i + 1
      }
      i += 1
    }
    false // unreachable
  }
}

/** `url_resolve(base, ref)`: RFC 3986 §5.2 relative-reference
  * resolution — the step between "extracted an `href`" and "have a
  * fetchable URL" in a crawl frontier. Strict per §5.2.2: a reference
  * carrying its own scheme is returned verbatim (so `http:g` →
  * `http:g`, the strict row of the §5.4.2 table), `//host/p` adopts
  * only the base scheme, `/p` the base authority, `p` merges onto the
  * base path (§5.2.3) with dot segments removed (§5.2.4), `?q` keeps
  * the base path, the empty reference returns the base without its
  * fragment, and the reference's fragment (if any) is carried through.
  * Returns NULL when the base is not an absolute hierarchical URI
  * (`scheme://…`) — a row-level data problem, never an exception.
  *
  * Codegen: one static call per row (same discipline as
  * [[UrlNormalizeExpression]]) so link-extraction stays inside
  * whole-stage codegen at crawl scale. */
case class UrlResolveExpression(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(base: Any, ref: Any): Any =
    UrlResolveExpression.evalUtf8(
      base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resolved = ctx.freshName("resolved")
    nullSafeCodeGen(ctx, ev, (b, r) => s"""
      org.apache.spark.unsafe.types.UTF8String $resolved =
        graft.functions.UrlResolveExpression.evalUtf8($b, $r);
      if ($resolved == null) { ${ev.isNull} = true; } else { ${ev.value} = $resolved; }
    """)
  }
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "url_resolve"
}

object UrlResolveExpression {

  /** Codegen entry point; null = unresolvable (non-hierarchical base). */
  def evalUtf8(base: UTF8String, ref: UTF8String): UTF8String = {
    val r = resolve(base.toString, ref.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** True iff `s.substring(0, colon)` is a valid RFC 3986 scheme
    * (ALPHA *( ALPHA / DIGIT / "+" / "-" / "." )). */
  private def validScheme(s: String, colon: Int): Boolean = {
    if (colon <= 0) return false
    val c0 = s.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
    var i = 1
    while (i < colon) {
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return false
      i += 1
    }
    true
  }

  /** Position of the scheme-terminating ':' — the first ':' occurring
    * before any '/', '?' or '#' — or -1 if the string is scheme-less
    * (so `./g:h` is a path reference, `g:h` is not). */
  private def schemeColon(s: String): Int = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return i
      if (c == '/' || c == '?' || c == '#') return -1
      i += 1
    }
    -1
  }

  /** Split `s` (a reference without scheme/authority) into
    * (path, query|null, fragment|null) — null means "not present",
    * distinct from present-but-empty (`g?` has query ""). */
  private def splitPqf(s: String): (String, String, String) = {
    val hashAt = s.indexOf('#')
    val frag = if (hashAt >= 0) s.substring(hashAt + 1) else null
    val noFrag = if (hashAt >= 0) s.substring(0, hashAt) else s
    val qAt = noFrag.indexOf('?')
    val query = if (qAt >= 0) noFrag.substring(qAt + 1) else null
    val path = if (qAt >= 0) noFrag.substring(0, qAt) else noFrag
    (path, query, frag)
  }

  /** RFC 3986 §5.3 component recomposition. */
  private def recompose(scheme: String, authority: String, path: String,
      query: String, fragment: String): String = {
    val sb = new java.lang.StringBuilder(scheme.length + path.length + 16)
    sb.append(scheme).append(':')
    if (authority != null) sb.append("//").append(authority)
    sb.append(path)
    if (query != null) sb.append('?').append(query)
    if (fragment != null) sb.append('#').append(fragment)
    sb.toString
  }

  /** Resolve `ref` against `base` per RFC 3986 §5.2.2 (strict).
    * Returns null if `base` is not `scheme://…`. */
  def resolve(base: String, ref: String): String = {
    if (base == null || ref == null) return null
    // A reference with its own scheme is already absolute (§5.2.2
    // strict: no same-scheme backward-compat rewrite, so http:g stays
    // http:g) — but §5.2.2 still sets T.path =
    // remove_dot_segments(R.path), so http://h/a/../b → http://h/b.
    val refColon = schemeColon(ref)
    if (refColon > 0 && validScheme(ref, refColon)) {
      val afterColon = ref.substring(refColon + 1)
      if (afterColon.startsWith("//")) {
        val rest = afterColon.substring(2)
        var aEnd = rest.length
        var j = 0
        while (j < rest.length && aEnd == rest.length) {
          val c = rest.charAt(j)
          if (c == '/' || c == '?' || c == '#') aEnd = j
          j += 1
        }
        val (p, q, f) = splitPqf(rest.substring(aEnd))
        return recompose(ref.substring(0, refColon), rest.substring(0, aEnd),
          UrlNormalizeExpression.removeDotSegments(p), q, f)
      }
      // No authority: rootless/opaque path — §5.2.4 still applies
      // (removes a/../b), and is a no-op for genuinely opaque
      // payloads (mailto:, urn:) that carry no dot segments.
      val (p, q, f) = splitPqf(afterColon)
      return recompose(ref.substring(0, refColon), null,
        UrlNormalizeExpression.removeDotSegments(p), q, f)
    }
    // Base must be an absolute hierarchical URI: scheme "://" authority.
    val baseColon = schemeColon(base)
    if (baseColon <= 0 || !validScheme(base, baseColon)) return null
    if (base.length < baseColon + 3 || base.charAt(baseColon + 1) != '/' ||
        base.charAt(baseColon + 2) != '/') return null
    val scheme = base.substring(0, baseColon)
    val afterSs = base.substring(baseColon + 3)
    var authEnd = afterSs.length
    var i = 0
    while (i < afterSs.length && authEnd == afterSs.length) {
      val c = afterSs.charAt(i)
      if (c == '/' || c == '?' || c == '#') authEnd = i
      i += 1
    }
    val baseAuth = afterSs.substring(0, authEnd)
    val (basePath, baseQuery, _) = splitPqf(afterSs.substring(authEnd))
    // Network-path reference: adopt only the base scheme.
    if (ref.startsWith("//")) {
      val rest = ref.substring(2)
      var aEnd = rest.length
      var j = 0
      while (j < rest.length && aEnd == rest.length) {
        val c = rest.charAt(j)
        if (c == '/' || c == '?' || c == '#') aEnd = j
        j += 1
      }
      val (p, q, f) = splitPqf(rest.substring(aEnd))
      return recompose(scheme, rest.substring(0, aEnd),
        UrlNormalizeExpression.removeDotSegments(p), q, f)
    }
    val (refPath, refQuery, refFrag) = splitPqf(ref)
    if (refPath.isEmpty) {
      // Same document / query-only reference: keep the base path.
      val q = if (refQuery != null) refQuery else baseQuery
      recompose(scheme, baseAuth, basePath, q, refFrag)
    } else if (refPath.charAt(0) == '/') {
      recompose(scheme, baseAuth,
        UrlNormalizeExpression.removeDotSegments(refPath), refQuery, refFrag)
    } else {
      // §5.2.3 merge: an authority with an empty path merges onto "/";
      // otherwise onto the base path's directory (up to the last '/').
      val merged =
        if (basePath.isEmpty) "/" + refPath
        else {
          val cut = basePath.lastIndexOf('/')
          if (cut < 0) refPath else basePath.substring(0, cut + 1) + refPath
        }
      recompose(scheme, baseAuth,
        UrlNormalizeExpression.removeDotSegments(merged), refQuery, refFrag)
    }
  }
}

object UrlFunctions {
  def url_normalize(c: Column): Column =
    column(UrlNormalizeExpression(expression(c)))
  def robots_match(path: Column, pattern: Column): Column =
    column(RobotsMatchExpression(expression(path), expression(pattern)))
  def url_resolve(base: Column, ref: Column): Column =
    column(UrlResolveExpression(expression(base), expression(ref)))
}
