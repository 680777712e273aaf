#!/usr/bin/env python3
"""Generate the committed CHARSET-AWARE curation WARC fixture for the
lossless-reader end-to-end gate (p350_warc_curation), writing the ISO
28500 record grammar directly:

  src/test/resources/fixture_curation.warc
      40 HTTP 200 text/html response records over doc ids 0..39 with
      four id classes (precedence top-down):
        d % 8 == 3  -> LATIN-1 French page: the body is encoded
                       ISO-8859-1 (bytes >= 0x80 for the accented
                       chars) and declares charset=iso-8859-1 — the
                       page the TEXT-path reader necessarily drops
                       (its post-decode octet check fails) and the
                       lossless reader must carry through WITH the
                       accents intact.
        d % 8 == 7  -> short English page (fails the Gopher word-count
                       rule; langid has no stopword evidence).
        d % 8 == 5  -> exact duplicate: the article text of doc d-4
                       (a standard-class doc), dropped by the
                       fingerprint dedup stage.
        otherwise   -> standard English article with the doc number
                       embedded.
      plus two records the HTTP keep-gate must drop: a 404 page and a
      200 image/png.

Every body wraps the article text in the SAME boilerplate (link-dense
nav + footer) that mainContent must strip, so the gate's oracle can
rebuild each doc's main_text as a pure string expression.

Deterministic: same bytes every run. Regenerate with
  python3 tools/make_warc_curation_fixture.py

The generator also PRINTS the per-class Gopher rule verdicts it
computes from the exact article strings — the p350 oracle hardcodes
those booleans per class, so they are derived here, not guessed.
"""
import os
import re

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources",
                   "fixture_curation.warc")

CRLF = "\r\n"

STD_SENTENCE = ("the quick brown fox jumps over the lazy dog and then "
                "it runs away again number {d}.")
FR_SENTENCE = ("le café est une boisson dans les rues et le chat est "
               "près du mur numéro {d}.")
SHORT_TEXT = "short text block only here now"


def article_text(d):
    if d % 8 == 3:
        return " ".join([FR_SENTENCE.format(d=d)] * 8)
    if d % 8 == 7:
        return SHORT_TEXT
    if d % 8 == 5:
        return article_text(d - 4)  # d-4 is a standard-class doc
    return " ".join([STD_SENTENCE.format(d=d)] * 8)


def page_html(d):
    return (
        '<html><body>'
        '<div><a href="/nav1">Navigation link one</a> '
        '<a href="/nav2">Navigation link two</a></div>'
        f'<p>{article_text(d)}</p>'
        '<footer><a href="/about">About page link</a> '
        '<a href="/terms">Terms page link</a></footer>'
        '</body></html>')


def gopher_verdicts(text):
    """Mirror graft.ops.TextAnalysis.gopherRules exactly."""
    toks = text.split()
    n = len(toks)
    wchars = len(re.sub(r"\s", "", text))
    hashes = text.count("#")
    ellipses = len(re.findall(r"\.\.\.|…", text))
    lines = text.split("\n")
    bullets = sum(1 for l in lines if re.match(r"^[-*•]", l.strip()))
    alphaw = sum(1 for t in toks if re.search(r"[A-Za-z]", t))
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    stophits = len({t.lower() for t in toks} & stops)
    return {
        "word_count_ok": 50 <= n <= 100000,
        "mean_word_len_ok": 3 * n <= wchars <= 10 * n,
        "symbol_ratio_ok": 10 * (hashes + ellipses) < n,
        "bullet_lines_ok": 10 * bullets <= len(lines),
        "alpha_words_ok": 10 * alphaw >= 8 * n,
        "stop_words_ok": stophits >= 2,
    }


def record(wtype, rid, extra_headers, payload_bytes):
    headers = [
        "WARC/1.0",
        f"WARC-Type: {wtype}",
        f"WARC-Record-ID: <urn:uuid:{rid:08d}-0000-0000-0000-000000000000>",
        "WARC-Date: 2020-01-01T00:00:00Z",
    ] + extra_headers + [
        f"Content-Length: {len(payload_bytes)}",
    ]
    return CRLF.join(headers).encode("utf-8") + (CRLF + CRLF).encode() + \
        payload_bytes + (CRLF + CRLF).encode()


def http_response(body_bytes, status="200 OK", ctype="text/html; charset=utf-8"):
    head = (f"HTTP/1.1 {status}{CRLF}Content-Type: {ctype}{CRLF}"
            f"Content-Length: {len(body_bytes)}{CRLF}{CRLF}")
    return head.encode("utf-8") + body_bytes


def build():
    recs = []
    for d in range(40):
        uri = f"http://c{d % 4}.example/doc/{d}"
        html = page_html(d)
        if d % 8 == 3:
            body = html.encode("iso-8859-1")  # é / è as single >=0x80 bytes
            assert any(b >= 0x80 for b in body), d
            ctype = "text/html; charset=iso-8859-1"
        else:
            body = html.encode("utf-8")
            ctype = "text/html; charset=utf-8"
        recs.append(record(
            "response", d,
            [f"WARC-Target-URI: {uri}",
             "Content-Type: application/http; msgtype=response"],
            http_response(body, ctype=ctype)))
    recs.append(record(
        "response", 40,
        ["WARC-Target-URI: http://c0.example/missing",
         "Content-Type: application/http; msgtype=response"],
        http_response(b"<html><p>not found but long enough</p></html>",
                      status="404 Not Found")))
    recs.append(record(
        "response", 41,
        ["WARC-Target-URI: http://c0.example/logo.png",
         "Content-Type: application/http; msgtype=response"],
        http_response(b"\x89PNG fake bytes, ascii-safe", ctype="image/png")))
    with open(OUT, "wb") as f:
        f.write(b"".join(recs))
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, {len(recs)} records)")
    for cls, d in [("standard", 0), ("latin", 3), ("dup", 5), ("short", 7)]:
        v = gopher_verdicts(article_text(d))
        print(f"class={cls:8s} gopher={v} pass={all(v.values())} "
              f"words={len(article_text(d).split())}")


if __name__ == "__main__":
    build()
