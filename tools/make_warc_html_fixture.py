#!/usr/bin/env python3
"""Generate the committed HTML-crawl WARC fixture for the WARC -> link
extraction end-to-end gate (p332_warc_links), writing the ISO 28500
record grammar directly:

  src/test/resources/fixture_links.warc
      40 HTTP 200 text/html response records whose bodies follow the
      p329 id-derived anchor recipe (base tag, three quote styles, an
      &amp;-escaped external link, a javascript: and a #fragment drop),
      plus two records the HTTP keep-gate must drop: a 404 page and a
      200 image/png.

The body recipe is byte-identical to the p329_link_extract fixture, so
the p329 arithmetic oracle replays this gate's expected output over
range(0, 40) without touching the fixture bytes.

Deterministic: same bytes every run. Regenerate with
  python3 tools/make_warc_html_fixture.py
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources",
                   "fixture_links.warc")

CRLF = "\r\n"


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


def page_html(d):
    # byte-identical to the p329_link_extract synthesized page
    return (
        f'<html><head><base href="/base{d % 4}/"></head><body>'
        f'<a href="rel{d}.html">x</a>'
        f"<A HREF='/top/{d}'>y</A>"
        f'<a id="k" href=bare{d}>z</a>'
        f'<a href="?only={d}">q</a>'
        f'<a href="https://e{d % 6}.example/p?utm_source=z&amp;id={d}">e</a>'
        f'<a href="javascript:void(0)">j</a>'
        f'<a href="#s">f</a></body></html>').encode("utf-8")


def build():
    recs = []
    for d in range(40):
        uri = f"http://w{d % 9}.example/p/{d}/index.html"
        recs.append(record(
            "response", d,
            [f"WARC-Target-URI: {uri}",
             "Content-Type: application/http; msgtype=response"],
            http_response(page_html(d))))
    # keep-gate drops: a 404 html page and a 200 non-html payload
    recs.append(record(
        "response", 40,
        ["WARC-Target-URI: http://w0.example/missing",
         "Content-Type: application/http; msgtype=response"],
        http_response(b"<html><a href=\"/should/not/appear\">x</a></html>",
                      status="404 Not Found")))
    recs.append(record(
        "response", 41,
        ["WARC-Target-URI: http://w0.example/logo.png",
         "Content-Type: application/http; msgtype=response"],
        http_response(b"\x89PNG fake bytes, ascii-safe",
                      ctype="image/png")))
    with open(OUT, "wb") as f:
        f.write(b"".join(recs))
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, {len(recs)} records)")


if __name__ == "__main__":
    build()
