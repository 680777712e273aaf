#!/usr/bin/env python3
"""Generate the committed WARC 1.0 test fixture from scratch, writing the
ISO 28500 record grammar directly (record = version line, named headers,
CRLF CRLF, Content-Length payload octets, CRLF CRLF):

  src/test/resources/fixture_crawl.warc
      warcinfo + request + two response records (one with a UTF-8
      multibyte HTML body), plus a PATHOLOGICAL response whose payload
      embeds the exact inter-record byte sequence "\r\n\r\nWARC/1.0\r\n"
      — the case a distributed text-split CANNOT parse losslessly; the
      reader must surface it via length_ok = false, never silently.

Deterministic: same bytes every run. Regenerate with
  python3 tools/make_warc_fixture.py
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources",
                   "fixture_crawl.warc")

CRLF = "\r\n"


def record(wtype, rid, extra_headers, payload_bytes):
    headers = [
        "WARC/1.0",
        f"WARC-Type: {wtype}",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        "WARC-Date: 2020-01-01T00:00:00Z",
    ] + extra_headers + [
        f"Content-Length: {len(payload_bytes)}",
    ]
    return CRLF.join(headers).encode("utf-8") + (CRLF + CRLF).encode() + \
        payload_bytes + (CRLF + CRLF).encode()


def http_response(body_bytes, ctype="text/html; charset=utf-8"):
    head = (f"HTTP/1.1 200 OK{CRLF}Content-Type: {ctype}{CRLF}"
            f"Content-Length: {len(body_bytes)}{CRLF}{CRLF}")
    return head.encode("utf-8") + body_bytes


def build():
    info = record("warcinfo", "00000000-0000-0000-0000-000000000001",
                  ["Content-Type: application/warc-fields"],
                  f"software: graft-fixture{CRLF}format: WARC File Format 1.0".encode())
    req = record("request", "00000000-0000-0000-0000-000000000002",
                 ["WARC-Target-URI: http://example.org/a",
                  "Content-Type: application/http; msgtype=request"],
                 f"GET /a HTTP/1.1{CRLF}Host: example.org{CRLF}{CRLF}".encode())
    body_a = ("<html><head><title>A</title></head>"
              "<body><p>alpha &amp; beta</p></body></html>").encode()
    resp_a = record("response", "00000000-0000-0000-0000-000000000003",
                    ["WARC-Target-URI: http://example.org/a",
                     "Content-Type: application/http; msgtype=response"],
                    http_response(body_a))
    body_b = ("<html><body><h1>Ünïcode — 中文</h1><p>páge b</p></body></html>"
              ).encode("utf-8")
    resp_b = record("response", "00000000-0000-0000-0000-000000000004",
                    ["WARC-Target-URI: http://example.org/b",
                     "Content-Type: application/http; msgtype=response"],
                    http_response(body_b))
    # payload embeds the exact inter-record sequence → false split; the
    # reader must flag BOTH fragments via length_ok = false
    evil_body = (f"before{CRLF}{CRLF}WARC/1.0{CRLF}"
                 "WARC-Type: fake-injected-header" + CRLF + "after").encode()
    resp_evil = record("response", "00000000-0000-0000-0000-000000000005",
                       ["WARC-Target-URI: http://example.org/evil",
                        "Content-Type: application/http; msgtype=response"],
                       http_response(evil_body, ctype="text/plain"))
    with open(OUT, "wb") as f:
        f.write(info + req + resp_a + resp_b + resp_evil)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    build()
