#!/usr/bin/env python3
"""Generate the committed pixel-BMP WARC fixture for the WARC ->
binary payload -> perceptual dHash end-to-end gate (p343_warc_dhash):

  src/test/resources/fixture_bmp.warc
      20 resource records whose payloads are FULL-PIXEL 9x8 24-bpp
      bottom-up BMPs following the exact LCG luma recipe of
      graft.ops.Multimodal.bmpPixelsFromIds (so the p340 arithmetic
      oracle replays every dHash bit over range(0, 20)), with every
      (id % 10 == 9) member junk bytes (triage must yield NULL).

Deterministic: same bytes every run. Regenerate with
  python3 tools/make_warc_bmp_fixture.py
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources",
                   "fixture_bmp.warc")

CRLF = "\r\n"


def record(rid, uri, payload):
    headers = [
        "WARC/1.0",
        "WARC-Type: resource",
        f"WARC-Record-ID: <urn:uuid:{rid:08d}-0000-0000-0000-00000000bmp0>",
        "WARC-Date: 2020-01-01T00:00:00Z",
        f"WARC-Target-URI: {uri}",
        "Content-Type: image/bmp",
        f"Content-Length: {len(payload)}",
    ]
    return CRLF.join(headers).encode() + (CRLF + CRLF).encode() + \
        payload + (CRLF + CRLF).encode()


def lum(seed, x, y):
    return ((1103515245 * ((seed * 72 + y * 9 + x) % 100000) + 12345)
            % 2147483648) // 65536 % 256


def bmp(seed):
    stride = 28  # ((9*3 + 3) // 4) * 4
    out = bytearray(54 + stride * 8)
    out[0:2] = b"BM"
    out[2:6] = struct.pack("<i", len(out))
    out[10:14] = struct.pack("<i", 54)
    out[14:18] = struct.pack("<i", 40)
    out[18:22] = struct.pack("<i", 9)
    out[22:26] = struct.pack("<i", 8)  # positive = bottom-up
    out[26:28] = struct.pack("<h", 1)
    out[28:30] = struct.pack("<h", 24)
    for fr in range(8):
        y = 7 - fr
        for x in range(9):
            v = lum(seed, x, y)
            p = 54 + fr * stride + x * 3
            out[p] = out[p + 1] = out[p + 2] = v
    return bytes(out)


def build():
    recs = []
    for i in range(20):
        payload = (f"notabitmap:{i}".encode() if i % 10 == 9 else bmp(i))
        recs.append(record(i, f"media://bmp/{i}", payload))
    with open(OUT, "wb") as f:
        f.write(b"".join(recs))
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, {len(recs)} records)")


if __name__ == "__main__":
    build()
