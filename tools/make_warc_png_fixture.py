#!/usr/bin/env python3
"""Generate the committed pixel-PNG WARC fixture for the WARC ->
binary payload -> PNG decode -> perceptual dHash end-to-end gate
(p351_warc_png_dhash):

  src/test/resources/fixture_png.warc
      20 resource records whose payloads are REAL 9x8 grayscale PNGs
      (zlib IDAT, filter type id % 5 so the gate exercises every
      unfilter path) following the exact LCG luma recipe of
      graft.ops.Multimodal.pngPixelsFromIds — same PIXELS as the BMP
      fixture, so the p340 arithmetic oracle replays every dHash bit
      over range(0, 20) — with every (id % 10 == 9) member junk bytes
      (triage must yield NULL). The compressed IDAT bytes need not
      match the Scala builder's (different deflate settings are fine);
      only the decoded pixels are contractual.

Deterministic: same bytes every run. Regenerate with
  python3 tools/make_warc_png_fixture.py
"""
import os
import struct
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources",
                   "fixture_png.warc")

CRLF = "\r\n"


def record(rid, uri, payload):
    headers = [
        "WARC/1.0",
        "WARC-Type: resource",
        f"WARC-Record-ID: <urn:uuid:{rid:08d}-0000-0000-0000-00000000png0>",
        "WARC-Date: 2020-01-01T00:00:00Z",
        f"WARC-Target-URI: {uri}",
        "Content-Type: image/png",
        f"Content-Length: {len(payload)}",
    ]
    return CRLF.join(headers).encode() + (CRLF + CRLF).encode() + \
        payload + (CRLF + CRLF).encode()


def lum(seed, x, y):
    return ((1103515245 * ((seed * 72 + y * 9 + x) % 100000) + 12345)
            % 2147483648) // 65536 % 256


def png(seed):
    filt = seed % 5
    raw = bytearray()
    for y in range(8):
        raw.append(filt)
        for x in range(9):
            v = lum(seed, x, y)
            if filt == 0:
                enc = v
            elif filt == 1:  # Sub
                enc = v - (lum(seed, x - 1, y) if x > 0 else 0)
            elif filt == 2:  # Up
                enc = v - (lum(seed, x, y - 1) if y > 0 else 0)
            elif filt == 3:  # Average
                left = lum(seed, x - 1, y) if x > 0 else 0
                up = lum(seed, x, y - 1) if y > 0 else 0
                enc = v - ((left + up) >> 1)
            else:  # Paeth
                a = lum(seed, x - 1, y) if x > 0 else 0
                b = lum(seed, x, y - 1) if y > 0 else 0
                c = lum(seed, x - 1, y - 1) if x > 0 and y > 0 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc = v - pred
            raw.append(enc & 0xFF)

    def chunk(typ, payload):
        data = typ + payload
        return struct.pack(">I", len(payload)) + data + \
            struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 9, 8, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def build():
    recs = []
    for i in range(20):
        payload = (f"notapng:{i}".encode() if i % 10 == 9 else png(i))
        recs.append(record(i, f"media://png/{i}", payload))
    with open(OUT, "wb") as f:
        f.write(b"".join(recs))
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, {len(recs)} records)")


if __name__ == "__main__":
    build()
