#!/usr/bin/env python3
"""Generate the committed BINARY-member WARC fixture: real crawl-shaped
bytes for the media triage family, so the image/audio/video header
scanners are gated on actual WARC payloads (Warc.recordsBinary) instead
of id-synthesized frames.

  src/test/resources/fixture_media.warc
      60 resource records, one binary payload each:
        ids  0-19  media://img/<id>  image headers (PNG/GIF/BMP/JPEG/junk)
        ids 20-39  media://aud/<id>  audio headers (WAV/FLAC/MP3/junk)
        ids 40-59  media://vid/<id>  video headers (MP4 v0/v1/free, WebM,
                                     MKV unknown-size, junk)

Byte recipes mirror graft.ops.Multimodal.{headerBytesFromIds,
audioBytesFromIds,videoBytesFromIds} EXACTLY (same id arithmetic:
width id%640+32, height id%480+32, WAV/FLAC rate (id%12+2)*4000, …)
so the p327 DuckDB oracle recomputes every triage claim arithmetically
— any parser or reader drift hash-fails. The id ranges are 20 wide so
every mod-class of every recipe occurs.

Deterministic: same bytes every run. Regenerate with
  python3 tools/make_warc_binary_fixture.py
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources",
                   "fixture_media.warc")

CRLF = "\r\n"


def be32(v): return struct.pack(">I", v)
def be16(v): return struct.pack(">H", v)
def le32(v): return struct.pack("<I", v)
def le24(v): return struct.pack("<I", v)[:3]
def le16(v): return struct.pack("<H", v)


def image_bytes(i):
    w, h = i % 640 + 32, i % 480 + 32
    m = i % 5
    if m == 0:  # PNG signature + IHDR
        return (b"\x89PNG\x0d\x0a\x1a\x0a" + be32(13) + b"IHDR" +
                be32(w) + be32(h) + bytes([8, 6, 0, 0, 0]))
    if m == 1:  # GIF89a logical screen descriptor
        return b"GIF89a" + le16(w) + le16(h) + bytes(3)
    if m == 2:  # BM + file header + BITMAPINFOHEADER prefix
        return (b"BM" + le32(0) + le32(0) + le32(54) + le32(40) +
                le32(w) + le32(h) + le16(1) + le16(24))
    if m == 3:  # SOI + SOF0
        return (bytes([0xff, 0xd8, 0xff, 0xc0, 0x00, 0x11, 0x08]) +
                be16(h) + be16(w) + bytes([3]))
    return f"notanimage:{i}".encode()


def audio_bytes(i):
    rate = (i % 12 + 2) * 4000
    ch = (i // 4) % 2 + 1
    m = i % 4
    if m == 0:  # RIFF/WAVE, PCM fmt, optional leading JUNK chunk
        bits = ((i // 4) % 4 + 1) * 8
        fmt = (b"fmt " + le32(16) + le16(1) + le16(ch) + le32(rate) +
               le32(rate * ch * bits // 8) + le16(ch * bits // 8) + le16(bits))
        lead = (b"JUNK" + le32(4) + bytes(4)) if (i // 4) % 3 == 0 else b""
        return (b"RIFF" + le32(4 + len(lead) + len(fmt)) + b"WAVE" +
                lead + fmt)
    if m == 1:  # fLaC + STREAMINFO (bit-packed rate/channels/bits)
        bits = i % 24 + 8
        si = bytearray(34)
        si[10] = (rate >> 12) & 0xff
        si[11] = (rate >> 4) & 0xff
        si[12] = ((rate & 0xf) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4)
        si[13] = ((bits - 1) & 0xf) << 4
        return b"fLaC" + bytes([0, 0, 0, 34]) + bytes(si)
    if m == 2:  # MPEG1 Layer III frame header, optional ID3v2 envelope
        r = i % 3
        frame = bytes([0xff, 0xfb, 0x90 | (r << 2),
                       0xc0 if ch == 1 else 0x40])
        id3 = (b"ID3" + bytes([4, 0, 0, 0, 0, 0, 8]) + bytes(8)) \
            if (i // 4) % 3 == 0 else b""
        return id3 + frame
    return f"notaudio:{i}".encode()


def video_bytes(i):
    w, h = i % 640 + 32, i % 480 + 32

    def box(typ, payload):
        return be32(len(payload) + 8) + typ.encode() + payload

    def mp4(v1, leading_free):
        tkhd = box("tkhd", bytes([1 if v1 else 0, 0, 0, 0]) +
                   bytes(32 if v1 else 20) + bytes(16) + bytes(36) +
                   be32(w << 16) + be32(h << 16))
        ftyp = box("ftyp", b"isom" + be32(0))
        free = box("free", bytes(4)) if leading_free else b""
        return ftyp + free + box("moov", box("trak", tkhd))

    def el(eid, content):
        return eid + bytes([0x80 | len(content)]) + content

    def ebml(doctype, unknown_seg):
        header = el(b"\x1a\x45\xdf\xa3", el(b"\x42\x82", doctype.encode()))
        video = el(b"\xe0", el(b"\xb0", be16(w)) + el(b"\xba", be16(h)))
        tracks = el(b"\x16\x54\xae\x6b", el(b"\xae", video))
        seg_id = b"\x18\x53\x80\x67"
        seg = seg_id + b"\xff" + tracks if unknown_seg else el(seg_id, tracks)
        return header + seg

    m = i % 6
    if m == 0:
        return mp4(False, False)
    if m == 1:
        return mp4(True, False)
    if m == 2:
        return mp4(False, True)
    if m == 3:
        return ebml("webm", False)
    if m == 4:
        return ebml("matroska", True)
    return f"notavideo:{i}".encode()


def record(rid, uri, payload):
    headers = [
        "WARC/1.0",
        "WARC-Type: resource",
        f"WARC-Record-ID: <urn:uuid:media-{rid:04d}>",
        f"WARC-Target-URI: {uri}",
        "WARC-Date: 2020-01-01T00:00:00Z",
        "Content-Type: application/octet-stream",
        f"Content-Length: {len(payload)}",
    ]
    return (CRLF.join(headers).encode() + (CRLF + CRLF).encode() +
            payload + (CRLF + CRLF).encode())


def build():
    out = b""
    for i in range(0, 20):
        out += record(i, f"media://img/{i}", image_bytes(i))
    for i in range(20, 40):
        out += record(i, f"media://aud/{i}", audio_bytes(i))
    for i in range(40, 60):
        out += record(i, f"media://vid/{i}", video_bytes(i))
    with open(OUT, "wb") as f:
        f.write(out)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    build()
