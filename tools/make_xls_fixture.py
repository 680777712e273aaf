#!/usr/bin/env python3
"""Generate the committed BIFF8 .xls test fixtures from scratch (no Excel
library exists in this environment), implementing the PUBLIC [MS-CFB] and
[MS-XLS]/OpenOffice BIFF8 documentation directly:

  src/test/resources/fixture_3cv.xls
      2-sheet workbook whose sheet 0 is the homologation demo grid
      (multi-row headers with embedded newlines, '-' sentinels, numeric
      cells) — small enough that the Workbook stream lands in the CFB
      MINISTREAM (the path real writers use below the 4096-byte cutoff).

  src/test/resources/fixture_sst_continue.xls
      1-sheet workbook whose SST is forced to split across CONTINUE
      records mid-string (the notorious BIFF8 corner: the compression
      flag byte is re-emitted at each continuation), with RK / MULRK /
      MULBLANK / BOOLERR cells and an uncompressed (UTF-16) string —
      large enough to exercise the regular-FAT stream path.

Deterministic: same bytes every run. Regenerate with
  python3 tools/make_xls_fixture.py
"""
import struct
import os

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources")

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


# --------------------------------------------------------------- BIFF8

def rec(rid, payload):
    return struct.pack("<HH", rid, len(payload)) + payload


def bof(dt):
    # vers, dt, rupBuild, rupYear, bfh, sfo
    return rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0x0106))


EOF = rec(0x000A, b"")


def is_compressible(s):
    return all(ord(c) < 256 for c in s)


def shortstr(s):
    # sheet names: 8-bit length + flags + chars
    assert is_compressible(s)
    return struct.pack("<BB", len(s), 0) + s.encode("latin-1")


def sst_records(strings, maxlen=8224):
    """SST + CONTINUE payloads. Strings split only inside character data,
    where the continuation re-emits the compression flag byte; headers
    are never split and at least one character follows a header."""
    payloads = []
    cur = bytearray(struct.pack("<ii", len(strings), len(strings)))

    def room():
        return maxlen - len(cur)

    def flush():
        nonlocal cur
        payloads.append(bytes(cur))
        cur = bytearray()

    for s in strings:
        compressed = is_compressible(s)
        unit = 1 if compressed else 2
        header = struct.pack("<HB", len(s), 0 if compressed else 1)
        if room() < len(header) + unit:
            flush()
        cur += header
        data = s.encode("latin-1") if compressed else s.encode("utf-16-le")
        i = 0
        while i < len(data):
            if room() < unit:
                flush()
                cur += struct.pack("<B", 0 if compressed else 1)  # re-emitted flag
            take = min(room(), len(data) - i)
            take -= take % unit
            cur += data[i : i + take]
            i += take
    flush()
    recs = rec(0x00FC, payloads[0])
    for p in payloads[1:]:
        recs += rec(0x003C, p)  # CONTINUE
    return recs


def num_str(v):
    # must mirror XlsGrid.numStr
    return str(int(v)) if float(v).is_integer() and abs(v) < 1e15 else repr(v)


def cell_records(grid, sst_index):
    """LABELSST for strings, NUMBER for round-trip-identical numerics,
    BLANK for None."""
    out = b""
    for r, row in enumerate(grid):
        for c, v in enumerate(row):
            if v is None:
                out += rec(0x0201, struct.pack("<HHH", r, c, 0))  # BLANK
            else:
                as_num = None
                try:
                    f = float(v)
                    if num_str(f) == v:
                        as_num = f
                except ValueError:
                    pass
                if as_num is not None:
                    out += rec(0x0203, struct.pack("<HHH", r, c, 0) + struct.pack("<d", as_num))
                else:
                    out += rec(0x00FD, struct.pack("<HHHi", r, c, 0, sst_index[v]))
    return out


def rk_int(v):
    assert -(2 ** 29) <= v < 2 ** 29
    return (v << 2) | 2


def sheet_substream(body_records, nrows, ncols):
    dims = rec(0x0200, struct.pack("<IIHHH", 0, nrows, 0, ncols, 0))
    return bof(0x0010) + dims + body_records + EOF


def workbook_stream(sheets):
    """sheets: list of (name, substream_bytes_builder(sst_index)) where the
    builder also registers strings; here simplified: (name, strings, body_fn)."""
    # collect SST strings in first-use order across sheets
    sst, sst_index = [], {}

    def intern(s):
        if s not in sst_index:
            sst_index[s] = len(sst)
            sst.append(s)

    built = []
    for name, register, build in sheets:
        register(intern)
        built.append((name, build))

    sst_bytes = sst_records(sst)

    # globals: BOF + BOUNDSHEET per sheet (offsets patched after the
    # globals length is known) + SST + EOF
    def boundsheet(offset, name):
        return rec(0x0085, struct.pack("<IBB", offset, 0, 0) + shortstr(name))

    placeholder = [boundsheet(0, n) for n, _ in built]
    head_len = len(bof(0x0005)) + sum(len(p) for p in placeholder) + len(sst_bytes) + len(EOF)
    offsets, pos = [], head_len
    substreams = []
    for (name, build) in built:
        ss = build(sst_index)
        offsets.append(pos)
        substreams.append(ss)
        pos += len(ss)
    out = bof(0x0005)
    for (name, _), off in zip(built, offsets):
        out += boundsheet(off, name)
    out += sst_bytes + EOF
    for ss in substreams:
        out += ss
    return out


# ---------------------------------------------------------------- CFB

def dir_entry(name, objtype, color, left, right, child, start, size):
    if name:
        n = (name + "\x00").encode("utf-16-le")
    else:
        n = b""
    assert len(n) <= 64
    return (
        n + b"\x00" * (64 - len(n))
        + struct.pack("<HBBiii", len(n), objtype, color, left, right, child)
        + b"\x00" * 16  # clsid
        + b"\x00" * 4   # state
        + b"\x00" * 16  # ctime + mtime
        + struct.pack("<Ii", start & 0xFFFFFFFF, size)
        + b"\x00" * 4   # size high dword (v3: zero)
    )


def cfb_container(stream_bytes):
    sector, mini = 512, 64
    use_mini = len(stream_bytes) < 4096

    def header(nfat, first_dir, first_minifat, n_minifat, difat0):
        difat = [difat0] + [FREESECT] * 108
        return (
            bytes([0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1])
            + b"\x00" * 16
            + struct.pack("<HHHHH", 0x003E, 0x0003, 0xFFFE, 9, 6)
            + b"\x00" * 6
            + struct.pack("<IIIIIIII", 0, nfat, first_dir, 0, 4096,
                          first_minifat, n_minifat, ENDOFCHAIN)
            + struct.pack("<I", 0)  # num DIFAT sectors
            + b"".join(struct.pack("<I", d) for d in difat)
        )

    def pad(b, size):
        return b + b"\x00" * (-len(b) % size)

    if use_mini:
        minidata = pad(stream_bytes, mini)
        n_mini = len(minidata) // mini
        minifat = [i + 1 for i in range(n_mini - 1)] + [ENDOFCHAIN]
        minifat += [FREESECT] * (128 - len(minifat))
        ministream = pad(minidata, sector)
        k = len(ministream) // sector
        # layout: 0 FAT | 1 directory | 2 miniFAT | 3.. ministream
        fat = [FATSECT, ENDOFCHAIN, ENDOFCHAIN]
        fat += [3 + i + 1 for i in range(k - 1)] + [ENDOFCHAIN]
        fat += [FREESECT] * (128 - len(fat))
        directory = pad(
            dir_entry("Root Entry", 5, 1, -1, -1, 1, 3, len(minidata))
            + dir_entry("Workbook", 2, 1, -1, -1, -1, 0, len(stream_bytes))
            + dir_entry(None, 0, 0, -1, -1, -1, 0, 0)
            + dir_entry(None, 0, 0, -1, -1, -1, 0, 0),
            sector,
        )
        body = (
            b"".join(struct.pack("<I", f) for f in fat)
            + directory
            + b"".join(struct.pack("<I", m) for m in minifat)
            + ministream
        )
        return header(1, 1, 2, 1, 0) + body
    else:
        data = pad(stream_bytes, sector)
        k = len(data) // sector
        # layout: 0 FAT | 1 directory | 2.. stream
        fat = [FATSECT, ENDOFCHAIN]
        fat += [2 + i + 1 for i in range(k - 1)] + [ENDOFCHAIN]
        assert len(fat) <= 128, "fixture outgrew one FAT sector"
        fat += [FREESECT] * (128 - len(fat))
        directory = pad(
            dir_entry("Root Entry", 5, 1, -1, -1, 1, ENDOFCHAIN, 0)
            + dir_entry("Workbook", 2, 1, -1, -1, -1, 2, len(stream_bytes))
            + dir_entry(None, 0, 0, -1, -1, -1, 0, 0)
            + dir_entry(None, 0, 0, -1, -1, -1, 0, 0),
            sector,
        )
        body = b"".join(struct.pack("<I", f) for f in fat) + directory + data
        return header(1, 1, ENDOFCHAIN, 0, 0) + body


# ------------------------------------------------------------ fixtures

N = None
DEMO_GRID = [
    ["Marca", "Modelo", "Importador", "Propulsión", "Combustible",
     "Fecha de Homologación", "P.B.V.              (kg)", "Rendimiento", N,
     "Emisiones de CO2 (g/km)", "CO \n(g/km) Norma Europea", N],
    [N, N, N, N, N, N, N,
     "Mixto Rendimiento de Combustible (km/l)",
     "Rendimiento Eléctrico (km/kwh) Vehículo Eléctrico Puro", N, N, N],
    [N, N, N, N, N, N, N, N, N, N, N, "x"],
    ["TOYOTA", "YARIS", "Astara. Chile - SPA", "Combustión", "GASOLINA",
     "2013-01-04", "1500", "15.5", "-", "120", "0.5", N],
    ["BYD", "HAN", "Automotores  Gildemeister spa.", "Vehículo Eléctrico", "",
     "-", "-", "-", "6.1", "-", "-", N],
    ["KIA", "EV6", "Desconocido Ltda", "Vehículo Eléctrico", "",
     "2014-06-10", "2000", "-", "5.0", "-", "-", N],
]

SHEET2_GRID = [
    ["Marca", "Modelo"],
    ["HONDA", "CIVIC"],
    ["MAZDA", "3"],
]


def grid_sheet(grid):
    def register(intern):
        for row in grid:
            for v in row:
                if v is None:
                    continue
                try:
                    f = float(v)
                    if num_str(f) == v:
                        continue
                except ValueError:
                    pass
                intern(v)

    def build(sst_index):
        nrows = len(grid)
        ncols = max(len(r) for r in grid)
        return sheet_substream(cell_records(grid, sst_index), nrows, ncols)

    return register, build


def make_small():
    stream = workbook_stream([
        ("2013", *grid_sheet(DEMO_GRID)),
        ("2014", *grid_sheet(SHEET2_GRID)),
    ])
    assert len(stream) < 4096, f"small fixture stream grew to {len(stream)}"
    return cfb_container(stream)


# stress: strings long enough to force SST CONTINUE splits (tiny maxlen
# would be unrealistic; use real 8224 limit with ~200 x 100-char strings)
STRESS_STRINGS = [
    ("s%03d:" % i) + ("abcdefghij" * 10)[: 94 + (i % 7)] for i in range(200)
] + ["euro€sign—and中文"]  # uncompressed (chars >= 256)


def make_stress():
    def register(intern):
        for s in STRESS_STRINGS:
            intern(s)

    def build(sst_index):
        body = b""
        r = 0
        for s in STRESS_STRINGS:
            body += rec(0x00FD, struct.pack("<HHHi", r, 0, 0, sst_index[s]))
            r += 1
        # RK: integer, int/100, and a MULRK run + MULBLANK + BOOLERR
        body += rec(0x027E, struct.pack("<HHHi", r, 0, 0, rk_int(314159)))
        body += rec(0x027E, struct.pack("<HHHi", r, 1, 0, (rk_int(250) | 1)))  # 2.5
        body += rec(0x00BD, struct.pack("<HH", r + 1, 0)
                    + b"".join(struct.pack("<Hi", 0, rk_int(v)) for v in (7, 8, 9))
                    + struct.pack("<H", 2))
        body += rec(0x00BE, struct.pack("<HHHHH", r + 2, 0, 0, 0, 1))
        body += rec(0x0205, struct.pack("<HHHBB", r + 3, 0, 0, 1, 0))  # TRUE
        return sheet_substream(body, r + 4, 3)

    stream = workbook_stream([("stress", register, build)])
    assert len(stream) >= 4096, f"stress fixture stream only {len(stream)}"
    return cfb_container(stream)


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    small = make_small()
    stress = make_stress()
    with open(os.path.join(OUT_DIR, "fixture_3cv.xls"), "wb") as f:
        f.write(small)
    with open(os.path.join(OUT_DIR, "fixture_sst_continue.xls"), "wb") as f:
        f.write(stress)
    print(f"fixture_3cv.xls: {len(small)} bytes (ministream)")
    print(f"fixture_sst_continue.xls: {len(stress)} bytes (FAT stream)")
