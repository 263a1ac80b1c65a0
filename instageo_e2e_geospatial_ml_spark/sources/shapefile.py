"""ESRI Shapefile (.shp) + dBase (.dbf) reader/writer — the vector-GIS
interchange format every geospatial stack must ingest (the reference
ecosystem reads it through geopandas/fiona; here it is a first-class
byte-level source, no GDAL).

Format facts (ESRI Shapefile Technical Description, 1998 — public):
  * .shp = 100-byte header (big-endian file code 9994 + length in
    16-bit words, little-endian version 1000 + shape type + bbox
    doubles), then records: big-endian (record number, content length
    in words) + little-endian shape payload.
  * Shape types implemented: 1 Point (two doubles), 3 PolyLine and
    5 Polygon (bbox + part index array + packed point doubles);
    0 Null.
  * .dbf = dBase III: 32-byte header (version 0x03, record count,
    header/record sizes), 32-byte field descriptors (name, type
    C/N, length), 0x0D terminator, then fixed-width ASCII records
    each starting with a deletion flag byte.

Both directions ship: the writer builds fixtures AND exports; the
parser is validated on a HAND-BUILT byte golden (spec-derived,
independent of the writer — the TIFF-LZW lesson) plus writer
round-trips, and the q193 driver query pins an exact closed-form
oracle through real bytes.

Coordinates are IEEE doubles in the file; the reader surfaces them
verbatim. Integer-quantized workflows (the engine's exactness rules)
quantize at the query layer.
"""

from __future__ import annotations

import struct


def write_shp(shapes: list) -> bytes:
    """shapes = list of ("point", (x, y)) | ("polygon"|"polyline",
    [[(x, y), ...], ...] rings/parts) | ("null",). Returns .shp bytes."""
    type_codes = {"null": 0, "point": 1, "polyline": 3, "polygon": 5}
    recs = []
    all_pts = []
    main_type = 0
    for i, s in enumerate(shapes, start=1):
        kind = s[0]
        code = type_codes[kind]
        if code:
            main_type = code
        if kind == "null":
            content = struct.pack("<i", 0)
        elif kind == "point":
            x, y = s[1]
            content = struct.pack("<idd", 1, float(x), float(y))
            all_pts.append((x, y))
        else:
            parts = s[1]
            pts = [p for part in parts for p in part]
            all_pts.extend(pts)
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            offs = []
            acc = 0
            for part in parts:
                offs.append(acc)
                acc += len(part)
            content = struct.pack(
                "<idddd", code, min(xs), min(ys), max(xs), max(ys)
            )
            content += struct.pack("<ii", len(parts), len(pts))
            content += struct.pack(f"<{len(parts)}i", *offs)
            for x, y in pts:
                content += struct.pack("<dd", float(x), float(y))
        recs.append(
            struct.pack(">ii", i, len(content) // 2) + content
        )
    body = b"".join(recs)
    if all_pts:
        xs = [p[0] for p in all_pts]
        ys = [p[1] for p in all_pts]
        bbox = (min(xs), min(ys), max(xs), max(ys))
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)
    total_words = (100 + len(body)) // 2
    header = struct.pack(">i", 9994) + b"\x00" * 20
    header += struct.pack(">i", total_words)
    header += struct.pack("<ii", 1000, main_type)
    header += struct.pack("<4d", *[float(v) for v in bbox])
    header += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # Z/M ranges
    return header + body


def read_shp(buf: bytes) -> list:
    """Inverse of write_shp: returns [(rec_no, kind, points, parts)]
    where points = [(x, y), ...] flat and parts = part start offsets
    (empty for point/null)."""
    if struct.unpack(">i", buf[:4])[0] != 9994:
        raise ValueError("not a shapefile (bad file code)")
    (total_words,) = struct.unpack(">i", buf[24:28])
    version, _main = struct.unpack("<ii", buf[28:36])
    if version != 1000:
        raise ValueError(f"unsupported shapefile version {version}")
    out = []
    pos = 100
    end = min(len(buf), total_words * 2)
    while pos + 8 <= end:
        rec_no, clen = struct.unpack(">ii", buf[pos : pos + 8])
        pos += 8
        content = buf[pos : pos + clen * 2]
        pos += clen * 2
        (code,) = struct.unpack("<i", content[:4])
        if code == 0:
            out.append((rec_no, "null", [], []))
        elif code == 1:
            x, y = struct.unpack("<dd", content[4:20])
            out.append((rec_no, "point", [(x, y)], []))
        elif code in (3, 5):
            n_parts, n_pts = struct.unpack("<ii", content[36:44])
            offs = list(
                struct.unpack(f"<{n_parts}i", content[44 : 44 + 4 * n_parts])
            )
            p0 = 44 + 4 * n_parts
            flat = struct.unpack(
                f"<{2 * n_pts}d", content[p0 : p0 + 16 * n_pts]
            )
            pts = [
                (flat[2 * i], flat[2 * i + 1]) for i in range(n_pts)
            ]
            kind = "polyline" if code == 3 else "polygon"
            out.append((rec_no, kind, pts, offs))
        else:
            raise ValueError(f"unsupported shape type {code}")
    return out


def write_dbf(fields: list, rows: list) -> bytes:
    """fields = [(name, 'C'|'N', length)]; rows = list of value tuples.
    Returns dBase III bytes (ASCII, no memo)."""
    n = len(rows)
    rec_len = 1 + sum(f[2] for f in fields)
    hdr_len = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack(
        "<BBBBIHH", 0x03, 24, 1, 1, n, hdr_len, rec_len
    )
    out += b"\x00" * 20
    for name, typ, length in fields:
        nb = name.encode("ascii")[:10]
        out += nb + b"\x00" * (11 - len(nb))
        out += typ.encode("ascii")
        out += b"\x00" * 4
        out += struct.pack("<BB", length, 0)
        out += b"\x00" * 14
    out += b"\x0d"
    for row in rows:
        out += b" "  # not deleted
        for (name, typ, length), val in zip(fields, row):
            if typ == "N":
                s = str(int(val)).rjust(length)
            else:
                s = str(val).ljust(length)
            if len(s) > length:
                raise ValueError(f"value {val!r} exceeds field {name}")
            out += s.encode("ascii")
    out += b"\x1a"
    return bytes(out)


def read_dbf(buf: bytes) -> tuple[list, list]:
    """Returns (fields, rows): fields = [(name, type, length)], rows =
    list of tuples (N fields as int, C fields as stripped str).
    Deleted records (flag 0x2A) are skipped."""
    ver, = struct.unpack("<B", buf[:1])
    if ver & 0x07 != 0x03:
        raise ValueError(f"unsupported dBase version 0x{ver:02x}")
    n, hdr_len, rec_len = struct.unpack("<IHH", buf[4:12])
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        name = buf[pos : pos + 11].split(b"\x00")[0].decode("ascii")
        typ = chr(buf[pos + 11])
        length = buf[pos + 16]
        fields.append((name, typ, length))
        pos += 32
    rows = []
    pos = hdr_len
    for _ in range(n):
        rec = buf[pos : pos + rec_len]
        pos += rec_len
        if not rec or rec[0] == 0x2A:
            continue
        vals = []
        off = 1
        for name, typ, length in fields:
            raw = rec[off : off + length].decode("ascii")
            off += length
            vals.append(
                int(raw) if typ == "N" else raw.rstrip()
            )
        rows.append(tuple(vals))
    return fields, rows
