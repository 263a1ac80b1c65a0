"""Minimal pure-stdlib GeoTIFF reader (ingestion source).

Reads strip-based AND tiled (COG-layout) GeoTIFFs — uncompressed,
deflate, or LZW (TIFF 6.0 early-change, codecs.lzw_decode), with the
horizontal-differencing predictor (tag 317 == 2) and the TechNote-3
floating-point predictor (tag 317 == 3, the GDAL float-DEM shape) — single-sample
uint8/uint16/int16/float32/float64, plus the geotransform from
ModelPixelScaleTag/ModelTiepointTag — enough to ingest HLS-style tiles
into the images table without rasterio (absent from this container).
Both classic (magic 42) and BigTIFF (magic 43: 8-byte offsets/counts,
20-byte IFD entries, LONG8/SLONG8 types) headers are parsed; non-TIFF
magic raises. BigTIFF is validated by a classic-vs-big cross-check —
the same pixels written both ways must decode bit-identically — plus a
hand-built byte-level header golden (javax.imageio cannot read BigTIFF,
so no external validator exists in this container).
Real HLS/S2 COGs are internally tiled (512×512 deflate), the tiled
branch here; LZW+predictor is the other combination public mirrors ship.
Replaces the reference's xr.open_mfdataset scan (hls_utils.py:89-122).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_DTYPES = {
    (8, 1): "u1",
    (16, 1): "u2",
    (16, 2): "i2",
    (32, 2): "i4",
    (32, 3): "f4",
    (64, 3): "f8",
}
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}


def read_geotiff(path: str) -> tuple[np.ndarray, tuple[float, float, float, float]]:
    """→ (array (h, w), transform (a, c, e, f)) with x = c + a·col,
    y = f + e·row at cell edges."""
    with open(path, "rb") as fh:
        return read_geotiff_bytes(fh.read())


def read_geotiff_bytes(data: bytes) -> tuple[np.ndarray, tuple[float, float, float, float]]:
    """read_geotiff over an in-memory payload (the images-table bytes
    column path — no filesystem round-trip)."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (missing II/MM byte order)")
    (magic,) = struct.unpack(bo + "H", data[2:4])
    if magic == 42:  # classic TIFF
        off = struct.unpack(bo + "I", data[4:8])[0]
        n = struct.unpack(bo + "H", data[off : off + 2])[0]
        entry0, esize = off + 2, 12
    elif magic == 43:  # BigTIFF: 8-byte offsets/counts, 20-byte entries
        osz, zero = struct.unpack(bo + "HH", data[4:8])
        if osz != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header (offset size != 8)")
        off = struct.unpack(bo + "Q", data[8:16])[0]
        n = struct.unpack(bo + "Q", data[off : off + 8])[0]
        entry0, esize = off + 8, 20
    else:
        raise ValueError(f"not a TIFF (magic {magic}, want 42/43)")

    tags: dict[int, list] = {}
    for i in range(n):
        e = data[entry0 + i * esize : entry0 + (i + 1) * esize]
        if magic == 42:
            tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
            val, inline = e[8:12], 4
        else:
            tag, typ = struct.unpack(bo + "HH", e[:4])
            (cnt,) = struct.unpack(bo + "Q", e[4:12])
            val, inline = e[12:20], 8
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= inline:
            raw = val[:size]
        else:
            p = struct.unpack(bo + ("I" if magic == 42 else "Q"), val)[0]
            raw = data[p : p + size]
        if typ == 3:
            vals = list(struct.unpack(bo + f"{cnt}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{cnt}I", raw))
        elif typ == 16:  # LONG8 (BigTIFF offsets/counts)
            vals = list(struct.unpack(bo + f"{cnt}Q", raw))
        elif typ == 17:  # SLONG8
            vals = list(struct.unpack(bo + f"{cnt}q", raw))
        elif typ == 12:
            vals = list(struct.unpack(bo + f"{cnt}d", raw))
        elif typ == 11:
            vals = list(struct.unpack(bo + f"{cnt}f", raw))
        elif typ == 2:
            vals = [raw.decode("ascii", "ignore")]
        else:
            vals = [raw]
        tags[tag] = vals

    w, h = tags[256][0], tags[257][0]
    bits = tags[258][0]
    compression = tags.get(259, [1])[0]
    sample_format = tags.get(339, [1])[0]
    if isinstance(bits, bytes):  # BitsPerSample stored per sample
        bits = bits[0]
    dtype = np.dtype(bo + _DTYPES[(bits, sample_format)])
    spp = tags.get(277, [1])[0]
    planar = tags.get(284, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"bad PlanarConfiguration {planar}")
    if planar == 2 and spp == 1:
        planar = 1  # degenerate: one plane == chunky

    predictor = tags.get(317, [1])[0]

    def _inflate(chunk: bytes) -> bytes:
        if compression == 8 or compression == 32946:  # deflate
            return zlib.decompress(chunk)
        if compression == 5:  # LZW (TIFF 6.0 early-change variant)
            from ..codecs import lzw_decode

            return lzw_decode(chunk)
        if compression == 32773:  # PackBits RLE
            from ..codecs import packbits_decode

            return packbits_decode(chunk)
        if compression != 1:
            raise NotImplementedError(f"TIFF compression {compression} unsupported")
        return chunk

    def _unpredict(block: "np.ndarray") -> "np.ndarray":
        if predictor == 2:  # horizontal differencing per row, per sample
            if not np.issubdtype(block.dtype, np.integer):
                raise NotImplementedError("predictor 2 on non-integer samples")
            block = block.copy()
            np.add.accumulate(block, axis=1, dtype=block.dtype, out=block)
        elif predictor != 1:
            raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
        return block

    def _unpredict3(chunk: bytes, nrows: int, ncols: int) -> "np.ndarray":
        """TIFF TechNote 3 floating-point predictor (GDAL PREDICTOR=3,
        the float-DEM GeoTIFF shape): per row, byte-wise horizontal
        differencing over the row's byte stream, bytes stored as
        most-significant-first PLANES; accumulate then reassemble."""
        if sample_format != 3:
            raise NotImplementedError("predictor 3 on non-float samples")
        bps = dtype.itemsize
        b = np.frombuffer(chunk, dtype=np.uint8, count=nrows * ncols * bps)
        acc = (
            np.cumsum(b.reshape(nrows, ncols * bps).astype(np.int64), axis=1)
            & 0xFF
        ).astype(np.uint8)
        planes = acc.reshape(nrows, bps, ncols)  # plane 0 = MSB
        le = np.ascontiguousarray(planes[:, ::-1, :].transpose(0, 2, 1))
        return (
            le.reshape(nrows, ncols * bps)
            .view(np.dtype("<" + _DTYPES[(bits, sample_format)]))
            .reshape(nrows, ncols)
        )

    # chunky multi-sample rows decode as (rows, w*spp); predictor 2's
    # per-sample differencing works on that layout with a reshape
    shape = (h, w) if spp == 1 else (h, w, spp)
    out = np.empty(shape, dtype=dtype)

    def _rows(chunk: bytes, nrows: int, ncols: int, spp_eff: int | None = None) -> "np.ndarray":
        sp = spp if spp_eff is None else spp_eff  # planar planes decode as 1-sample
        if predictor == 3:
            if sp != 1:
                raise NotImplementedError("predictor 3 with multiple samples")
            return _unpredict3(chunk, nrows, ncols)
        a = np.frombuffer(chunk, dtype=dtype, count=nrows * ncols * sp)
        if sp == 1:
            return _unpredict(a.reshape(nrows, ncols))
        a = a.reshape(nrows, ncols, sp)
        if predictor == 2:
            a = a.copy()
            np.add.accumulate(a, axis=1, dtype=a.dtype, out=a)
            return a
        return _unpredict(a.reshape(nrows, ncols * sp)).reshape(nrows, ncols, sp)

    if 322 in tags:  # tiled layout (cloud-optimized GeoTIFF)
        tw, th = tags[322][0], tags[323][0]
        tiles_across = (w + tw - 1) // tw
        if planar == 2:
            # PlanarConfiguration=2 (GDAL INTERLEAVE=BAND): the tile list
            # holds all of plane 0's tiles, then plane 1's, ... — each
            # plane decodes exactly like a single-sample image
            tiles_down = (h + th - 1) // th
            per_plane = tiles_across * tiles_down
            for idx, (o, c) in enumerate(zip(tags[324], tags[325])):
                plane, pidx = divmod(idx, per_plane)
                tile = _rows(_inflate(data[o : o + c]), th, tw, 1)
                ty, tx = divmod(pidx, tiles_across)
                r0, c0 = ty * th, tx * tw
                nr, nc = min(th, h - r0), min(tw, w - c0)
                out[r0 : r0 + nr, c0 : c0 + nc, plane] = tile[:nr, :nc]
        else:
            for idx, (o, c) in enumerate(zip(tags[324], tags[325])):
                tile = _rows(_inflate(data[o : o + c]), th, tw)
                ty, tx = divmod(idx, tiles_across)
                r0, c0 = ty * th, tx * tw
                nr, nc = min(th, h - r0), min(tw, w - c0)
                out[r0 : r0 + nr, c0 : c0 + nc] = tile[:nr, :nc]  # edge tiles padded
    else:  # strip layout
        rows_per_strip = tags.get(278, [h])[0]
        if planar == 2:
            strips_per_plane = (h + rows_per_strip - 1) // rows_per_strip
            for idx, (o, c) in enumerate(zip(tags[273], tags[279])):
                plane, sidx = divmod(idx, strips_per_plane)
                row = sidx * rows_per_strip
                nrows = min(rows_per_strip, h - row)
                out[row : row + nrows, :, plane] = _rows(
                    _inflate(data[o : o + c]), nrows, w, 1
                )
        else:
            row = 0
            for o, c in zip(tags[273], tags[279]):
                nrows = min(rows_per_strip, h - row)
                out[row : row + nrows] = _rows(_inflate(data[o : o + c]), nrows, w)
                row += nrows
    # geotransform
    sx, sy, _ = tags.get(33550, [1.0, 1.0, 0.0])
    tie = tags.get(33922, [0.0] * 6)
    i, j, _k, x, y, _z = tie[:6]
    a, e = float(sx), -float(sy)
    c = float(x) - a * float(i)
    f = float(y) - e * float(j)
    return out, (a, c, e, f)
