"""VP8L (lossless WebP) decoder: bit-exact interop vs the system libwebp.

libwebp.so plays the independent-validator role javax.imageio plays for
the JPEG/PNG codecs: fixtures are encoded by libwebp's own lossless
encoder and must decode bit-identically; hand-built conformance probe
streams (one backward reference per chosen distance code) are decoded by
BOTH libwebp and this decoder to pin the 120-entry 2D distance map.
"""

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from instageo_e2e_geospatial_ml_spark.webp import (
    _DIST_MAP,
    vp8l_decode_stream,
    webp_decode,
)


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        return lib
    return None


_LIB = _load_libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None, reason="libwebp not available")


def _encode_lossless(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    out = ctypes.c_void_p()
    n = _LIB.WebPEncodeLosslessRGBA(
        np.ascontiguousarray(arr).tobytes(), w, h, w * 4, ctypes.byref(out)
    )
    assert n > 0, "libwebp encode failed"
    buf = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return buf


def _libwebp_decode(buf: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(buf, len(buf), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp decode failed"
    arr = (
        np.frombuffer(
            ctypes.string_at(p, w.value * h.value * 4), dtype=np.uint8
        )
        .reshape(h.value, w.value, 4)
        .copy()
    )
    _LIB.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return arr


def _fixtures():
    """One fixture per lossless feature family (what the libwebp encoder
    picks for each content type): predictor transform (gradient), literal
    entropy (noise), color indexing at every pixel-bundling width (2/4/16
    colors), cross-color (photo-like), and the meta-prefix entropy image
    (large mixed-content)."""
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:40, 0:56]
    grad = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256, np.full_like(xx, 255)],
        -1,
    ).astype(np.uint8)
    noise = rng.integers(0, 256, (17, 23, 4), dtype=np.uint8)
    noise[..., 3] = np.maximum(noise[..., 3], 1)  # libwebp may zero RGB of a=0
    pal = np.array(
        [[255, 0, 0, 255], [0, 255, 0, 255], [0, 0, 255, 128], [9, 9, 9, 255]],
        dtype=np.uint8,
    )
    pal16 = rng.integers(1, 255, (16, 4), dtype=np.uint8)
    base = (128 + 60 * np.sin(xx / 9) + 40 * np.cos(yy / 5)).astype(np.uint8)
    photo = np.stack(
        [
            base,
            (base * 0.8 + 20).astype(np.uint8),
            (base * 0.5 + 10).astype(np.uint8),
            np.full_like(base, 255),
        ],
        -1,
    )
    photo = (
        (photo.astype(np.int16) + rng.integers(-6, 7, photo.shape))
        .clip(0, 255)
        .astype(np.uint8)
    )
    photo[..., 3] = 255
    yy2, xx2 = np.mgrid[0:300, 0:400]
    big = np.stack(
        [
            (xx2 // 16 * 31) % 256,
            rng.integers(0, 256, (300, 400)),
            (yy2 * 3) % 256,
            np.full_like(xx2, 255),
        ],
        -1,
    ).astype(np.uint8)
    big[:150, :200] = pal16[rng.integers(0, 16, (150, 200))]
    return {
        "gradient": grad,
        "noise": noise,
        "palette2": pal[:2][rng.integers(0, 2, (25, 50))],
        "palette4": pal[rng.integers(0, 4, (30, 33))],
        "palette16": pal16[rng.integers(0, 16, (33, 61))],
        "flat": np.full((16, 16, 4), 77, np.uint8),
        "photo": photo,
        "odd_width": pal16[rng.integers(0, 16, (11, 257))],
        "big_mixed_meta": big,
    }


@needs_libwebp
def test_vp8l_interop_bit_exact_vs_libwebp():
    for name, img in _fixtures().items():
        buf = _encode_lossless(img)
        ref = _libwebp_decode(buf)
        assert (ref == img).all(), f"{name}: libwebp round-trip broke"
        got = webp_decode(buf)
        assert got.shape == ref.shape, name
        assert (got == ref).all(), f"{name}: decoder mismatch vs libwebp"


# --- hand-built conformance probes -----------------------------------------


class _BW:
    """LSB-first bit writer (prefix-code bits written MSB-first)."""

    def __init__(self):
        self.bits = []

    def w(self, val, n):
        for i in range(n):
            self.bits.append((val >> i) & 1)

    def code(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def tobytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _dist_sym_extra(v):
    x = v - 1
    if x < 4:
        return x, 0, 0
    msb = x.bit_length() - 1
    extra = msb - 1
    if x < (3 << extra):
        return 2 * extra + 2, x - (2 << extra), extra
    return 2 * extra + 3, x - (3 << extra), extra


def _probe_stream(width, height, dist_code):
    """A minimal VP8L stream: 255 distinct-green literals then ONE length-1
    backward reference with the given distance code. The copied pixel's
    green value reveals the decoded distance."""
    assert width * height == 256
    bw = _BW()
    bw.w(0x2F, 8)
    bw.w(width - 1, 14)
    bw.w(height - 1, 14)
    bw.w(0, 1)
    bw.w(0, 3)
    bw.w(0, 1)  # no transform
    bw.w(0, 1)  # no color cache
    bw.w(0, 1)  # no meta prefix codes
    # green: 256 length-8 codes (symbols 0..254 and 256) via the CL path
    bw.w(0, 1)  # not simple
    bw.w(8, 4)  # 12 code-length codes
    for sym in (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8):
        bw.w(1 if sym in (0, 8) else 0, 3)
    bw.w(1, 1)  # explicit symbol count
    bw.w(7, 3)  # 16-bit count field
    bw.w(255, 16)  # 2 + 255 = 257 length symbols follow
    for _ in range(255):
        bw.code(1, 1)  # CL symbol 8 (code 1)
    bw.code(0, 1)  # CL symbol 0 for green symbol 255
    bw.code(1, 1)  # CL symbol 8 for green symbol 256
    for _ in range(3):  # red/blue/alpha: single-symbol 0 → zero bits/pixel
        bw.w(1, 1)
        bw.w(0, 1)
        bw.w(0, 1)
        bw.w(0, 1)
    dsym, dext, dn = _dist_sym_extra(dist_code)
    other = dsym + 1 if dsym < 39 else dsym - 1
    bw.w(1, 1)  # distance: simple 2-symbol
    bw.w(1, 1)
    bw.w(1, 1)
    bw.w(dsym, 8)
    bw.w(other, 8)
    for i in range(255):
        bw.code(i, 8)  # literal: green = i (canonical rank = symbol)
    bw.code(255, 8)  # green symbol 256 → length code 0 → length 1
    bw.code(0 if dsym < other else 1, 1)  # canonical: smaller symbol = 0
    if dn:
        bw.w(dext, dn)
    data = bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_distance_map_conformance_probes():
    """Every distance code decodes to the pinned (dx, dy); when libwebp is
    present each probe is ALSO pushed through WebPDecodeRGBA and must
    agree — the empirical derivation of the table, kept as a test."""
    check_lib = _LIB is not None
    for dcode in list(range(1, 121, 7)) + [1, 2, 97, 102, 119, 120]:
        dists = {}
        for w, h in ((16, 16), (8, 32)):
            buf = _probe_stream(w, h, dcode)
            got = webp_decode(buf).reshape(-1, 4)
            dists[w] = 255 - int(got[255][1])
            if check_lib:
                ref = _libwebp_decode(buf)
                assert (ref.reshape(-1, 4) == got).all(), (dcode, w)
        dx, dy = _DIST_MAP[dcode - 1]
        for w in (16, 8):
            assert dists[w] == max(1, dy * w + dx), (dcode, w)


def test_webp_container_errors():
    with pytest.raises(ValueError, match="RIFF"):
        webp_decode(b"NOPE" + b"\x00" * 30)
    # a VP8 (lossy) chunk now dispatches to the real vp8.py decoder
    # (round 5); a truncated/garbage one raises its frame validation
    lossy = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(ValueError, match="truncated"):
        webp_decode(lossy)
    with pytest.raises(ValueError, match="signature"):
        vp8l_decode_stream(b"\x00\x00\x00\x00")


def test_decode_external_webp_wired():
    from instageo_e2e_geospatial_ml_spark.sources.images import decode_external

    buf = _probe_stream(16, 16, 1)
    arr = decode_external("webp", buf)
    assert arr.shape == (4, 16, 16)
    # literals were green-ramp pixels: green channel of pixel i is i
    assert arr[1].ravel()[100] == 100
