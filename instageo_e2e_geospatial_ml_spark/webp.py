"""Pure-Python/numpy VP8L (lossless WebP) decoder.

Public surface:
  * webp_decode(buf) -> np.ndarray (h, w, 4) uint8 RGBA — decodes a RIFF
    WebP container whose image stream is lossless (a VP8L chunk, directly
    or inside a VP8X extended container).
  * vp8l_decode_stream(data, ...) — the raw VP8L bitstream decoder.

Written from the public WebP lossless bitstream specification (RFC 9649).
The container's system libwebp.so is used ONLY as the independent interop
validator in tests (the role javax.imageio plays for the JPEG/PNG codecs
here) — no reference code, and the production path never loads it.

Covers the full lossless feature set: all four transforms (predictor /
cross-color / subtract-green / color-indexing with pixel bundling),
meta-prefix-code partitioning (the entropy image), color cache, LZ77
backward references with the 120-entry 2D distance neighborhood, and both
prefix-code encodings (simple and code-length-coded).

Scale role: QA/thumbnail-scale decode inside Arrow batches. The LZ77 +
prefix-decode loop is per-symbol Python (like the PNG Paeth path) — the
documented trade; a native decoder plugs into the same codecs dispatch.
Lossy VP8 key frames decode for real too (vp8.py, round 5 — bit-exact at
the YUV level vs the system libwebp); webp_decode dispatches both chunk
types.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit reader (LSB-first, like DEFLATE/GIF)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return v


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


class _Huff:
    """Canonical prefix code (DEFLATE-style assignment; codes are matched
    by reading bits MSB-first). A single-symbol code consumes 0 bits."""

    __slots__ = ("single", "table")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = None
            return
        self.single = None
        max_len = max(ln for _, ln in nz)
        # Kraft equality — libwebp rejects over/under-subscribed codes
        kraft = sum(1 << (max_len - ln) for _, ln in nz)
        if kraft != (1 << max_len):
            raise ValueError("VP8L: invalid (incomplete) prefix code")
        bl_count = [0] * (max_len + 1)
        for _, ln in nz:
            bl_count[ln] += 1
        next_code = [0] * (max_len + 2)
        code = 0
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        table: dict[tuple[int, int], int] = {}
        for s, ln in nz:  # nz is in ascending symbol order
            table[(ln, next_code[ln])] = s
            next_code[ln] += 1
        self.table = table

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        tbl = self.table
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = tbl.get((ln, code))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("VP8L: prefix code read overflow")


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Huff:
    if br.read(1):  # simple code: 1 or 2 symbols
        num_symbols = br.read(1) + 1
        first_8 = br.read(1)
        s0 = br.read(8 if first_8 else 1)
        lengths = [0] * alphabet_size
        if s0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise ValueError("VP8L: simple-code symbol out of range")
            lengths[s1] = 1
        return _Huff(lengths)
    # code-length-coded lengths
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = _Huff(cl_lengths)
    lengths = [0] * alphabet_size
    if br.read(1):  # explicit count of length symbols that follow
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = cl.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym != 0:
                prev_len = sym
        else:
            if sym == 16:
                rep, fill = 3 + br.read(2), prev_len
            elif sym == 17:
                rep, fill = 3 + br.read(3), 0
            else:
                rep, fill = 11 + br.read(7), 0
            if i + rep > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflows alphabet")
            if fill:
                for j in range(i, i + rep):
                    lengths[j] = fill
            i += rep
    return _Huff(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------


def _prefix_value(br: _Bits, code: int) -> int:
    """Length/distance prefix coding: 4 direct codes then exponential
    ranges with (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# the 120-entry 2D neighborhood: dy ∈ [0, 7], dx ∈ [-7, 8] (dy == 0 ⇒
# dx ≥ 1), ordered by (dx² + dy², |dx|, dx < 0). The full mapping was
# derived empirically — hand-built single-backref probe streams decoded
# through the system libwebp for every code 1..120 at two image widths —
# and the conformance test re-derives a sample the same way.
def _make_distance_map() -> list[tuple[int, int]]:
    cands = []
    for dy in range(0, 8):
        for dx in range(-7, 9):
            if dy == 0 and dx < 1:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(cands) == 120
    return cands


_DIST_MAP = _make_distance_map()


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _s8(x):
    """uint8 → int8 view (numpy arrays or Python ints)."""
    return ((x & 0xFF) ^ 0x80) - 0x80


class _SubtractGreen:
    def inverse(self, pix: np.ndarray) -> np.ndarray:
        g = (pix >> 8) & 0xFF
        r = ((pix >> 16) + g) & 0xFF
        b = (pix + g) & 0xFF
        return (pix & 0xFF00FF00) | (r << 16) | b


class _ColorTransform:
    def __init__(self, bits: int, tiles: np.ndarray) -> None:
        self.bits = bits
        self.tiles = tiles

    def inverse(self, pix: np.ndarray) -> np.ndarray:
        h, w = pix.shape
        b = self.bits
        t = self.tiles[
            np.arange(h)[:, None] >> b, np.arange(w)[None, :] >> b
        ]
        g2r = _s8(t).astype(np.int64)
        g2b = _s8(t >> 8).astype(np.int64)
        r2b = _s8(t >> 16).astype(np.int64)
        g = _s8((pix >> 8).astype(np.int64))
        r = ((pix >> 16) & 0xFF).astype(np.int64)
        bl = (pix & 0xFF).astype(np.int64)
        r = (r + ((g2r * g) >> 5)) & 0xFF
        bl = (bl + ((g2b * g) >> 5) + ((r2b * _s8(r)) >> 5)) & 0xFF
        return (pix & np.uint32(0xFF00FF00)) | (r << 16).astype(np.uint32) | bl.astype(np.uint32)


def _avg2(a: int, b: int) -> int:
    # per-channel (x + y) >> 1 without inter-channel carries
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_add_sub_half(ave: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        a = (ave >> sh) & 0xFF
        d = a - ((c >> sh) & 0xFF)
        # C-style truncation toward zero for the /2
        v = a + (abs(d) >> 1) * (1 if d >= 0 else -1)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _select(left: int, top: int, top_left: int) -> int:
    pl = pt = 0
    for sh in (0, 8, 16, 24):
        tl = (top_left >> sh) & 0xFF
        pl += abs(((left >> sh) & 0xFF) - tl)
        pt += abs(((top >> sh) & 0xFF) - tl)
    # p = L + T - TL; |p-T| per channel == |L-TL|, |p-L| == |T-TL|
    return top if pl <= pt else left


class _PredictorTransform:
    def __init__(self, bits: int, tiles: np.ndarray) -> None:
        self.bits = bits
        self.tiles = tiles

    def inverse(self, pix: np.ndarray) -> np.ndarray:
        h, w = pix.shape
        b = self.bits
        p = pix.ravel().tolist()  # Python ints: per-pixel loop path
        modes = ((self.tiles >> 8) & 0xFF).tolist()
        for y in range(h):
            row = y * w
            trow = modes[y >> b]
            for x in range(w):
                i = row + x
                if y == 0:
                    pred = 0xFF000000 if x == 0 else p[i - 1]
                elif x == 0:
                    pred = p[i - w]
                else:
                    m = trow[x >> b]
                    L = p[i - 1]
                    T = p[i - w]
                    if m == 0:
                        pred = 0xFF000000
                    elif m == 1:
                        pred = L
                    elif m == 2:
                        pred = T
                    elif m == 3:
                        pred = p[i - w + 1]
                    elif m == 4:
                        pred = p[i - w - 1]
                    elif m == 5:
                        pred = _avg2(_avg2(L, p[i - w + 1]), T)
                    elif m == 6:
                        pred = _avg2(L, p[i - w - 1])
                    elif m == 7:
                        pred = _avg2(L, T)
                    elif m == 8:
                        pred = _avg2(p[i - w - 1], T)
                    elif m == 9:
                        pred = _avg2(T, p[i - w + 1])
                    elif m == 10:
                        pred = _avg2(
                            _avg2(L, p[i - w - 1]), _avg2(T, p[i - w + 1])
                        )
                    elif m == 11:
                        pred = _select(L, T, p[i - w - 1])
                    elif m == 12:
                        pred = _clamp_add_sub_full(L, T, p[i - w - 1])
                    elif m == 13:
                        pred = _clamp_add_sub_half(_avg2(L, T), p[i - w - 1])
                    else:
                        raise ValueError(f"VP8L: bad predictor mode {m}")
                # per-channel modular add of residual + prediction (SWAR:
                # low-7-bit add carries nothing across bytes, then xor in
                # the independent top bits)
                v = p[i]
                p[i] = (
                    (v & 0x7F7F7F7F) + (pred & 0x7F7F7F7F)
                ) ^ ((v ^ pred) & 0x80808080)
        return np.asarray(p, dtype=np.uint32).reshape(h, w)


class _ColorIndexing:
    def __init__(self, palette: np.ndarray, width_bits: int, orig_w: int) -> None:
        self.palette = palette
        self.width_bits = width_bits
        self.orig_w = orig_w

    def inverse(self, pix: np.ndarray) -> np.ndarray:
        h = pix.shape[0]
        n = len(self.palette)
        if self.width_bits == 0:
            idx = (pix >> 8) & 0xFF
        else:
            per = 1 << self.width_bits
            bits = 8 >> self.width_bits
            g = ((pix >> 8) & 0xFF).astype(np.uint32)
            # unbundle LSB-first: first pixel of the pack in the low bits
            parts = [
                (g >> (k * bits)) & ((1 << bits) - 1) for k in range(per)
            ]
            idx = np.stack(parts, axis=-1).reshape(h, -1)[:, : self.orig_w]
        safe = np.minimum(idx, n - 1)
        out = self.palette[safe]
        return np.where(idx < n, out, np.uint32(0))


# ---------------------------------------------------------------------------
# image stream decoding
# ---------------------------------------------------------------------------

_NUM_LENGTH_CODES = 24
_HASH_MUL = 0x1E35A7BD


class _Group:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, br: _Bits, cache_bits: int) -> None:
        cache_size = (1 << cache_bits) if cache_bits else 0
        self.green = _read_prefix_code(br, 256 + _NUM_LENGTH_CODES + cache_size)
        self.red = _read_prefix_code(br, 256)
        self.blue = _read_prefix_code(br, 256)
        self.alpha = _read_prefix_code(br, 256)
        self.dist = _read_prefix_code(br, 40)


def _read_transform(br: _Bits, ttype: int, w: int, h: int):
    """Returns (transform, new_width)."""
    if ttype == 0:  # predictor
        bits = br.read(3) + 2
        tiles = _decode_image_stream(br, _sub_size(w, bits), _sub_size(h, bits), False)
        return _PredictorTransform(bits, tiles), w
    if ttype == 1:  # cross-color
        bits = br.read(3) + 2
        tiles = _decode_image_stream(br, _sub_size(w, bits), _sub_size(h, bits), False)
        return _ColorTransform(bits, tiles), w
    if ttype == 2:  # subtract green
        return _SubtractGreen(), w
    if ttype == 3:  # color indexing
        n_colors = br.read(8) + 1
        width_bits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else 1 if n_colors <= 16 else 0
        pal_img = _decode_image_stream(br, n_colors, 1, False)[0]
        # palette entries are delta-coded per channel
        a = np.cumsum((pal_img >> 24) & 0xFF, dtype=np.uint64) & 0xFF
        r = np.cumsum((pal_img >> 16) & 0xFF, dtype=np.uint64) & 0xFF
        g = np.cumsum((pal_img >> 8) & 0xFF, dtype=np.uint64) & 0xFF
        b = np.cumsum(pal_img & 0xFF, dtype=np.uint64) & 0xFF
        palette = ((a << 24) | (r << 16) | (g << 8) | b).astype(np.uint32)
        return (
            _ColorIndexing(palette, width_bits, w),
            _sub_size(w, width_bits),
        )
    raise ValueError(f"VP8L: unknown transform {ttype}")


def _decode_image_stream(br: _Bits, w: int, h: int, is_level0: bool) -> np.ndarray:
    transforms = []
    cur_w = w
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(ttype)
            t, cur_w = _read_transform(br, ttype, cur_w, h)
            transforms.append(t)

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color-cache size")

    huff_image = None
    huff_bits = 0
    num_groups = 1
    if is_level0 and br.read(1):  # meta prefix codes (entropy image)
        huff_bits = br.read(3) + 2
        himg = _decode_image_stream(
            br, _sub_size(cur_w, huff_bits), _sub_size(h, huff_bits), False
        )
        huff_image = ((himg >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(huff_image.max()) + 1

    groups = [_Group(br, cache_bits) for _ in range(num_groups)]
    pix = _decode_pixels(br, cur_w, h, groups, huff_image, huff_bits, cache_bits)
    for t in reversed(transforms):
        pix = t.inverse(pix)
    return pix


def _decode_pixels(
    br: _Bits,
    w: int,
    h: int,
    groups: list[_Group],
    huff_image,
    huff_bits: int,
    cache_bits: int,
) -> np.ndarray:
    n = w * h
    out = [0] * n
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    gid_rows = None
    if huff_image is not None:
        gid_rows = huff_image.tolist()
    g = groups[0]
    pos = 0
    last_gx = -1
    while pos < n:
        x = pos - (pos // w) * w
        if gid_rows is not None:
            gx = x >> huff_bits
            if gx != last_gx or x == 0:
                g = groups[gid_rows[(pos // w) >> huff_bits][gx]]
                last_gx = gx
        s = g.green.read(br)
        if s < 256:
            r = g.red.read(br)
            b = g.blue.read(br)
            a = g.alpha.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> cache_shift] = px
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _prefix_value(br, s - 256)
            dcode = _prefix_value(br, g.dist.read(br))
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            if cache is not None:
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    pos += 1
                    cache[(_HASH_MUL * px & 0xFFFFFFFF) >> cache_shift] = px
            else:
                for _ in range(length):
                    out[pos] = out[pos - dist]
                    pos += 1
            last_gx = -1  # group may change mid-copy; re-resolve
        else:
            out[pos] = cache[s - 256 - _NUM_LENGTH_CODES]
            pos += 1
    return np.asarray(out, dtype=np.uint32).reshape(h, w)


# ---------------------------------------------------------------------------
# container + entry points
# ---------------------------------------------------------------------------


def vp8l_decode_stream(data: bytes) -> np.ndarray:
    """Decode a raw VP8L bitstream (the bytes of a 'VP8L' chunk) →
    (h, w, 4) uint8 RGBA."""
    br = _Bits(data)
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    argb = _decode_image_stream(br, w, h, True)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (argb >> 16) & 0xFF
    out[..., 1] = (argb >> 8) & 0xFF
    out[..., 2] = argb & 0xFF
    out[..., 3] = argb >> 24
    return out


def _decode_still_chunk(tag: bytes, body: bytes) -> np.ndarray:
    """One VP8/VP8L image chunk → (h, w, 4) RGBA."""
    if tag == b"VP8L":
        return vp8l_decode_stream(body)
    from .vp8 import vp8_decode_rgb

    rgb = vp8_decode_rgb(body)
    out = np.empty((*rgb.shape[:2], 4), np.uint8)
    out[..., :3] = rgb
    out[..., 3] = 255
    return out


def webp_decode(buf: bytes) -> np.ndarray:
    """Decode a WebP container → (h, w, 4) uint8 RGBA. Lossless (VP8L)
    decodes bit-exactly; lossy (VP8 key frame) decodes via vp8.py —
    bit-exact YUV, with the documented non-normative RGB conversion.
    Animated (VP8X/ANMF) containers return the FIRST composited frame;
    use webp_decode_frames for the full sequence."""
    if len(buf) < 20 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF) container")
    pos = 12
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if tag in (b"VP8L", b"VP8 "):
            return _decode_still_chunk(tag, body)
        if tag == b"ANMF":
            return webp_decode_frames(buf)[0]
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container holds no VP8L/VP8/ANMF chunk")


def _u24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def webp_decode_frames(buf: bytes) -> np.ndarray:
    """Decode a WebP container into (n_frames, canvas_h, canvas_w, 4)
    uint8 RGBA composited canvases.

    Animated containers (VP8X animation flag + ANIM + ANMF chunks, WebP
    container spec / RFC 9649 §2.5): every ANMF frame is an independently
    coded key image (VP8 intra or VP8L — WebP animation has no
    inter-frame coding, so the existing keyframe decoders cover it),
    placed at its (2·X, 2·Y) offset and composited like the GIF path:
    blending method 0 alpha-blends over the canvas, 1 overwrites the
    rect; disposal 1 fills the rect with the ANIM background color after
    the frame is emitted. ALPH chunks (separate alpha plane for lossy
    frames) are skipped — the frame decodes opaque; lossless frames
    carry alpha in-stream and keep it.

    Still images return a single-frame stack."""
    if len(buf) < 20 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF) container")
    pos = 12
    canvas_w = canvas_h = None
    bg = np.zeros(4, np.uint8)
    anmf: list[bytes] = []
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if tag == b"VP8X":
            canvas_w = _u24(body, 4) + 1
            canvas_h = _u24(body, 7) + 1
        elif tag == b"ANIM":
            b_, g_, r_, a_ = body[0], body[1], body[2], body[3]  # BGRA
            bg = np.array([r_, g_, b_, a_], np.uint8)
        elif tag == b"ANMF":
            anmf.append(body)
        elif tag in (b"VP8 ", b"VP8L") and not anmf:
            return _decode_still_chunk(tag, body)[None, ...]
        pos += 8 + size + (size & 1)
    if not anmf:
        raise ValueError("WebP container holds no VP8L/VP8/ANMF chunk")
    if canvas_w is None:
        raise ValueError("animated WebP without VP8X canvas dims")

    canvas = np.tile(bg, (canvas_h, canvas_w, 1))
    frames = []
    for body in anmf:
        fx, fy = 2 * _u24(body, 0), 2 * _u24(body, 3)
        fw, fh = _u24(body, 6) + 1, _u24(body, 9) + 1
        flags = body[15]
        blend_overwrite = bool(flags & 0x02)
        dispose_bg = bool(flags & 0x01)
        # frame payload: optional ALPH, then one VP8/VP8L chunk
        fpos, img = 16, None
        while fpos + 8 <= len(body):
            ftag = body[fpos : fpos + 4]
            (fsize,) = struct.unpack("<I", body[fpos + 4 : fpos + 8])
            fbody = body[fpos + 8 : fpos + 8 + fsize]
            if ftag in (b"VP8 ", b"VP8L"):
                img = _decode_still_chunk(ftag, fbody)
                break
            fpos += 8 + fsize + (fsize & 1)
        if img is None:
            raise ValueError("ANMF frame without VP8/VP8L data")
        if img.shape[:2] != (fh, fw):
            raise ValueError("ANMF frame dims disagree with its image data")
        y1, x1 = min(fy + fh, canvas_h), min(fx + fw, canvas_w)
        sub = img[: y1 - fy, : x1 - fx].astype(np.uint16)
        tgt = canvas[fy:y1, fx:x1]
        if blend_overwrite:
            tgt[:] = sub.astype(np.uint8)
        else:
            # spec "over" compositing (container spec §Animation):
            #   A' = sa + da·(1−sa);  rgb' = (s·sa + d·da·(1−sa)) / A'
            sa = sub[..., 3:4].astype(np.float64) / 255.0
            da = tgt[..., 3:4].astype(np.float64) / 255.0
            oa = sa + da * (1.0 - sa)
            num = sub[..., :3] * sa + tgt[..., :3].astype(np.float64) * da * (1.0 - sa)
            with np.errstate(invalid="ignore"):
                rgb = np.where(oa > 0, num / np.maximum(oa, 1e-12), 0.0)
            tgt[..., :3] = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
            tgt[..., 3] = np.clip(np.rint(oa[..., 0] * 255.0), 0, 255).astype(np.uint8)
        frames.append(canvas.copy())
        if dispose_bg:
            canvas[fy:y1, fx:x1] = bg
    return np.stack(frames)
