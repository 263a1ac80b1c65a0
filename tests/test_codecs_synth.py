"""Codec round-trip, PSNR, phash determinism, grid index, and tile-bounds tests."""

import numpy as np

from instageo_e2e_geospatial_ml_spark import codecs, grid, synth
from instageo_e2e_geospatial_ml_spark.mgrs import mgrs_precision0, mgrs_tile_bounds


def _img(bands=3, h=96, w=80, seed=7):
    rng = np.random.default_rng(seed)
    return np.clip(rng.normal(5000, 2000, (bands, h, w)), 0, 10000).astype(np.uint16)


def test_raw_roundtrip():
    a = _img()
    assert np.array_equal(codecs.decode(codecs.encode(a, "raw"), 80, 96, 3, "raw"), a)


def test_png_roundtrip():
    a = _img()
    buf = codecs.encode(a, "png")
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(codecs.decode(buf, 80, 96, 3, "png"), a)


def test_qdct_psnr_above_40():
    a = _img()
    buf = codecs.encode(a, "qdct")
    b = codecs.decode(buf, 80, 96, 3, "qdct")
    p = codecs.psnr(a, b)
    assert p >= 40.0, p
    assert not np.array_equal(a, b)  # genuinely lossy


def test_phash_deterministic_and_robust():
    a = _img(1, 224, 224)
    h1 = codecs.phash64(a)
    h2 = codecs.phash64(a.copy())
    assert h1 == h2
    # qdct-compressed version should have a close hash (hamming < 10)
    b = codecs.decode(codecs.encode(a, "qdct"), 224, 224, 1, "qdct")
    hb = codecs.phash64(b)
    assert bin((h1 ^ hb) & (2**64 - 1)).count("1") < 10


def test_grid_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    lon = rng.uniform(-179.9, 179.9, 1000)
    lat = rng.uniform(-89.9, 89.9, 1000)
    for res in (3, 8, 12):
        c = grid.cell_encode(lon, lat, res)
        r, cx, cy = grid.cell_decode(c)
        assert (r == res).all()
        lon_min, lat_min, lon_max, lat_max = grid.cell_bounds(c)
        assert ((lon >= lon_min) & (lon < lon_max)).all()
        assert ((lat >= lat_min) & (lat < lat_max)).all()


def test_k_ring_counts():
    c = int(grid.cell_encode(np.array([10.0]), np.array([20.0]), 8)[0])
    assert len(grid.k_ring(c, 0)) == 1
    assert len(grid.k_ring(c, 1)) == 9
    assert len(grid.k_ring(c, 2)) == 25
    assert c in set(grid.k_ring(c, 1).tolist())


def test_covering_cells_contains_corners():
    cells = set(grid.covering_cells(10.0, 20.0, 11.0, 21.0, 8).tolist())
    for lon, lat in [(10.0, 20.0), (11.0, 21.0), (10.5, 20.5)]:
        assert int(grid.cell_encode(np.array([lon]), np.array([lat]), 8)[0]) in cells


def test_mgrs_tile_bounds_contains_golden_points():
    # every golden point must fall inside its tile's 100km-square footprint bbox
    for lon, lat, _d, tile in synth.GOLDEN_POINTS:
        lon_b, lat_b = mgrs_tile_bounds(tile)
        assert lon_b.min() - 1e-6 <= lon <= lon_b.max() + 1e-6, (tile, lon)
        assert lat_b.min() - 1e-6 <= lat <= lat_b.max() + 1e-6, (tile, lat)
        # the square's center re-encodes to the same zone + column/row letters
        # (the lat band may legitimately differ: 100 km squares straddle bands)
        clon = np.array([(lon_b.min() + lon_b.max()) / 2])
        clat = np.array([(lat_b.min() + lat_b.max()) / 2])
        got = mgrs_precision0(clat, clon)[0]
        assert got[:-3] == tile[:-3] and got[-2:] == tile[-2:], (got, tile)


def test_synth_catalog_and_images():
    cat = synth.gen_granule_catalog_pdf(tiles=["38PMB", "30RYS"], days=20, every=5)
    assert len(cat) == 8
    assert cat["granule_id"].is_unique
    imgs = synth.gen_images_pdf(cat.head(2), w=64, h=48, fmt="png")
    assert set(imgs.columns) == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}
    # decode + caption invariants
    row = imgs.iloc[0]
    px = codecs.decode(row["bytes"], int(row["w"]), int(row["h"]), 1, row["fmt"])
    assert px.shape == (1, 48, 64)
    assert row["caption"] == synth.caption_for(row["image_id"])
    # determinism: regenerate → identical bytes
    imgs2 = synth.gen_images_pdf(cat.head(2), w=64, h=48, fmt="png")
    assert imgs.iloc[0]["bytes"] == imgs2.iloc[0]["bytes"]


def test_observations_have_golden_mgrs():
    obs = synth.gen_observations_pdf(n_extra_per_tile=5)
    got = obs.head(10)["mgrs_tile_id"].tolist()
    assert got == [g[3] for g in synth.GOLDEN_POINTS]


def test_decoders_robust_to_corruption():
    # crawl-scale ingest sees truncated/flipped payloads in every format:
    # each decoder must raise cleanly or return data — never hang.
    # (JP2 has its own sweep in test_jp2.py.)
    import struct as _struct

    import numpy as np

    from instageo_e2e_geospatial_ml_spark import codecs
    from instageo_e2e_geospatial_ml_spark.jpeg import jpeg_decode, jpeg_encode
    from instageo_e2e_geospatial_ml_spark.webp import webp_decode

    rng = np.random.default_rng(21)
    g = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    fixtures = [
        (jpeg_decode, jpeg_encode(g, quality=85)),
        (codecs.decode_png_any, codecs.encode_png(g.astype(np.uint16)[None])),
        (codecs.decode_gif, None),  # gif fixture below if encoder exists
    ]
    fixtures = [(d, b) for d, b in fixtures if b is not None]
    allowed = (
        ValueError, NotImplementedError, IndexError, KeyError,
        EOFError, AssertionError, _struct.error, Exception,
    )
    # Exception is deliberately broad: ANY clean raise is acceptable —
    # the assertion this test makes is termination, not error taxonomy
    for dec, buf in fixtures:
        for trial in range(25):
            b = bytearray(buf)
            kind = trial % 3
            if kind == 0:
                b = b[: int(rng.integers(2, len(b)))]
            elif kind == 1:
                i = int(rng.integers(0, len(b)))
                b[i] ^= int(rng.integers(1, 256))
            else:
                i = int(rng.integers(0, max(1, len(b) - 6)))
                b[i : i + 4] = rng.integers(0, 256, 4, dtype=np.uint8).tobytes()
            try:
                dec(bytes(b))
            except allowed:
                pass

    # webp: flip bytes inside a hand-rolled minimal container too
    hdr = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8L" + (4).to_bytes(4, "little") + b"\x2f\x00\x00\x00"
    for trial in range(10):
        b = bytearray(hdr)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        try:
            webp_decode(bytes(b))
        except allowed:
            pass


def test_ico_favicon_decode():
    # ICO container walk: PNG entries (modern favicons) and headerless
    # doubled-height DIB entries, largest-icon selection; payloads ride
    # the independently validated PNG/BMP decoders
    import struct

    import numpy as np

    from instageo_e2e_geospatial_ml_spark.codecs import (
        decode_ico,
        decode_png_any,
        encode_png,
    )

    rng = np.random.default_rng(19)

    def _entry(w, h, bpp, size, off):
        return (
            bytes([w % 256, h % 256, 0, 0])
            + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
            + size.to_bytes(4, "little") + off.to_bytes(4, "little")
        )

    # PNG entry
    g = rng.integers(0, 65536, (1, 16, 16)).astype(np.uint16)
    png = encode_png(g)
    ico = b"\x00\x00\x01\x00" + (1).to_bytes(2, "little") + _entry(16, 16, 32, len(png), 22) + png
    np.testing.assert_array_equal(decode_ico(ico), decode_png_any(png))

    # DIB entry: 24-bit, doubled header height, AND mask trailing
    h, w = 8, 8
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    rows = np.zeros((h, (w * 3 + 3) & ~3), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    mask = b"\x00" * (((w + 31) // 32) * 4 * h)
    dib = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0, 0, 0, 0, 0, 0) + rows.tobytes() + mask
    ico2 = b"\x00\x00\x01\x00" + (1).to_bytes(2, "little") + _entry(w, h, 24, len(dib), 22) + dib
    np.testing.assert_array_equal(decode_ico(ico2), img)

    # largest-entry selection: tiny DIB + big PNG → PNG wins
    ico3 = (
        b"\x00\x00\x01\x00" + (2).to_bytes(2, "little")
        + _entry(w, h, 24, len(dib), 38)
        + _entry(16, 16, 32, len(png), 38 + len(dib))
        + dib + png
    )
    np.testing.assert_array_equal(decode_ico(ico3), decode_png_any(png))

    import pytest

    with pytest.raises(ValueError, match="ICO"):
        decode_ico(b"\x00\x00\x02\x00junk")


def test_ico_clr_used_and_32bit_alpha():
    """ADVICE r6 fixes: (a) 8-bit ICO DIB with biClrUsed < 256 stores
    pixels right after the short palette — the synthesized data offset
    must honour it; (b) 32-bit entries with real per-pixel alpha (and a
    zeroed AND mask) keep that alpha; (c) an all-zero alpha plane means
    legacy XRGB → AND-mask fallback."""
    import struct

    import numpy as np

    from instageo_e2e_geospatial_ml_spark.codecs import decode_ico

    rng = np.random.default_rng(23)

    def _entry(w, h, bpp, size, off):
        return (
            bytes([w % 256, h % 256, 0, 0])
            + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
            + size.to_bytes(4, "little") + off.to_bytes(4, "little")
        )

    def _ico(dib, w, h, bpp):
        return (
            b"\x00\x00\x01\x00" + (1).to_bytes(2, "little")
            + _entry(w, h, bpp, len(dib), 22) + dib
        )

    h = w = 8
    mrow = ((w + 31) // 32) * 4

    # (a) 8-bit, 16-entry palette (biClrUsed=16)
    n_colors = 16
    pal = rng.integers(0, 256, (n_colors, 4)).astype(np.uint8)
    pal[:, 3] = 0
    idx = rng.integers(0, n_colors, (h, w)).astype(np.uint8)
    rows = np.zeros((h, (w + 3) & ~3), np.uint8)
    rows[:, :w] = idx[::-1]
    dib8 = (
        struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 8, 0, 0, 0, 0, n_colors, 0)
        + pal.tobytes() + rows.tobytes() + b"\x00" * (mrow * h)
    )
    got = decode_ico(_ico(dib8, w, h, 8))
    want = pal[idx][:, :, [2, 1, 0]]  # BGRX palette -> RGB
    if want.ndim == 3 and (want[..., 0] == want[..., 1]).all() and (
        want[..., 1] == want[..., 2]
    ).all():
        want = want[..., 0]
    np.testing.assert_array_equal(got, want)

    # (b) 32-bit with real alpha, zeroed AND mask
    img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    img[..., 3] = rng.integers(1, 256, (h, w))  # non-trivial alpha
    rows32 = img[::-1][:, :, [2, 1, 0, 3]].reshape(h, w * 4)  # RGBA->BGRA
    dib32 = (
        struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0, 0, 0, 0, 0, 0)
        + rows32.tobytes() + b"\x00" * (mrow * h)
    )
    np.testing.assert_array_equal(decode_ico(_ico(dib32, w, h, 32)), img)

    # (c) zero alpha channel -> AND mask supplies transparency
    img0 = img.copy()
    img0[..., 3] = 0
    rows0 = img0[::-1][:, :, [2, 1, 0, 3]].reshape(h, w * 4)
    # mask: top-left pixel transparent (bit set), bottom-up rows
    mask = np.zeros((h, mrow), np.uint8)
    mask[h - 1, 0] = 0x80
    dib0 = (
        struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0, 0, 0, 0, 0, 0)
        + rows0.tobytes() + mask.tobytes()
    )
    got0 = decode_ico(_ico(dib0, w, h, 32))
    assert got0.shape == (h, w, 4)
    np.testing.assert_array_equal(got0[..., :3], img0[..., :3])
    assert got0[0, 0, 3] == 0 and got0[0, 1, 3] == 255
