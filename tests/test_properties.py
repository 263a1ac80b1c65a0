"""Property-based tests (hypothesis) for the pure numpy kernels: grid
index, UTM/MGRS, projections, and codecs — fast, no Spark session."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from instageo_e2e_geospatial_ml_spark import codecs, grid, mgrs, projections as proj

LON = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
LAT = st.floats(min_value=-79.9, max_value=83.9, allow_nan=False)
RES = st.integers(min_value=0, max_value=15)


@settings(max_examples=200, deadline=None)
@given(LON, LAT, RES)
def test_cell_encode_decode_bounds_contain_point(lon, lat, res):
    cell = grid.cell_encode(np.array([lon]), np.array([lat]), res)
    r, cx, cy = grid.cell_decode(cell)
    assert int(r[0]) == res
    lon_min, lat_min, lon_max, lat_max = grid.cell_bounds(cell)
    # floating floor can land a boundary point in the neighbor cell only
    # within one ulp of the edge
    eps = 1e-9 * (1 << res)
    assert lon_min[0] - eps <= lon <= lon_max[0] + eps
    assert lat_min[0] - eps <= lat <= lat_max[0] + eps


@settings(max_examples=200, deadline=None)
@given(LON, LAT)
def test_utm_roundtrip(lon, lat):
    e, n, zone = mgrs.latlon_to_utm(np.array([lat]), np.array([lon]))
    south = lat < 0
    lat2, lon2 = mgrs.utm_to_latlon(
        e, n - (10000000.0 if south else 0.0) + (10000000.0 if south else 0.0),
        int(zone[0]), south=south,
    )
    assert abs(lat2[0] - lat) < 1e-7
    assert abs(lon2[0] - lon) < 1e-7


@settings(max_examples=150, deadline=None)
@given(LON, LAT)
def test_mgrs_tile_contains_its_point(lon, lat):
    tile = mgrs.mgrs_precision0(np.array([lat]), np.array([lon]))[0]
    zone, south, e0, n0 = mgrs.mgrs_tile_utm_square(tile)
    e, n, _ = mgrs.latlon_to_utm(np.array([lat]), np.array([lon]), np.array([zone]))
    nv = n[0]
    if lat < 0 and not south:
        nv -= 10000000.0  # equator-boundary sliver: band is northern
    assert e0 <= e[0] < e0 + 100000.0
    assert n0 <= nv < n0 + 100000.0


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=42.2, max_value=49.8),
    st.floats(min_value=-3.8, max_value=7.8),
)
def test_lambert93_roundtrip(lat, lon):
    x, y = proj.EPSG_FORWARD[2154](np.array([lat]), np.array([lon]))
    lat2, lon2 = proj.EPSG_INVERSE[2154](x, y)
    assert abs(lat2[0] - lat) < 1e-9
    assert abs(lon2[0] - lon) < 1e-9


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_codec_roundtrips(seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 10001, size=(1, 16, 16), dtype=np.uint16)
    for fmt in ("raw", "png"):
        got = codecs.decode(codecs.encode(a, fmt), 16, 16, 1, fmt)
        assert (got == a).all(), fmt
    lossy = codecs.decode(codecs.encode(a, "qdct"), 16, 16, 1, "qdct")
    assert codecs.psnr(lossy[0], a[0]) >= 40.0


# --- filter-spec parser fuzz (pure, no Spark) --------------------------------

_COLS = st.sampled_from(["label", "year", "x", "name"])
_NUM = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
)
_VAL = st.one_of(
    _NUM,
    st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=4),
    st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=8),
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            _COLS,
            st.sampled_from(["==", ">", ">=", "<", "<=", "!=", "in", "not-in"]),
            _VAL,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_filter_spec_parse_roundtrip(clauses):
    from instageo_e2e_geospatial_ml_spark.functions.filters import parse_filters

    spec = "; ".join(f"('{c}' ? '{o}' ? {v!r})" for c, o, v in clauses)
    parsed = parse_filters(spec)
    assert len(parsed) == len(clauses)
    for (c, o, v), (pc, po, pv) in zip(clauses, parsed):
        assert (pc, po) == (c, o)
        assert pv == v


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_filter_spec_garbage_never_crashes_silently(garbage):
    # any non-empty unparseable spec raises ValueError; empty → []
    from instageo_e2e_geospatial_ml_spark.functions.filters import parse_filters

    try:
        out = parse_filters(garbage)
    except (ValueError, SyntaxError):
        return
    assert isinstance(out, list)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_jp2_codec_roundtrip_property(seed):
    """Any int image round-trips bit-exactly through the JPEG-2000 codec,
    across random dims / levels / block sizes / precinct layouts /
    progression orders."""
    from instageo_e2e_geospatial_ml_spark.jp2 import jp2_decode, jp2_encode

    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
    levels = int(rng.integers(0, 4))
    cblk = int(rng.choice([4, 16, 64]))
    depth = int(rng.integers(1, 15))
    img = rng.integers(0, 1 << depth, (h, w))
    if rng.random() < 0.3:
        img = img - (1 << (depth - 1))  # signed path
    kw = {}
    if rng.random() < 0.5:
        kw["precincts"] = [
            (int(rng.integers(1, 7)), int(rng.integers(1, 7)))
            for _ in range(levels + 1)
        ]
        kw["progression"] = int(rng.integers(0, 5))
    out = jp2_decode(jp2_encode(img, levels=levels, cblk=cblk, **kw))
    assert (out == img).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_mq_coder_roundtrip_property(seed):
    from instageo_e2e_geospatial_ml_spark.jp2 import MQDecoder, MQEncoder

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 1500))
    p = float(rng.choice([0.5, 0.05, 0.95, 0.01, 0.99]))
    bits = (rng.random(n) < p).astype(int).tolist()
    ctxs = rng.integers(0, 19, n).tolist()
    enc = MQEncoder()
    for b, c in zip(bits, ctxs):
        enc.encode(int(b), int(c))
    dec = MQDecoder(enc.flush())
    assert [dec.decode(int(c)) for c in ctxs] == bits


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_vp8l_interop_property(seed):
    """Random small RGBA images: libwebp lossless encode → our decoder
    must match libwebp's own decode bit-exactly (skips if libwebp absent)."""
    import pytest as _pt

    from tests.test_webp import _LIB, _encode_lossless, _libwebp_decode
    from instageo_e2e_geospatial_ml_spark.webp import webp_decode

    if _LIB is None:
        _pt.skip("libwebp not available")
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
    kind = int(rng.integers(0, 3))
    if kind == 0:
        img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        img[..., 3] = np.maximum(img[..., 3], 1)
    elif kind == 1:
        pal = rng.integers(1, 255, (int(rng.integers(2, 17)), 4), dtype=np.uint8)
        img = pal[rng.integers(0, len(pal), (h, w))]
    else:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 7) % 256, (yy * 11) % 256, (xx + yy) % 256, np.full_like(xx, 255)],
            -1,
        ).astype(np.uint8)
    buf = _encode_lossless(img)
    ref = _libwebp_decode(buf)
    got = webp_decode(buf)
    assert got.shape == ref.shape and (got == ref).all()
