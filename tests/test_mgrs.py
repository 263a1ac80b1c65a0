"""Golden-value tests for the MGRS/UTM encoder.

Golden vectors ported from the reference's
tests/data_tests/test_data_pipeline.py:87-100 (exact MGRS precision-0 ids for
10 fixed lon/lat points) and test_data_pipeline.py:186-203 (CRS reprojection,
atol 0.01).
"""

import numpy as np
import pytest

from instageo_e2e_geospatial_ml_spark.mgrs import (
    latlon_to_utm,
    mgrs_precision0,
    utm_to_latlon,
    webmercator_to_latlon,
)

# (lon=x, lat=y, expected) per reference test_data_pipeline.py:87-100
GOLDEN = [
    (44.48, 15.115617, "38PMB"),
    (44.48865, 15.099767, "38PMB"),
    (46.437787, 14.714659, "38PPB"),
    (49.095545, 16.066929, "39QTT"),
    (-0.1305, 28.028967, "30RYS"),
    (44.6216, 16.16195, "38QMC"),
    (49.398908, 16.139727, "39QUT"),
    (44.451435, 15.209633, "38PMB"),
    (49.435228, 16.151837, "39QUT"),
    (44.744167, 15.287778, "38PMB"),
]


def test_mgrs_goldens():
    lon = np.array([g[0] for g in GOLDEN])
    lat = np.array([g[1] for g in GOLDEN])
    got = mgrs_precision0(lat, lon)
    want = [g[2] for g in GOLDEN]
    assert list(got) == want


def test_mgrs_southern_hemisphere():
    # Sydney ~(-33.87, 151.21) is 56HLH
    got = mgrs_precision0(np.array([-33.87]), np.array([151.21]))
    assert got[0] == "56HLH"


def test_utm_roundtrip():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-70, 70, 200)
    lon = rng.uniform(-179, 179, 200)
    e, n, z = latlon_to_utm(lat, lon)
    # invert per-zone
    for zone in np.unique(z):
        m = z == zone
        south = lat[m] < 0
        lat2n, lon2n = utm_to_latlon(e[m][~south], n[m][~south], int(zone), south=False)
        np.testing.assert_allclose(lat2n, lat[m][~south], atol=1e-7)
        np.testing.assert_allclose(lon2n, lon[m][~south], atol=1e-7)
        if south.any():
            lat2s, lon2s = utm_to_latlon(e[m][south], n[m][south], int(zone), south=True)
            np.testing.assert_allclose(lat2s, lat[m][south], atol=1e-7)
            np.testing.assert_allclose(lon2s, lon[m][south], atol=1e-7)


@pytest.mark.parametrize(
    "x,y,exp_lat,exp_lon",
    [
        # EPSG:3857 goldens (spherical mercator closed form; reference
        # test_data_pipeline.py:186-203 uses atol 0.01)
        (0.0, 0.0, 0.0, 0.0),
        (1113194.9079327357, 1118889.9748579597, 10.0, 10.0),
        (-2226389.8158654715, 2273030.926987689, 20.0, -20.0),
    ],
)
def test_webmercator(x, y, exp_lat, exp_lon):
    lat, lon = webmercator_to_latlon(np.array([x]), np.array([y]))
    assert abs(lat[0] - exp_lat) < 0.01
    assert abs(lon[0] - exp_lon) < 0.01


def test_utm_32633_to_4326():
    # EPSG:32633 (zone 33N): easting 500000 at lon 15; golden atol 0.01
    lat, lon = utm_to_latlon(np.array([500000.0]), np.array([4649776.22]), 33)
    assert abs(lon[0] - 15.0) < 0.01
    assert abs(lat[0] - 42.0) < 0.1  # ~42N


def test_mgrs_norway_svalbard_zone_exceptions():
    from instageo_e2e_geospatial_ml_spark.mgrs import (
        latlon_to_utm,
        mgrs_precision0,
        mgrs_tile_utm_square,
        mgrs_zone,
    )

    # 32V widened over SW Norway: (60.5N, 5E) would be zone 31 by the
    # plain lon rule but is 32V in MGRS
    assert mgrs_zone(np.array([60.5]), np.array([5.0]))[0] == 32
    t_bergen = mgrs_precision0(np.array([60.5]), np.array([5.0]))[0]
    assert t_bergen.startswith("32V")
    # Svalbard X band uses only zones 31/33/35/37: (78N, 15E) → 33X
    assert mgrs_zone(np.array([78.0]), np.array([15.0]))[0] == 33
    t_svalbard = mgrs_precision0(np.array([78.0]), np.array([15.0]))[0]
    assert t_svalbard.startswith("33X")
    for lon, z in [(4.0, 31), (15.0, 33), (25.0, 35), (36.0, 37)]:
        assert mgrs_zone(np.array([78.0]), np.array([lon]))[0] == z
    # outside the exception regions the plain rule still applies
    assert mgrs_zone(np.array([55.0]), np.array([5.0]))[0] == 31
    assert mgrs_zone(np.array([60.5]), np.array([13.0]))[0] == 33

    # self-consistency: each point's UTM coordinates (in its MGRS zone)
    # fall inside the 100 km square of the tile id we produced
    for lat, lon, tile in [
        (60.5, 5.0, t_bergen),
        (78.0, 15.0, t_svalbard),
        (60.39, 5.32, mgrs_precision0(np.array([60.39]), np.array([5.32]))[0]),
    ]:
        zone, south, e0, n0 = mgrs_tile_utm_square(tile)
        e, n, _ = latlon_to_utm(
            np.array([lat]), np.array([lon]), np.array([zone])
        )
        assert e0 <= e[0] < e0 + 100000.0, (tile, e[0], e0)
        assert n0 <= n[0] < n0 + 100000.0, (tile, n[0], n0)
