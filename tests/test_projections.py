"""CRS reprojection closed forms (P1): anchors exact by CRS definition,
forward/inverse round-trips, and the Spark UDF dispatch."""

import numpy as np
import pandas as pd
import pytest

from instageo_e2e_geospatial_ml_spark import projections as proj


# each CRS's projection origin maps to its false easting/northing EXACTLY —
# this is authoritative (it is how the CRS is defined), no pyproj needed
ANCHORS = [
    (5070, 23.0, -96.0, 0.0, 0.0),
    (3577, 0.0, 132.0, 0.0, 0.0),
    (2154, 46.5, 3.0, 700000.0, 6600000.0),
    (3978, 49.0, -95.0, 0.0, 0.0),
    (3035, 52.0, 10.0, 4321000.0, 3210000.0),
]


@pytest.mark.parametrize("code,lat0,lon0,x0,y0", ANCHORS)
def test_origin_anchor(code, lat0, lon0, x0, y0):
    x, y = proj.EPSG_FORWARD[code](np.array([lat0]), np.array([lon0]))
    assert abs(x[0] - x0) < 1e-6, (code, x[0])
    assert abs(y[0] - y0) < 1e-6, (code, y[0])
    lat, lon = proj.EPSG_INVERSE[code](np.array([x0]), np.array([y0]))
    assert abs(lat[0] - lat0) < 1e-9
    assert abs(lon[0] - lon0) < 1e-9


@pytest.mark.parametrize("code", sorted(proj.EPSG_FORWARD))
def test_roundtrip_grid(code):
    # a lat/lon grid in each CRS's service area survives forward→inverse
    area = {
        5070: (25, 48, -120, -75),
        3577: (-42, -12, 115, 150),
        2154: (42, 50, -4, 8),
        3978: (45, 75, -135, -60),
        3035: (35, 68, -8, 28),
    }[code]
    lats = np.linspace(area[0], area[1], 7)
    lons = np.linspace(area[2], area[3], 7)
    gla, glo = np.meshgrid(lats, lons)
    x, y = proj.EPSG_FORWARD[code](gla.ravel(), glo.ravel())
    lat2, lon2 = proj.EPSG_INVERSE[code](x, y)
    np.testing.assert_allclose(lat2, gla.ravel(), atol=1e-9)
    np.testing.assert_allclose(lon2, glo.ravel(), atol=1e-9)


def test_lcc_is_conformal_aea_is_equal_area():
    # sanity on projection family behavior: AEA preserves areas of small
    # quads (to first order), LCC preserves angles — check AEA area ratio
    # stays ~1 across latitudes while plain scale varies
    lat = np.array([30.0, 45.0, 60.0])
    d = 0.01
    for code in (5070,):
        x1, y1 = proj.EPSG_FORWARD[code](lat, np.full(3, -96.0))
        x2, y2 = proj.EPSG_FORWARD[code](lat + d, np.full(3, -96.0))
        x3, y3 = proj.EPSG_FORWARD[code](lat, np.full(3, -96.0) + d)
        # projected area of the d×d cell vs true ellipsoidal area ratio
        area_proj = np.abs((x3 - x1) * (y2 - y1) - (x2 - x1) * (y3 - y1))
        # true cell area ≈ a² (1-e²) cosφ dλ dφ / (1 - e² sin²φ)²
        phi = np.radians(lat)
        a, e2 = 6378137.0, 0.0066943800229
        area_true = (
            a * a * (1 - e2) * np.cos(phi) / (1 - e2 * np.sin(phi) ** 2) ** 2
            * np.radians(d) ** 2
        )
        np.testing.assert_allclose(area_proj / area_true, 1.0, rtol=1e-4)


def test_reproject_udf_dispatch(spark):
    from pyspark.sql import functions as F

    # Lambert-93 coordinates of the origin + one offset point round-trip
    # through the Spark UDF
    lat = np.array([46.5, 48.85])
    lon = np.array([3.0, 2.35])
    x, y = proj.EPSG_FORWARD[2154](lat, lon)
    df = spark.createDataFrame(
        pd.DataFrame({"x": x, "y": y, "epsg": [2154, 2154]})
    )
    from instageo_e2e_geospatial_ml_spark.functions.geo import reproject_to_4326_udf

    out = (
        df.withColumn("p", reproject_to_4326_udf("x", "y", "epsg"))
        .select("p.x_4326", "p.y_4326")
        .toPandas()
    )
    np.testing.assert_allclose(out["y_4326"], lat, atol=1e-9)
    np.testing.assert_allclose(out["x_4326"], lon, atol=1e-9)


def test_unsupported_epsg_raises(spark):
    import pandas as pd
    from instageo_e2e_geospatial_ml_spark.functions.geo import reproject_to_4326_udf

    df = spark.createDataFrame(pd.DataFrame({"x": [0.0], "y": [0.0], "epsg": [9999]}))
    with pytest.raises(Exception, match="9999"):
        df.withColumn("p", reproject_to_4326_udf("x", "y", "epsg")).collect()
