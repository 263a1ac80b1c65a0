"""J1: point-in-polygon spatial join (observations × granule footprints).

Reference semantics (instageo/data/stac_utils.py:116-154
`dispatch_candidate_items` + hls_utils.py:173-210): for each observation
point, the list of granules whose footprint polygon contains it; points with
no match get an empty list.

Spark-first design (replaces geopandas STRtree sjoin):
  1. bucket each footprint by the grid cells its bbox covers (explode —
     distributed, no driver loop);
  2. equi-join observations to buckets on cell id — this is the coarse
     index; with a broadcast hint the fact table never shuffles;
  3. exact ray-cast point-in-polygon refine in an Arrow-batched pandas UDF
     (numpy per unique polygon within each batch);
  4. group matches back per observation (array_sort for deterministic
     candidate order — J2's tie-break depends on it).

At 10^12-obs scale: the granule catalog (≤ millions of rows after cell
explode) broadcasts; step 2 is a map-side hash join with zero shuffle of the
fact side; the only wide exchange is the per-observation regroup in step 4,
which is keyed by obs_id and benefits from AQE coalescing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from ..functions.geo import cell_of

DEFAULT_PIP_RES = 7  # cell size 180/2^7 = 1.40625° ≥ one MGRS tile footprint


def point_in_polygon(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized ray-casting: points (px,py) inside polygon (xs,ys).

    Standard even-odd rule, half-open edges (matches shapely 'within' for
    interior points; boundary points are implementation-defined in the
    reference too).
    """
    inside = np.zeros(px.shape[0], dtype=bool)
    n = len(xs)
    x1, y1 = xs[n - 1], ys[n - 1]
    for i in range(n):
        x2, y2 = xs[i], ys[i]
        if y1 != y2:
            cross = ((y1 > py) != (y2 > py)) & (
                px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
            )
            inside ^= cross
        x1, y1 = x2, y2
    return inside


@pandas_udf(BooleanType())
def pip_udf(px: pd.Series, py: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
    """Exact PIP refine; batches are grouped by polygon internally so each
    unique polygon is tested against all its candidate points in one
    vectorized pass."""
    out = np.zeros(len(px), dtype=bool)
    pxv = px.to_numpy(dtype=np.float64)
    pyv = py.to_numpy(dtype=np.float64)
    # group rows by identical polygon (cheap: id of the underlying list obj
    # is not stable → key on bytes)
    keys = xs.map(lambda a: np.asarray(a, dtype=np.float64).tobytes())
    for _, idx in pd.Series(range(len(px))).groupby(keys).groups.items():
        ii = np.asarray(idx)
        poly_x = np.asarray(xs.iloc[ii[0]], dtype=np.float64)
        poly_y = np.asarray(ys.iloc[ii[0]], dtype=np.float64)
        out[ii] = point_in_polygon(pxv[ii], pyv[ii], poly_x, poly_y)
    return pd.Series(out)


def bucket_polygons(catalog: DataFrame, res: int = DEFAULT_PIP_RES) -> DataFrame:
    """Explode each footprint into the grid cells its bbox covers.

    Pure column expressions (sequence × sequence cross) — no Python.
    """
    n = 1 << res

    def _clamp(c, hi):
        return F.least(F.greatest(c, F.lit(0)), F.lit(hi))

    # clamp like grid.cell_encode so boundary footprints bucket identically
    cx0 = _clamp(F.floor((F.col("fp_minx") + 180.0) * n / 180.0).cast("long"), 2 * n - 1)
    cx1 = _clamp(F.floor((F.col("fp_maxx") + 180.0) * n / 180.0).cast("long"), 2 * n - 1)
    cy0 = _clamp(F.floor((F.col("fp_miny") + 90.0) * n / 180.0).cast("long"), n - 1)
    cy1 = _clamp(F.floor((F.col("fp_maxy") + 90.0) * n / 180.0).cast("long"), n - 1)
    return (
        catalog.withColumn("_cx", F.explode(F.sequence(cx0, cx1)))
        .withColumn("_cy", F.explode(F.sequence(cy0, cy1)))
        .withColumn(
            "cell",
            F.lit(res).cast("long") * F.lit(1 << 58)
            + F.col("_cy") * F.lit(1 << 29)
            + F.col("_cx"),
        )
        .drop("_cx", "_cy")
    )


def pip_join(
    obs: DataFrame,
    catalog: DataFrame,
    res: int = DEFAULT_PIP_RES,
    obs_id: str = "obs_id",
    x: str = "x",
    y: str = "y",
    exact: bool = True,
    broadcast_catalog: bool = True,
) -> DataFrame:
    """(obs_id, granule_id) match pairs: observation point within footprint.

    exact=False stops at the bbox test (useful when footprints are known
    rectangles — pure JVM path, no Python at all).
    """
    buckets = bucket_polygons(
        catalog.select("granule_id", "fp_minx", "fp_miny", "fp_maxx", "fp_maxy", "fp_xs", "fp_ys"),
        res,
    )
    if broadcast_catalog:
        buckets = F.broadcast(buckets)
    pts = obs.withColumn("cell", cell_of(x, y, res))
    j = pts.join(buckets, "cell", "inner")
    # cheap bbox pre-filter always applies (prunes before the Python UDF)
    j = j.filter(
        (F.col(x) >= F.col("fp_minx"))
        & (F.col(x) <= F.col("fp_maxx"))
        & (F.col(y) >= F.col("fp_miny"))
        & (F.col(y) <= F.col("fp_maxy"))
    )
    if exact:
        j = j.filter(pip_udf(F.col(x), F.col(y), F.col("fp_xs"), F.col("fp_ys")))
    return j.select(obs_id, "granule_id")


def candidate_lists(matches: DataFrame, obs: DataFrame, obs_id: str = "obs_id") -> DataFrame:
    """A3 + reindex-fill: per-observation sorted candidate array; empty array
    for observations with no match (reference stac_utils.py:148-153)."""
    agg = matches.groupBy(obs_id).agg(
        F.array_sort(F.collect_list("granule_id")).alias("candidate_items")
    )
    return (
        obs.select(obs_id)
        .join(agg, obs_id, "left")
        .withColumn(
            "candidate_items",
            F.coalesce(F.col("candidate_items"), F.array().cast("array<string>")),
        )
    )
