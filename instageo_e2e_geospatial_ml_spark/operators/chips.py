"""Raster↔vector chip extraction engine (the reference's flagship path).

Numpy kernels replicate the reference bug-for-bug (citations per kernel);
the Spark operator replaces the reference's Dask task-per-granule-set loop
(data_pipeline.py:797-824) with a cogrouped Arrow UDF:

    images-per-set  ⟕ cogroup ⟖  observations-per-set
        → applyInPandas(extract) → chip table rows

Scale design:
  * group key = (stac_items_str, salt) where salt = hash(chip cell) %
    n_salt — obs of the same chip cell always land in the same group, so
    seg maps stay complete and chips are never duplicated, while a hot
    granule-set (millions of obs) fans out across n_salt tasks (AQE cannot
    split a single applyInPandas group — explicit salting is mandatory at
    10^12 scale; SURVEY.md §4).
  * image payloads flow through the cogroup join keyed by granule set —
    each task decodes only its own granules' bytes (Arrow batches, no
    driver involvement).
  * output is a columnar chip table (binary pixels + metadata), not a
    filesystem of GeoTIFFs — the chip table IS the catalog (S10/S11).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import codecs
from ..mgrs import latlon_to_utm, mgrs_tile_utm_square

SEG_NDV = -1  # NO_DATA_VALUES.SEG_MAP (reference settings.py:80-86)
HLS_NDV = 0
# bit positions in the HLS Fmask bitfield (reference data_pipeline.py:44-47)
MASK_DECODING_POS = {"cloud": 1, "near_cloud_or_shadow": 2, "cloud_shadow": 3, "water": 5}
DEFAULT_MASK_TYPES = list(MASK_DECODING_POS)


# ---------------------------------------------------------------------------
# numpy kernels (reference parity, cited)
# ---------------------------------------------------------------------------

def decode_fmask_value(mask: np.ndarray, pos: int) -> np.ndarray:
    """Bit `pos` of the uint Fmask value (reference hls_utils.py:77-86:
    q = v // 2^pos; q - (q // 2) * 2)."""
    q = mask // (2**pos)
    return q - (q // 2) * 2


def apply_mask(
    chip: np.ndarray,
    mask: np.ndarray,
    no_data_value: int,
    mask_types: Iterable[str] = DEFAULT_MASK_TYPES,
    masking_strategy: str = "each",
) -> np.ndarray:
    """Cloud/shadow/water masking (reference data_pipeline.py:229-267).

    chip: (T*B, h, w); mask: (T, h, w) Fmask bitfields.
    'each': each timestep's mask repeats across that timestep's bands
    (time-major stacking); 'any': a pixel masked in any timestep is masked
    everywhere.
    """
    chip = chip.copy()
    for mask_type in mask_types:
        pos = MASK_DECODING_POS.get(mask_type)
        if not pos:
            continue
        decoded = decode_fmask_value(mask, pos)
        if masking_strategy == "each":
            decoded = decoded.repeat(chip.shape[0] // mask.shape[0], axis=0)
        elif masking_strategy == "any":
            decoded = decoded.any(axis=0)
        else:
            raise ValueError(masking_strategy)
        chip = np.where(decoded == 0, chip, no_data_value)
    return chip


def create_segmentation_map(
    chip_shape: tuple[int, int],
    transform: tuple[float, float, float, float],
    xs: np.ndarray,
    ys: np.ndarray,
    labels: np.ndarray,
    window_size: int,
    task_type: str = "seg",
) -> np.ndarray:
    """Label rasterization (reference data_pipeline.py:385-421), replicated
    bug-for-bug:

      * obs filtered to the chip's pixel-CENTER coordinate range
        (chip.x.min() .. chip.x.max(), rioxarray center coords);
      * pixel = floor(~transform · (x, y));
      * a (2w+1)² window is stamped per obs; `window_rows` is clipped with
        sizes["x"] and `window_cols` with sizes["y"] — the reference's
        axis swap, kept as-is (goldens depend on it);
      * overlapping windows: last observation wins (numpy fancy-assignment
        order), with obs processed in input order.

    transform = (a, c, e, f): x = c + a·col, y = f + e·row (cell edges);
    chip_shape = (h, w).
    """
    h, w = chip_shape
    a, c, e, f = transform
    dtype = np.int16 if task_type == "seg" else np.float32
    seg = np.full((h, w), SEG_NDV, dtype=dtype)
    # pixel-center coordinate bounds of the chip
    x_centers = c + a * (np.arange(w) + 0.5)
    y_centers = f + e * (np.arange(h) + 0.5)
    keep = (
        (xs >= x_centers.min())
        & (xs <= x_centers.max())
        & (ys >= y_centers.min())
        & (ys <= y_centers.max())
    )
    xs, ys, labels = xs[keep], ys[keep], labels[keep]
    if len(xs) == 0:
        return seg
    cols = np.floor((xs - c) / a).astype(int)
    rows = np.floor((ys - f) / e).astype(int)
    offsets = np.arange(-window_size, window_size + 1)
    offset_rows, offset_cols = np.meshgrid(offsets, offsets)
    # NOTE the swapped clip bounds (sizes["x"]=w clips rows, sizes["y"]=h
    # clips cols) — intentional reference parity
    window_rows = np.clip(rows[:, None, None] + offset_rows, 0, w - 1)
    window_cols = np.clip(cols[:, None, None] + offset_cols, 0, h - 1)
    window_labels = np.repeat(labels, offset_rows.size)
    seg[window_rows.ravel(), window_cols.ravel()] = window_labels
    return seg


def mask_segmentation_map(
    chip: np.ndarray, seg: np.ndarray, chip_ndv: int, masking_strategy: str = "any"
) -> np.ndarray:
    """Invalidate seg pixels whose chip pixels are no-data (reference
    data_pipeline.py:57-98): 'each' → valid if ANY band valid; 'any' →
    valid only if ALL bands valid."""
    if masking_strategy == "each":
        valid = (chip != chip_ndv).any(axis=0)
    elif masking_strategy == "any":
        valid = (chip != chip_ndv).all(axis=0)
    else:
        raise ValueError(masking_strategy)
    return np.where(valid, seg, SEG_NDV)


def chip_coords(
    xs: np.ndarray, ys: np.ndarray, transform: tuple[float, float, float, float], chip_size: int
) -> np.ndarray:
    """Unique (cx, cy) chip-grid cells containing the points (reference
    data_pipeline.py:424-443)."""
    a, c, e, f = transform
    cols = np.floor((xs - c) / a).astype(int)
    rows = np.floor((ys - f) / e).astype(int)
    return np.unique(np.stack((cols // chip_size, rows // chip_size), axis=-1), axis=0)


def hls_tile_key(granule_id: str) -> str:
    """'HLS.S30.T38PMB.2022145T072619.v2.0' → 'S30_T38PMB_2022145T072619'
    (reference data_pipeline.py:162-165)."""
    parts = granule_id.split(".")
    return f"{parts[1]}_{parts[2]}_{parts[3]}"


def tile_transform(tile_id: str, w: int, h: int) -> tuple[float, float, float, float]:
    """Affine (a, c, e, f) of a 100 km MGRS square rasterized to w×h px."""
    _zone, _south, e0, n0 = mgrs_tile_utm_square(tile_id)
    return (100000.0 / w, e0, -100000.0 / h, n0 + 100000.0)


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

CHIP_SCHEMA = (
    "chip_id string, stac_items_str string, tile_key string, cx int, cy int, "
    "date_id string, n_bands int, chip_size int, chip_fmt string, chip binary, "
    "seg binary, valid_px long, n_label_px long"
)


def extract_chips(
    records: DataFrame,
    images: DataFrame,
    chip_size: int = 64,
    window_size: int = 0,
    mask_types: Iterable[str] = (),
    masking_strategy: str = "any",
    task_type: str = "seg",
    band_order: tuple[str, ...] = ("B02", "B03", "B04", "B8A", "B11", "B12"),
    mask_band: str = "Fmask",
    no_data_value: int = HLS_NDV,
    n_salt: int = 4,
    transform_overrides: dict | None = None,
) -> DataFrame:
    """records(stac_items_str, granules, x, y, date, label) × images
    (input_hint schema) → chip table.

    The reference's per-set sequential loop (data_pipeline.py:813-824)
    becomes one cogrouped Arrow UDF; see module docstring for the salting
    and shuffle story.

    transform_overrides: optional {tile_id: (utm_zone, a, c, e, f)} when
    rasters carry their own geotransform (the reference reads it from the
    GeoTIFF); default derives the 100 km MGRS square transform from the
    tile id.
    """
    mask_types = list(mask_types)
    overrides = dict(transform_overrides or {})

    def _tile_geo(tile_id: str, w: int, h: int):
        if tile_id in overrides:
            zone, a, c, e_, f_ = overrides[tile_id]
            return int(zone), (float(a), float(c), float(e_), float(f_))
        zone, _south, e0, n0 = mgrs_tile_utm_square(tile_id)
        return zone, (100000.0 / w, e0, -100000.0 / h, n0 + 100000.0)

    img = (
        images.withColumn("granule_id", F.split("image_id", ":").getItem(0))
        .withColumn("band", F.split("image_id", ":").getItem(1))
        .select("granule_id", "band", "bytes", "w", "h", "fmt")
    )
    needed = records.select(
        "stac_items_str", F.explode("granules").alias("granule_id")
    ).distinct()
    img_tasks = img.join(needed, "granule_id")

    # salt = hash(chip cell) % n_salt, computed by a vectorized pandas UDF
    # (the cell needs the per-tile UTM origin, so it can't be a pure column
    # expression); all obs of one chip cell share a salt → seg maps stay
    # complete and no chip is ever emitted twice
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    w_px, h_px = _probe_image_dims(images)

    @pandas_udf(LongType())
    def chip_cell_salt(x: pd.Series, y: pd.Series, granules: pd.Series) -> pd.Series:
        out = np.zeros(len(x), dtype=np.int64)
        if len(x) == 0:
            return pd.Series(out)
        xs = x.to_numpy(np.float64)
        ys = y.to_numpy(np.float64)
        tids = granules.map(lambda g: g[0].split(".")[2][1:] if len(g) else "")
        for tid, idx in pd.Series(range(len(x))).groupby(tids).groups.items():
            if not tid:
                continue
            zone, (a, c, e_, f_) = _tile_geo(tid, w_px, h_px)
            ii = np.asarray(idx)
            ee, nn, _ = latlon_to_utm(ys[ii], xs[ii], np.full(len(ii), zone))
            cx = np.floor((ee - c) / a).astype(np.int64) // chip_size
            cy = np.floor((nn - f_) / e_).astype(np.int64) // chip_size
            out[ii] = cx * 1000003 + cy
        return pd.Series(out)

    rec = records.withColumn(
        "salt", F.pmod(chip_cell_salt("x", "y", "granules"), F.lit(n_salt))
    )
    # fresh aliases on the image side: both cogroup inputs trace back to
    # `records`, so reusing the same attribute ids trips Spark's ambiguous
    # self-join check — aliased projections mint new ids
    sets = rec.select(
        F.col("stac_items_str").alias("sis"), F.col("salt").alias("img_salt")
    ).distinct()
    img_salted = img_tasks.join(
        sets, img_tasks["stac_items_str"] == sets["sis"]
    ).select("granule_id", "band", "bytes", "w", "h", "fmt", "sis", "img_salt")

    def extract(imgs_pdf: pd.DataFrame, obs_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [
            "chip_id", "stac_items_str", "tile_key", "cx", "cy", "date_id",
            "n_bands", "chip_size", "chip_fmt", "chip", "seg", "valid_px",
            "n_label_px",
        ]
        if len(obs_pdf) == 0 or len(imgs_pdf) == 0:
            return pd.DataFrame(columns=cols)
        sis = obs_pdf["stac_items_str"].iloc[0]
        granules = list(obs_pdf["granules"].iloc[0])
        tile_id = granules[0].split(".")[2][1:]  # T38PMB → 38PMB
        tile_key = hls_tile_key(granules[0])
        by_key = {
            (r.granule_id, r.band): r for r in imgs_pdf.itertuples(index=False)
        }

        def dec(g: str, b: str) -> np.ndarray | None:
            r = by_key.get((g, b))
            if r is None:
                return None
            return codecs.decode(bytes(r.bytes), int(r.w), int(r.h), 1, r.fmt)[0]

        # time-major band stack (reference adjust_dims, data_pipeline.py:455-475)
        planes, masks = [], []
        w = h = None
        for g in granules:
            for b in band_order:
                p = dec(g, b)
                if p is None:
                    return pd.DataFrame(columns=cols)
                planes.append(p)
                h, w = p.shape
            m = dec(g, mask_band)
            if m is not None:
                masks.append(m)
        tile = np.stack(planes)
        if np.issubdtype(tile.dtype, np.integer):
            tile = tile.astype(np.int32)  # headroom for the NDV sentinel
        mask = np.stack(masks) if len(masks) == len(granules) else None
        zone, tr = _tile_geo(tile_id, w, h)
        a, c, e_, f_ = tr

        ee, nn, _ = latlon_to_utm(
            obs_pdf["y"].to_numpy(np.float64),
            obs_pdf["x"].to_numpy(np.float64),
            np.full(len(obs_pdf), zone),
        )
        labels = obs_pdf["label"].to_numpy()
        date_id = pd.to_datetime(obs_pdf["date"]).min().strftime("%Y%m%d")

        n_chips_x = w // chip_size
        n_chips_y = h // chip_size
        out_rows = []
        for cx, cy in chip_coords(ee, nn, tr, chip_size):
            if cx < 0 or cy < 0 or cx >= n_chips_x or cy >= n_chips_y:
                continue  # partial chips dropped (reference data_pipeline.py:184-185)
            sl = np.s_[:, cy * chip_size : (cy + 1) * chip_size,
                       cx * chip_size : (cx + 1) * chip_size]
            chip = tile[sl]
            if mask is not None and mask_types:
                chip = apply_mask(chip, mask[sl], no_data_value, mask_types, masking_strategy)
            valid_px = int((chip != no_data_value).sum())
            if valid_px == 0:
                continue  # QA (reference data_pipeline.py:214-216)
            # chip-local transform: origin shifted to the chip corner
            chip_tr = (a, c + a * cx * chip_size, e_, f_ + e_ * cy * chip_size)
            seg = create_segmentation_map(
                (chip_size, chip_size), chip_tr, ee, nn, labels, window_size, task_type
            )
            seg = mask_segmentation_map(chip, seg, no_data_value, "any")
            n_label_px = int((seg != SEG_NDV).sum())
            if n_label_px == 0:
                continue  # QA (reference data_pipeline.py:218-220)
            if np.issubdtype(chip.dtype, np.floating):
                chip_fmt, chip_out = "rawf8", chip.astype(np.float64)
            else:
                chip_fmt, chip_out = "raw", np.clip(chip, 0, 65535).astype(np.uint16)
            out_rows.append(
                {
                    "chip_id": f"chip_{date_id}_{tile_key}_{cx}_{cy}",
                    "stac_items_str": sis,
                    "tile_key": tile_key,
                    "cx": int(cx),
                    "cy": int(cy),
                    "date_id": date_id,
                    "n_bands": int(chip.shape[0]),
                    "chip_size": chip_size,
                    "chip_fmt": chip_fmt,
                    "chip": codecs.encode(chip_out, chip_fmt),
                    "seg": seg.astype("<i2").tobytes(),
                    "valid_px": valid_px,
                    "n_label_px": n_label_px,
                }
            )
        return pd.DataFrame(out_rows, columns=cols)

    return (
        img_salted.groupby("sis", "img_salt")
        .cogroup(rec.groupby("stac_items_str", "salt"))
        .applyInPandas(extract, CHIP_SCHEMA)
    )


def _probe_image_dims(images: DataFrame) -> tuple[int, int]:
    """Tile pixel dims (assumed uniform — one probe row, pruned scan)."""
    row = images.select("w", "h").first()
    return int(row["w"]), int(row["h"])
