"""Deterministic (hash-keyed) sampling for training-data curation.

`df.sample()` is seed-dependent on partitioning and row order — useless
when the sample must be reproducible across engines, re-runs, and
re-partitioned inputs. These samplers key the keep-decision on md5 of the
ROW KEY, so membership is a pure function of the data: identical in Spark
and any ANSI engine (exact DuckDB oracles), stable under repartition, and
consistent across incremental runs (a row's verdict never changes when
new data arrives — the property reservoir/fraction sampling lacks).

Scale: a hash filter is embarrassingly parallel, pushes nothing to the
driver, and composes with partition pruning; the stratum lookup is a
literal CASE chain (no join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = 1_000_000


def _hash_point(key: Column, salt: str) -> Column:
    """Uniform integer in [0, 1e6) from md5(key:salt) — first 8 hex chars
    (32 bits) so the modulo bias is < 2^-12 of a unit."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(_DENOM))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "s"
) -> DataFrame:
    """Keep ~fraction of rows, decided by md5(key) — deterministic,
    engine-portable, repartition-stable."""
    return df.filter(_hash_point(F.col(key_col), salt) < int(fraction * _DENOM))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "s",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downweight a crawl source,
    keep all of a curated one): fractions maps stratum value → keep rate;
    unlisted strata get default_fraction."""
    thr = F.lit(int(default_fraction * _DENOM))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _DENOM))
        ).otherwise(thr)
    return df.filter(_hash_point(F.col(key_col), salt) < thr)
