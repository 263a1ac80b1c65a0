"""P9 validity filter + A4 granule-set dedup.

Reference semantics (instageo/data/stac_utils.py:53-69 `is_valid_entry` +
hls_utils.py:275-291): an observation's granule sequence is valid iff every
timestep matched (no nulls) AND all matched granules are pairwise distinct.
A4 (stac_utils.py:310): distinct granule-sets keyed by stac_items_str.

Pure array column expressions — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validity_filter(
    records: DataFrame, granules_col: str = "granules", num_steps: int | None = None
) -> DataFrame:
    g = F.col(granules_col)
    no_nulls = ~F.exists(g, lambda x: x.isNull())
    distinct = F.size(F.array_distinct(g)) == F.size(g)
    cond = no_nulls & distinct
    if num_steps is not None:
        cond = cond & (F.size(g) == F.lit(num_steps))
    return records.filter(cond)


def distinct_granule_sets(records: DataFrame, key: str = "stac_items_str") -> DataFrame:
    """A4: one row per unique granule sequence (the unit of chip-extraction
    work — reference stac_utils.py:296-317 builds the dataset dict this way)."""
    return records.select(key, "granules").dropDuplicates([key])
