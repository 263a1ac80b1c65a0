"""P11: regex field extraction from file paths (named operator).

Reference parity: instageo/data/data_splitter.py:141-177 —
``extract_mgrs_tile`` (first 1-2-digit + 3-letter run in the BASENAME,
uppercased) and ``extract_year`` (first 4-digit 19xx/20xx in the basename).
Bug-for-bug notes kept from the reference:

  * only the basename is searched (a year in a directory name is ignored);
  * the tile regex is permissive (any ``\\d{1,2}[A-Za-z]{3}`` run, not just
    a leading-"T" MGRS id) — the FIRST such run wins, as in the reference;
  * no match → NULL (the reference returns None).

Pure Catalyst column expressions — JVM regexp, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MGRS_TILE_RE = r"(\d{1,2}[A-Za-z]{3})"
YEAR_RE = r"(19[0-9]{2}|20[0-9]{2})"


def path_basename(path: Column | str) -> Column:
    c = F.col(path) if isinstance(path, str) else path
    return F.element_at(F.split(c, "/"), -1)


def extract_mgrs_tile(path: Column | str) -> Column:
    """First MGRS-shaped run in the basename, uppercased; NULL if none
    (data_splitter.py:141-158)."""
    got = F.regexp_extract(path_basename(path), MGRS_TILE_RE, 1)
    return F.when(got != "", F.upper(got))


def extract_year(path: Column | str) -> Column:
    """First 4-digit year in [1900, 2099] in the basename, as int; NULL if
    none (data_splitter.py:160-177)."""
    got = F.regexp_extract(path_basename(path), YEAR_RE, 1)
    return F.when(got != "", got.cast("int"))
