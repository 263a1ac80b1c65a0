"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship geo pipeline slice on /root/testdata/sf0.001.
queries()      — operator queries from SURVEY.md §2 (geo-relational, text
                 dedup, similarity), each (spark, sf_dir) → DataFrame.
oracle_sql()   — exact DuckDB twins (same column names/types).

Implementations live in instageo_e2e_geospatial_ml_spark/plans/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from instageo_e2e_geospatial_ml_spark.plans import driver_queries as _dq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full chip pipeline slice — MGRS assign → density
    filter → broadcast PIP join → as-of pick → validity → cogrouped chip
    extraction (q19-sized synthetic inputs; returns the chip metadata
    table)."""
    return _dq.q52_chip_extract(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_dq.ORACLES)
