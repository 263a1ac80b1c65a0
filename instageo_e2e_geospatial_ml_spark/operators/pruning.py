"""Zone-map file skipping — Iceberg/Delta manifest pruning and Parquet
row-group statistics as a first-class relational operator.

A 100 TB table is only queryable because most files are never opened:
each file's footer (or the table's manifest) carries per-column
min/max, and the planner classifies every (query, file) pair as
  skip    fmax < lo OR fmin > hi      (no overlap — never read)
  full    lo <= fmin AND fmax <= hi   (entirely inside — read without
                                       re-filtering rows)
  partial otherwise                   (read + filter)
This operator runs that classification for a BATCH of query ranges at
once — the planning workload itself becomes data, which is how a
catalog service amortizes manifest reads across a query fleet.

Plan: the query-range side is tiny and broadcasts; the file-stats side
(one row per file — millions of rows for a 100 TB table, still small)
never shuffles for the classification, and the per-query rollup is a
map-side-combinable groupBy on query_id. All integer comparisons.

The engine's own writers produce exactly the stats this consumes:
operators/skew.write_clustered lays files out so zone maps are tight
(clustered writes -> disjoint min/max -> mostly 'skip'/'full'), and
the q74/q102 Z-order/Hilbert keys exist precisely to make multi-column
zone maps selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zone_map_prune(
    file_stats: DataFrame,
    query_ranges: DataFrame,
) -> DataFrame:
    """Classify every (query, file) pair and roll up per query.

    file_stats:   (file_id, fmin, fmax, n_rows)
    query_ranges: (query_id, lo, hi)   — inclusive bounds, tiny side

    Returns per query_id: file and row counts per class, plus
    best/worst-case scan volume (best = full rows only; worst = full +
    partial rows — what you read before row-level filtering).
    """
    f = file_stats.select(
        "file_id",
        F.col("fmin").cast("long").alias("fmin"),
        F.col("fmax").cast("long").alias("fmax"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )
    q = query_ranges.select(
        "query_id",
        F.col("lo").cast("long").alias("lo"),
        F.col("hi").cast("long").alias("hi"),
    )
    j = f.crossJoin(F.broadcast(q))
    cls = (
        F.when((F.col("fmax") < F.col("lo")) | (F.col("fmin") > F.col("hi")), "skip")
        .when((F.col("lo") <= F.col("fmin")) & (F.col("fmax") <= F.col("hi")), "full")
        .otherwise("partial")
    )
    d = j.withColumn("cls", cls)
    is_ = lambda c: (F.col("cls") == c).cast("long")  # noqa: E731
    return d.groupBy("query_id").agg(
        F.sum(is_("skip")).alias("n_files_skip"),
        F.sum(is_("full")).alias("n_files_full"),
        F.sum(is_("partial")).alias("n_files_partial"),
        F.sum(is_("skip") * F.col("n_rows")).alias("rows_skip"),
        F.sum(is_("full") * F.col("n_rows")).alias("rows_full"),
        F.sum(is_("partial") * F.col("n_rows")).alias("rows_partial"),
    )


def zone_map_prune_sql(file_stats_sql: str, query_ranges_sql: str) -> str:
    """DuckDB twin of zone_map_prune (identical classification and
    rollup)."""
    return f"""
WITH f AS (
  SELECT file_id, CAST(fmin AS BIGINT) AS fmin, CAST(fmax AS BIGINT) AS fmax,
         CAST(n_rows AS BIGINT) AS n_rows
  FROM ({file_stats_sql})
),
q AS (
  SELECT query_id, CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi
  FROM ({query_ranges_sql})
),
d AS (
  SELECT q.query_id, f.n_rows,
         CASE WHEN f.fmax < q.lo OR f.fmin > q.hi THEN 'skip'
              WHEN q.lo <= f.fmin AND f.fmax <= q.hi THEN 'full'
              ELSE 'partial' END AS cls
  FROM f CROSS JOIN q
)
SELECT query_id,
  CAST(sum(CASE WHEN cls = 'skip' THEN 1 ELSE 0 END) AS BIGINT) AS n_files_skip,
  CAST(sum(CASE WHEN cls = 'full' THEN 1 ELSE 0 END) AS BIGINT) AS n_files_full,
  CAST(sum(CASE WHEN cls = 'partial' THEN 1 ELSE 0 END) AS BIGINT) AS n_files_partial,
  CAST(sum(CASE WHEN cls = 'skip' THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skip,
  CAST(sum(CASE WHEN cls = 'full' THEN n_rows ELSE 0 END) AS BIGINT) AS rows_full,
  CAST(sum(CASE WHEN cls = 'partial' THEN n_rows ELSE 0 END) AS BIGINT) AS rows_partial
FROM d GROUP BY query_id
"""
