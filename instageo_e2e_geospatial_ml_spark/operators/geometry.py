"""Exact area of a union of axis-aligned rectangles, per group — the
classic computational-geometry sweep (Bentley 1977) re-expressed as
relational operators so it distributes.

The sweep's two ingredients map cleanly onto DataFrame ops:

1. **Coordinate compression** → the distinct x boundaries of a group's
   rectangles, turned into half-open slabs [xs, xe) by one lead()
   window per group (2·n boundaries per group — window input is
   boundary-count sized, not data sized).
2. **Slab coverage** → a point-in-interval join (slab start xs against
   rect [x1, x2)): because xe is the NEXT boundary after xs and x2 is
   itself a boundary, xs ∈ [x1, x2) already implies the whole slab lies
   inside the rectangle — so the join predicate is exactly the
   bucketed point-in-interval rewrite operators/ranges.py uses:
   explode each rectangle to the fixed-width x-buckets it covers,
   equi-join slabs by bucket(xs), refine x1 <= xs < x2. No
   nested-loop join, shuffles key on (group, bucket).
3. **Y-interval merge per slab** → gaps-and-islands: order a slab's
   covering rectangles by y1, island starts where y1 exceeds the
   running max of preceding y2 (classic interval-merge as one window
   pass), then per-island length = max(y2) - min(y1). All integer.

Area = Σ_slabs covered_y(slab) · (xe - xs). Everything is exact bigint
arithmetic — the same computation runs verbatim in DuckDB for the
oracle twin.

Scale: shuffles are keyed on (group, x-bucket) and (group, slab) — both
fine-grained; the per-slab window sorts only that slab's covering
rectangles. A rectangle spanning many buckets explodes to
width/bucket_width rows; callers pick bucket_width near the typical
rectangle width (the interval_join sizing rule). Degenerate rectangles
(x1 >= x2 or y1 >= y2) contribute no area and are dropped up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rect_union_area(
    rects: DataFrame,
    group_col: str = "grp",
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
    bucket_width: int = 256,
) -> DataFrame:
    """Per-group exact union area of half-open integer rectangles
    [x1, x2) × [y1, y2). Returns (group_col, n_rects, n_slabs, area)."""
    g = F.col(group_col)
    r = rects.filter((F.col(x1) < F.col(x2)) & (F.col(y1) < F.col(y2)))
    n_rects = r.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rects"))

    bounds = (
        r.select(g, F.col(x1).alias("xb"))
        .unionByName(r.select(g, F.col(x2).alias("xb")))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("xb")
    slabs = (
        bounds.withColumn("xe", F.lead("xb").over(w))
        .filter(F.col("xe").isNotNull())
        .select(g, F.col("xb").alias("xs"), "xe")
    )

    # bucketed point-in-interval join: slab start xs vs rect [x1, x2)
    bw = bucket_width
    rb = r.select(
        g,
        F.col(x1).alias("rx1"),
        F.col(x2).alias("rx2"),
        F.col(y1).alias("ry1"),
        F.col(y2).alias("ry2"),
        F.explode(
            F.sequence(
                F.floor(F.col(x1) / bw), F.floor((F.col(x2) - 1) / bw)
            )
        ).alias("bkt"),
    )
    sb = slabs.withColumn("bkt", F.floor(F.col("xs") / bw))
    pairs = sb.join(rb, [group_col, "bkt"]).filter(
        (F.col("rx1") <= F.col("xs")) & (F.col("xs") < F.col("rx2"))
    )

    # gaps-and-islands y-merge per (group, slab)
    ws = Window.partitionBy(group_col, "xs").orderBy(
        F.col("ry1").asc(), F.col("ry2").desc()
    )
    run_max = F.max("ry2").over(
        ws.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = pairs.withColumn(
        "new_island",
        F.when(
            run_max.isNull() | (F.col("ry1") > run_max), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("new_island").over(ws))
    covered = (
        flagged.groupBy(group_col, "xs", "xe", "island")
        .agg((F.max("ry2") - F.min("ry1")).alias("ylen"))
        .groupBy(group_col, "xs", "xe")
        .agg(F.sum("ylen").alias("ycov"))
    )
    area = covered.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_slabs"),
        F.sum(F.col("ycov") * (F.col("xe") - F.col("xs"))).alias("area"),
    )
    return n_rects.join(area, group_col, "left").select(
        g,
        "n_rects",
        F.coalesce(F.col("n_slabs"), F.lit(0)).cast("long").alias("n_slabs"),
        F.coalesce(F.col("area"), F.lit(0)).cast("long").alias("area"),
    )


def rect_union_area_sql(rects_sql: str, group_col: str = "grp") -> str:
    """The identical sweep as DuckDB SQL (oracle twin). `rects_sql` must
    select (group_col, x1, y1, x2, y2) integer columns."""
    gc = group_col
    return f"""
WITH r AS (
  SELECT * FROM ({rects_sql}) WHERE x1 < x2 AND y1 < y2
),
nr AS (SELECT {gc}, CAST(count(*) AS BIGINT) AS n_rects FROM r GROUP BY 1),
bounds AS (
  SELECT DISTINCT {gc}, xb FROM (
    SELECT {gc}, x1 AS xb FROM r UNION ALL SELECT {gc}, x2 AS xb FROM r
  )
),
slabs AS (
  SELECT {gc}, xb AS xs,
         lead(xb) OVER (PARTITION BY {gc} ORDER BY xb) AS xe
  FROM bounds
),
pairs AS (
  SELECT s.{gc}, s.xs, s.xe, r.y1 AS ry1, r.y2 AS ry2
  FROM slabs s JOIN r ON r.{gc} = s.{gc}
   AND r.x1 <= s.xs AND s.xs < r.x2
  WHERE s.xe IS NOT NULL
),
flagged AS (
  SELECT *,
    CASE WHEN max(ry2) OVER
           (PARTITION BY {gc}, xs ORDER BY ry1 ASC, ry2 DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         OR ry1 > max(ry2) OVER
           (PARTITION BY {gc}, xs ORDER BY ry1 ASC, ry2 DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS new_island
  FROM pairs
),
islanded AS (
  SELECT *, sum(new_island) OVER
    (PARTITION BY {gc}, xs ORDER BY ry1 ASC, ry2 DESC) AS island
  FROM flagged
),
cov AS (
  SELECT {gc}, xs, xe, CAST(sum(ylen) AS BIGINT) AS ycov FROM (
    SELECT {gc}, xs, xe, island, max(ry2) - min(ry1) AS ylen
    FROM islanded GROUP BY {gc}, xs, xe, island
  ) GROUP BY {gc}, xs, xe
),
ar AS (
  SELECT {gc}, CAST(count(*) AS BIGINT) AS n_slabs,
         CAST(sum(ycov * (xe - xs)) AS BIGINT) AS area
  FROM cov GROUP BY 1
)
SELECT nr.{gc}, nr.n_rects,
       CAST(coalesce(ar.n_slabs, 0) AS BIGINT) AS n_slabs,
       CAST(coalesce(ar.area, 0) AS BIGINT) AS area
FROM nr LEFT JOIN ar ON nr.{gc} = ar.{gc}
"""
