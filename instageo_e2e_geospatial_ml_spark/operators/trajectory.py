"""Trajectory (GPS track) segmentation: split each entity's ordered ping
stream into trips at physically implausible hops — the standard GPS
cleaning pass before map-matching or mobility analysis.

A new trip starts at a ping whose hop from the previous ping either
  * exceeds the speed gate: dist/dt > vmax  ⇔  d² > vmax²·dt²
    (squared/cross-multiplied so the test is pure integer — no sqrt, no
    float, and dt = 0 with any displacement is correctly an instant
    teleport), or
  * follows a dead gap: dt > max_gap_s (the sessionization rule, same as
    streaming/sessions.py but composed with the kinematic gate).

Plan shape: one lag window per entity ordered by (ts, ping id) — the
per-key sort is the unit of parallelism, identical to sessionize_batch —
then trip_id = running sum of break flags over the same window. Two
window functions over ONE partitioning/ordering → a single sort, no
extra shuffle. Per-entity data volume bounds the task, not total volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def segment_trips(
    pings: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    x_col: str = "px",
    y_col: str = "py",
    order_tiebreak: str | None = None,
    vmax: int = 30,
    max_gap_s: int = 1800,
) -> DataFrame:
    """pings + (trip_id, hop_d2, hop_dt_s, is_break): trip_id is 1-based
    per user; hop_* are NULL on each user's first ping. Coordinates are
    integer planar units (meters); vmax in units/second."""
    order = [F.col(ts_col).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dx = F.col(x_col) - F.lag(x_col).over(w)
    dy = F.col(y_col) - F.lag(y_col).over(w)
    out = (
        pings.withColumn("_tus", tus)
        .withColumn("_ltus", F.lag("_tus").over(w))
        .withColumn("hop_dt_s", F.expr("(_tus - _ltus) div 1000000"))
        .withColumn("hop_d2", dx * dx + dy * dy)
        .withColumn(
            "is_break",
            F.when(F.col("hop_dt_s").isNull(), F.lit(True))  # first ping
            .when(F.col("hop_dt_s") > max_gap_s, F.lit(True))
            .when(
                F.col("hop_d2")
                > F.lit(int(vmax) * int(vmax))
                * F.col("hop_dt_s")
                * F.col("hop_dt_s"),
                F.lit(True),
            )
            .otherwise(F.lit(False)),
        )
        .withColumn(
            "trip_id",
            F.sum(F.col("is_break").cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .drop("_tus", "_ltus")
    )
    return out
