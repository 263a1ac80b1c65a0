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
covering the whole axis would explode to every bucket —
max_buckets_per_interval is a ROUTING threshold, not a data filter:
over-cap intervals skip the explode and instead join through a broadcast
theta join (they are pathological-few by definition, so broadcasting them
is cheap), and the two branches union. No matching pair is ever dropped,
and each still joins exactly once (an interval is routed to exactly one
branch).
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
    oversize_intervals: str = "broadcast",
    max_broadcast_intervals: int = 100_000,
) -> DataFrame:
    """events × intervals where start ≤ ts < end (half-open), exactly once
    per matching pair. Returns events' columns + intervals' columns.

    Intervals spanning ≥ max_buckets_per_interval buckets are routed per
    `oversize_intervals`:
      * "broadcast" (default) — a broadcast theta-join branch unioned with
        the bucketed branch. Correct for any width; costs one extra
        map-side pass over events (no shuffle — the over-cap side is
        broadcast, and an empty over-cap side produces nothing). The
        branch assumes over-cap intervals are pathological-FEW; a mis-set
        bucket_minutes (tiny buckets vs long-lived intervals) would
        silently route the whole interval table into the broadcast, so
        the over-cap side is counted first (one capped count job on the
        intervals table — the one eager step in this builder) and more
        than max_broadcast_intervals of them raises a descriptive error
        telling the caller to coarsen bucket_minutes / raise the cap
        instead of OOMing the driver at collect-broadcast time.
      * "drop" — excluded from the result (the pre-round-4 behavior; an
        explicit opt-in for callers that treat over-wide intervals as
        malformed and want the single-scan plan).
    """
    if oversize_intervals not in ("broadcast", "drop"):
        raise ValueError("oversize_intervals must be 'broadcast' or 'drop'")
    b_us = int(bucket_minutes) * 60 * 1_000_000
    ev_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    st_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    en_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    refine = (
        F.col(start_col).cast("timestamp") <= F.col(ts_col).cast("timestamp")
    ) & (F.col(ts_col).cast("timestamp") < F.col(end_col).cast("timestamp"))

    iv = intervals.withColumn("_b0", F.floor(st_us / F.lit(b_us))).withColumn(
        "_b1", F.floor(en_us / F.lit(b_us))
    )
    wide = (F.col("_b1") - F.col("_b0")) >= F.lit(max_buckets_per_interval)

    iv_b = (
        iv.filter(~wide)
        .withColumn("_bucket", F.explode(F.sequence("_b0", "_b1")))
        .drop("_b0", "_b1")
    )
    if broadcast_intervals:
        iv_b = F.broadcast(iv_b)
    ev = events.withColumn("_bucket", F.floor(ev_us / F.lit(b_us)))
    out = ev.join(iv_b, "_bucket").filter(refine).drop("_bucket")

    if oversize_intervals == "drop":
        return out
    iv_w = iv.filter(wide).drop("_b0", "_b1")
    n_wide = iv_w.limit(max_broadcast_intervals + 1).count()
    if n_wide > max_broadcast_intervals:
        raise ValueError(
            f"more than {max_broadcast_intervals} intervals span >= "
            f"{max_buckets_per_interval} buckets of {bucket_minutes} min — "
            "the over-cap broadcast branch would hold (a sample of) the "
            "whole interval table. Coarsen bucket_minutes toward the "
            "typical interval length (or raise max_broadcast_intervals / "
            "max_buckets_per_interval) so over-cap intervals are "
            "pathological-few."
        )
    theta = events.join(F.broadcast(iv_w), refine, "inner")
    return out.unionByName(theta)
