"""Ordered-funnel and cohort-retention analytics over event streams —
the two canonical product/behavior queries every event warehouse runs
(Amplitude/Mixpanel-style), expressed as pure relational plans.

`funnel_stages`: strict-order funnel. A user reaches stage k when an
event of step k's type exists STRICTLY after their stage-(k-1)
timestamp; the earliest such event is the stage timestamp (the
"first-touch" convention). The plan is a chain of filtered min-
aggregates, one per step: filter(type_k) -> join previous stage (on
user) -> keep later events -> min(ts). k steps = k hash aggregates on
the user key, no window over raw history, no UDF; each join's right
side is one row per qualifying user, so the chain narrows
monotonically — funnel depth bounds cost, not history length.

`cohort_retention`: users bucket into signup cohorts by their first
event week (an epoch-microsecond floor division — engine-exact
integers), then (cohort_week, week_offset) cells count distinct
active users. Two aggregates and a join, all on integer keys.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEEK_US = 7 * 86400 * 1_000_000


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """events -> one row per (user, reached stage): (user, stage,
    step_name, stage_ts_us). Stage numbering is 1-based; a user appears
    for every stage they reached (stage 1..k)."""
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("etype"),
        tus.alias("tus"),
    )
    stages = []
    prev = None
    for k, step in enumerate(steps, start=1):
        cur = ev.filter(F.col("etype") == step)
        if prev is not None:
            cur = cur.join(
                prev.select("user", F.col("stage_ts_us").alias("_prev_us")),
                "user",
            ).filter(F.col("tus") > F.col("_prev_us"))
        stage = cur.groupBy("user").agg(F.min("tus").alias("stage_ts_us"))
        stages.append(
            stage.select(
                "user",
                F.lit(k).alias("stage"),
                F.lit(step).alias("step_name"),
                "stage_ts_us",
            )
        )
        prev = stage
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out


def funnel_summary(stage_rows: DataFrame) -> DataFrame:
    """funnel_stages output -> per-stage rollup: (stage, step_name,
    n_users, first_reach_us, last_reach_us)."""
    return (
        stage_rows.groupBy("stage", "step_name")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("stage_ts_us").alias("first_reach_us"),
            F.max("stage_ts_us").alias("last_reach_us"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """events -> (cohort_week, week_offset, n_users): users grouped by
    first-seen epoch week, counted distinct in every later week they
    were active. Integer week ids = epoch_us div WEEK_US."""
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(user_col).alias("user"), tus.alias("tus")
    ).select("user", F.expr(f"tus div {WEEK_US}").alias("week"))
    first = ev.groupBy("user").agg(F.min("week").alias("cohort_week"))
    active = ev.select("user", "week").distinct()
    return (
        active.join(first, "user")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
