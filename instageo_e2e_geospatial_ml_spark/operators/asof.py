"""J2/J3: as-of temporal join with tolerance and deterministic tie-break.

Reference semantics (instageo/data/stac_utils.py:157-202 `find_closest_items`
+ 392-449 `find_best_items`): for each (observation, timestep query date),
among candidate granules whose |granule.ts − query_date| ≤ tolerance
(days·1440 + minutes, in minutes), pick the one with minimum cloud_cover,
ties broken by earliest ts (candidates arrive datetime-ascending). No
candidate within tolerance → null.

Spark: explode steps → equi-join candidates → range predicate →
`row_number() over (partition by obs,step order by cloud_cover, ts,
granule_id) = 1`, then LEFT join back so no-match rows keep nulls
(the reference's `[None]*len(dates)` shape).

J3 variant (s2_utils.py:508-587): order by (size desc, |Δt| asc) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_pick(
    steps: DataFrame,
    candidates: DataFrame,
    granules: DataFrame,
    tolerance_days: int = 5,
    tolerance_minutes: int = 0,
    obs_id: str = "obs_id",
    order: str = "cloud_cover",
    keep_unmatched: bool = True,
    align_partitioning: bool = False,
    join_key: str = "granule_id",
    broadcast_granules: bool = False,
) -> DataFrame:
    """steps(obs_id, step, query_date) × candidates(obs_id, granule_id)
    × granules(granule_id, ts, cloud_cover, ...) → one row per (obs_id,
    step) with the picked granule_id (null when nothing within tolerance).

    order='cloud_cover' → J2 (min cloud, tie earliest ts);
    order='closest'     → J3-style (min |Δt|, tie asc ts).

    keep_unmatched=False skips the null-preserving join-back (the
    reference's [None]*len(dates) shape) — correct whenever the caller
    immediately applies the validity filter, saving one shuffle.
    align_partitioning=True repartitions candidates by obs_id before the
    rank window; HashPartitioning(obs_id) satisfies the (obs_id, step)
    clustering, so the window AND the downstream per-obs groupBy reuse
    that single exchange.

    join_key: the column joining candidates to granules. The default
    'granule_id' is the per-granule contract (J2 parity). Passing a
    coarser key (e.g. the footprint id from spatial_join.footprint_key,
    with candidates at footprint granularity) fuses the granule fan-out
    with the tolerance filter inside one broadcast-join stage — the
    obs × all-revisits intermediate never crosses an exchange. Set
    broadcast_granules=True when the granule side is the dim table.
    """
    tol_min = tolerance_days * 24 * 60 + tolerance_minutes
    g = F.broadcast(granules) if broadcast_granules else granules
    cand = steps.join(candidates, obs_id, "inner").join(g, join_key, "inner")
    # microsecond-exact tolerance (events may carry sub-second timestamps)
    dt_us = F.abs(
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("query_date").cast("timestamp"))
    )
    cand = cand.filter(dt_us <= F.lit(int(tol_min) * 60 * 1_000_000))
    dt_min = dt_us / F.lit(60e6)
    if align_partitioning:
        cand = cand.repartition(obs_id)
    if order == "cloud_cover":
        # reference treats missing cloud cover as WORST, not best:
        # item.properties.get('eo:cloud_cover', 100) — so nulls sort last
        ordering = [
            F.coalesce(F.col("cloud_cover"), F.lit(100.0)).asc(),
            F.col("ts").asc(),
            F.col("granule_id").asc(),
        ]
    elif order == "closest":
        ordering = [dt_min.asc(), F.col("ts").asc(), F.col("granule_id").asc()]
    else:
        raise ValueError(order)
    w = Window.partitionBy(obs_id, "step").orderBy(*ordering)
    picked = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(obs_id, "step", F.col("granule_id").alias("picked_granule"),
                "ts", "cloud_cover")
    )
    if not keep_unmatched:
        return picked
    return steps.join(picked, [obs_id, "step"], "left")


def granule_sequence(
    picked: DataFrame, obs_id: str = "obs_id", num_steps: int | None = None
) -> DataFrame:
    """Collapse per-step picks back to one row per observation with the
    step-ordered granule array + the `stac_items_str` grouping key
    (reference stac_utils.py:296-317: '_'.join of granule ids)."""
    agg = picked.groupBy(obs_id).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("step"), F.col("picked_granule")))
        ).alias("_s")
    )
    out = agg.withColumn(
        "granules", F.transform("_s", lambda s: s["picked_granule"])
    ).drop("_s")
    return out.withColumn("stac_items_str", F.concat_ws("_", "granules"))
