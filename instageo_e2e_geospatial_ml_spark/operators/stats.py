"""Exact distribution statistics over groups.

group_percentiles is percentile_disc done portably: Spark's
`percentile`/`percentile_approx` and DuckDB's `quantile_cont` disagree
on interpolation (and approx sketches are seed-dependent), so a
cross-engine-exact percentile must be built from ranks — sort each
group, pick the element at rank ceil(p*n). Rank arithmetic stays in
integers ((num*n + den - 1) div num_den) — float ceil(0.2*5)=1.0000…2
is exactly the misround class that silently shifts a percentile by one
element. Equal values make row_number nondeterministic among ties, but
the VALUE at any rank of a sorted multiset is tie-order independent, so
the output is deterministic even though the row identity is not.

Scale: one window pass partitioned by the group key (each task sorts one
group's rows — groups are the unit of parallelism; a single pathological
mega-group wants a pre-aggregation to (group, value, count) first, which
preserves ranks and compresses duplicate-heavy columns), then a
broadcast join against the tiny fraction table. No global sort, no
driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    fractions: list[tuple[int, int]] = ((25, 100), (50, 100), (75, 100), (95, 100), (99, 100)),
) -> DataFrame:
    """Exact percentile_disc per group for each num/den fraction:
    (group_cols..., pct_num, pct_den, value) — the smallest value whose
    rank r satisfies r >= ceil(p * n)."""
    gb = [F.col(c) for c in group_cols]
    w = Window.partitionBy(*gb).orderBy(F.col(value_col).asc())
    wn = Window.partitionBy(*gb)
    ranked = df.select(
        *gb,
        F.col(value_col),
    ).withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    fr = df.sparkSession.createDataFrame(
        [(int(a), int(b)) for a, b in fractions], "pct_num long, pct_den long"
    )
    target = F.greatest(
        F.lit(1),
        F.expr("(pct_num * _n + pct_den - 1) div pct_den"),
    )
    return (
        ranked.join(F.broadcast(fr))
        .filter(F.col("_rn") == target)
        .select(*gb, "pct_num", "pct_den", F.col(value_col).alias("value"))
    )
