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


_KMV_SPACE = 1 << 40  # 10-hex-char (40-bit) hash space


def kmv_distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 16,
    salt: str = "kmv",
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group (Bar-Yossef et al.
    2002): keep the k smallest 40-bit md5 hashes of the group's DISTINCT
    values; the k-th minimum estimates distinct cardinality as
    (k-1) * SPACE / kth_min. Unlike HLL (whose register layout is
    engine-private), the KMV sketch CONTENT is a pure function of the
    data — md5 is the same everywhere — so sketch, threshold, and the
    integer-division estimate are all exactly reproducible in any ANSI
    engine (q79's DuckDB twin pins them).

    40-bit hashes keep (k-1) * SPACE inside bigint for any sane k; the
    estimate is exact n_seen while the group is under k distinct values.
    Plan: distinct (group, value) → one per-group window over hash order
    → head-k aggregate. The sketches themselves are mergeable (union the
    hash sets, re-take the k smallest) — the shuffle carries ≤ k rows
    per group either way.
    """
    gb = [F.col(c) for c in group_cols]
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(value_col).cast("string"), F.lit(":" + salt))),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(*gb).orderBy(F.col("_h").asc())
    sk = (
        df.select(*gb, F.col(value_col))
        .distinct()
        .withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*gb)
        .agg(
            F.count(F.lit(1)).alias("n_seen"),
            F.max("_h").alias("kth_hash"),
        )
    )
    est = F.when(F.col("n_seen") < k, F.col("n_seen")).otherwise(
        F.expr(f"(n_seen - 1) * {_KMV_SPACE} div kth_hash")
    )
    return sk.withColumn("est_distinct", est.cast("long"))
