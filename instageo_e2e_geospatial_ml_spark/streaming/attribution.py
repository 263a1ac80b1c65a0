"""Stream-stream event-time interval join — attribution (impression ->
conversion within a horizon), the canonical Structured Streaming
two-stream join and the last join shape the streaming surface needed.

Semantics: conversions attribute to every impression of the same user
whose timestamp satisfies

    imp_ts <= conv_ts <= imp_ts + horizon

(an INTERVAL join keyed by user). Both sides carry watermarks, which is
what makes the state bounded: Spark keeps an impression only until its
join window [imp_ts, imp_ts + horizon] falls entirely behind the
conversion watermark, and a conversion only until the impression
watermark passes it — late rows beyond the watermark drop, every
in-watermark pair emits exactly once. Without the time-range predicate
the state would grow without bound and Spark (correctly) rejects the
append-mode query.

Scale: the join shuffles both streams on user_id (the equi key); the
range predicate prunes state by event time per key. Hot users bound
per-key state by horizon x arrival rate, not by history length.

Batch twin (`attribute_batch`) is the same logical join on static
frames — the pytest drives identical input through both and asserts
row-set equality, the same parity discipline as sessions/neardup/caps.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_stream(
    impressions: DataFrame,
    conversions: DataFrame,
    horizon: str = "1 hour",
    imp_watermark: str = "2 hours",
    conv_watermark: str = "2 hours",
) -> DataFrame:
    """Streaming DataFrames (imp: user_id, imp_id, imp_ts; conv:
    user_id, conv_id, conv_ts) -> attributed pairs (user_id, imp_id,
    conv_id, imp_ts, conv_ts, lag_s). Append-mode capable: both sides
    watermarked, join condition equi + bounded interval."""
    imp = impressions.withWatermark("imp_ts", imp_watermark)
    conv = conversions.withWatermark("conv_ts", conv_watermark)
    cond = (
        (imp["user_id"] == conv["user_id"])
        & (conv["conv_ts"] >= imp["imp_ts"])
        & (conv["conv_ts"] <= imp["imp_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    return imp.join(conv, cond, "inner").select(
        imp["user_id"],
        "imp_id",
        "conv_id",
        "imp_ts",
        "conv_ts",
        (
            F.unix_micros(F.col("conv_ts")) - F.unix_micros(F.col("imp_ts"))
        ).alias("lag_us"),
    )


def attribute_batch(
    impressions: DataFrame,
    conversions: DataFrame,
    horizon: str = "1 hour",
) -> DataFrame:
    """The identical logical join on static frames (parity twin)."""
    cond = (
        (impressions["user_id"] == conversions["user_id"])
        & (conversions["conv_ts"] >= impressions["imp_ts"])
        & (
            conversions["conv_ts"]
            <= impressions["imp_ts"] + F.expr(f"INTERVAL {horizon}")
        )
    )
    return impressions.join(conversions, cond, "inner").select(
        impressions["user_id"],
        "imp_id",
        "conv_id",
        "imp_ts",
        "conv_ts",
        (
            F.unix_micros(F.col("conv_ts")) - F.unix_micros(F.col("imp_ts"))
        ).alias("lag_us"),
    )
