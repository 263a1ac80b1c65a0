"""Streaming EWMA anomaly monitor — the online twin of
operators/timeseries.ewma_anomaly (which replays a batch and reports
per-key summaries). This form EMITS each anomaly as it happens — the
live alerting path — while carrying the identical fixed-point level in
GroupState:

    d = v*SCALE − s;  anomaly if |d| >= band*SCALE;
    s += trunc(d / 2^shift_pow)

Arithmetic is byte-for-byte the batch fold's (SCALE 1024,
trunc-toward-zero division), so an in-order feed reproduces the batch
replay's anomaly count and max deviation exactly — the parity the test
pins across 3 micro-batches. Rows are folded in (ts, value) order
WITHIN each micro-batch (the batch fold's tie-break); cross-batch
out-of-order arrivals fold late, the documented append-mode contract
shared by sessions/cusum/token-bucket.

State per key is two integers (level, seen) — bounded by live keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SCALE = 1024


def ewma_monitor_stream(
    events: DataFrame,
    shift_pow: int = 4,
    band: int = 3,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value_int",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-key EWMA monitor: one output row per anomaly —
    (key, anomaly_us, value, abs_dev, level_before)."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        "key string, anomaly_us long, value long, abs_dev long, "
        "level_before long"
    )
    state_schema = "s long, seen long"
    div = 1 << shift_pow
    thresh = band * SCALE

    def proc(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, value_col], kind="mergesort")
        ts_us = (
            rows[ts_col].astype("datetime64[us]").astype("int64")
        ).to_numpy()
        vals = rows[value_col].astype("int64").to_numpy()
        s, seen = state.get if state.exists else (0, 0)
        out = []
        for t, v in zip(ts_us, vals):
            if not seen:
                s = int(v) * SCALE
                seen = 1
                continue
            d = int(v) * SCALE - s
            ad = -d if d < 0 else d
            if ad >= thresh:
                out.append((key[0], int(t), int(v), ad, s // SCALE))
            q = ad // div
            s += q if d >= 0 else -q
        state.update((int(s), int(seen)))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "key", "anomaly_us", "value", "abs_dev",
                    "level_before",
                ],
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            proc,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
