"""Online CUSUM drift monitor — the streaming counterpart of
operators/timeseries.cusum_changepoint (which is retrospective: it
needs the full series total). The ONLINE form (Page 1954) is the
production drift detector: per key,

    S⁺ ← max(0, S⁺ + (x − mu0) − slack)
    S⁻ ← max(0, S⁻ + (mu0 − x) − slack)

and an ALARM fires when either side exceeds the threshold h, after
which that side resets to 0 (restart monitoring). All arithmetic is
integer (callers pass pre-quantized values and integer mu0/slack/h),
so a replay over the same arrival order reproduces identical alarms.

Semantics contract (the sessions/funnel precedent): rows are folded in
event-time order WITHIN each micro-batch (sorted by (ts, id)); exact
parity with a single-pass reference holds for in-order feeds — an
out-of-order arrival across batches folds late, which is the
documented append-mode behavior.

State per key is three integers (S⁺, S⁻, rows since last alarm) — the
store is bounded by live keys, never history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cusum_alarms_reference(
    rows,
    mu0: int,
    slack: int,
    h: int,
):
    """Single-pass pure-Python reference (and the test oracle): rows =
    iterable of (ts_us, value); returns [(ts_us, side, s_at_alarm,
    n_since_reset)] with side +1/-1."""
    sp = sn = 0
    n = 0
    out = []
    for t, x in rows:
        sp = max(0, sp + (x - mu0) - slack)
        sn = max(0, sn + (mu0 - x) - slack)
        n += 1
        if sp > h:
            out.append((t, 1, sp, n))
            sp = 0
            n = 0
        elif sn > h:
            out.append((t, -1, sn, n))
            sn = 0
            n = 0
    return out


def cusum_monitor_stream(
    events: DataFrame,
    mu0: int,
    slack: int,
    h: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value_int",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-key online CUSUM: emits one row per alarm —
    (key, alarm_us, side, s_at_alarm, n_since_reset)."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        "key string, alarm_us long, side long, s_at_alarm long, "
        "n_since_reset long"
    )
    state_schema = "sp long, sn long, n long"

    def proc(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, id_col], kind="mergesort")
        ts_us = (
            rows[ts_col].astype("datetime64[us]").astype("int64")
        ).to_numpy()
        vals = rows[value_col].astype("int64").to_numpy()
        sp, sn, n = state.get if state.exists else (0, 0, 0)
        alarms = []
        for t, x in zip(ts_us, vals):
            sp = max(0, sp + (int(x) - mu0) - slack)
            sn = max(0, sn + (mu0 - int(x)) - slack)
            n += 1
            if sp > h:
                alarms.append((key[0], int(t), 1, sp, n))
                sp, n = 0, 0
            elif sn > h:
                alarms.append((key[0], int(t), -1, sn, n))
                sn, n = 0, 0
        state.update((int(sp), int(sn), int(n)))
        if alarms:
            yield pd.DataFrame(
                alarms,
                columns=[
                    "key", "alarm_us", "side", "s_at_alarm",
                    "n_since_reset",
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
