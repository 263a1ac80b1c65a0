"""Streaming twin of operators/funnel.windowed_funnel — incremental
horizon-bounded conversion tracking via applyInPandasWithState.

Semantics (identical to the batch operator on in-order input, and on any
input whose per-user disorder stays within one micro-batch — each batch
is sorted by (ts, event_id) before folding): the user's FIRST step-1
event anchors the funnel; each later stage advances on its earliest
qualifying event — strictly after the previous stage and within
`horizon_us` of the anchor. A row (u, stage, anchor_us, last_us) is
emitted every time the user's stage ADVANCES (stage 1 included), so the
last row per user equals the batch result; downstream keeps max(stage).

Cross-batch LATE events (older than state already folded) are the
documented append-mode caveat shared by streaming/sessions.py: an
earlier step-1 event arriving after the anchor was set cannot retract
already-emitted rows, so the anchor sticks to the first one SEEN in
event-time order per batch — exact parity requires per-batch disorder
only, the same contract as the sessionizer.

State is O(1) per user — (anchor_us, last_us, stage) — and is dropped by
event-time timeout once the watermark passes anchor + horizon (a funnel
that can no longer advance), so the store is bounded by users with OPEN
horizons, not all users ever seen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def windowed_funnel_stream(
    events: DataFrame,
    steps: list[str],
    horizon_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming windowed funnel: emits (u, stage, anchor_us, last_us)
    on every stage advance; requires `events` to be a streaming
    DataFrame with an event-time column `ts_col`."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    step_idx = {s: i + 1 for i, s in enumerate(steps)}
    n_steps = len(steps)
    out_schema = "u long, stage long, anchor_us long, last_us long"
    state_schema = "anchor long, last long, stage long"

    def proc(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, id_col], kind="mergesort")
        ts_us = (
            rows[ts_col].astype("datetime64[us]").astype("int64")
        ).to_numpy()
        kinds = rows[type_col].map(step_idx).fillna(0).astype(int).to_numpy()
        if state.exists:
            anchor, last, stage = state.get
        else:
            anchor, last, stage = -1, -1, 0
        emitted = []
        for t, k in zip(ts_us, kinds):
            if stage == 0:
                if k == 1:
                    anchor, last, stage = int(t), int(t), 1
                    emitted.append((key[0], 1, anchor, last))
            elif stage < n_steps:
                if (
                    k == stage + 1
                    and t > last
                    and t <= anchor + horizon_us
                ):
                    last, stage = int(t), stage + 1
                    emitted.append((key[0], stage, anchor, last))
        if stage > 0:
            state.update((anchor, last, stage))
            # state is dead once the horizon closes (or the funnel
            # completes): drop it when the watermark passes that point
            state.setTimeoutTimestamp((anchor + horizon_us) // 1000 + 1)
        if emitted:
            yield pd.DataFrame(
                emitted, columns=["u", "stage", "anchor_us", "last_us"]
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            proc,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
