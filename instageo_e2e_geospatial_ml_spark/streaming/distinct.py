"""Streaming distinct-count: an online HyperLogLog whose state is the
register vector — the streaming twin of operators/stats.hll_registers
(q103's exact batch sketch).

Why this shape: dropDuplicates-based exact streaming distinct keeps one
state row PER KEY (unbounded for high-cardinality streams); the HLL
register vector is a FIXED 2^p longs per group forever, and updating it
is an elementwise max — commutative and idempotent, so replays and
micro-batch boundary changes cannot change the registers' final value
(max-merge is order-free, the property the batch twin's oracle pins).

Per micro-batch: hash the batch's keys exactly as the batch operator
does (md5-derived 60-bit hash, low-p register, rho = leading-zero count
+ 1), fold elementwise max into the state vector, emit one snapshot row
per group with the register content digest + the integer mass summary
(R, S) that hll_estimate derives the cardinality from. Batch parity is
REGISTER-EXACT: feeding the same rows in any batch split yields the
identical register vector as hll_registers on the union.

State: 2^p longs per group — p=9 is 4 KB; a million groups is 4 GB
spread over the state store, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct_stream(
    df: DataFrame,
    key_col: str,
    group_col: str = "grp",
    p: int = 9,
) -> DataFrame:
    """Streaming DataFrame with (group, key) → per-group HLL register
    snapshots (grp, n_rows, m_hit, r_big, s_total) where s_total is the
    exact integer mass Σ 2^(r_big - rho) over all 2^p registers (the
    hll_estimate input). Registers live in state; output is the
    summary row per group per batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    m = 1 << p
    w = 60 - p

    def update(key, pdfs, state):
        import hashlib

        if state.exists:
            n_rows, regs = state.get
            regs = list(regs)
        else:
            n_rows, regs = 0, [0] * m
        for pdf in pdfs:
            for v in pdf[key_col]:
                h = int(
                    hashlib.md5(str(v).encode()).hexdigest()[:15], 16
                )
                idx = h & (m - 1)
                rem = h >> p
                rho = (w + 1) if rem == 0 else (w + 1 - rem.bit_length())
                if rho > regs[idx]:
                    regs[idx] = rho
                n_rows += 1
        state.update((n_rows, regs))
        r_big = max(regs)
        s_total = sum(1 << (r_big - r) for r in regs)
        m_hit = sum(1 for r in regs if r > 0)
        yield pd.DataFrame(
            {
                group_col: [key[0]],
                "n_rows": [n_rows],
                "m_hit": [m_hit],
                "r_big": [r_big],
                "s_total": [s_total],
            }
        )

    return df.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{group_col} string, n_rows long, m_hit long, "
            "r_big long, s_total long"
        ),
        stateStructType="n_rows long, regs array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def decayed_counts_stream(
    df: DataFrame,
    key_col: str = "key",
    slot_col: str = "slot",
    val_col: str = "val",
    half_life_slots: int = 1,
    max_age_halflives: int = 62,
) -> DataFrame:
    """Streaming twin of operators/timeseries.decayed_counts with
    EXACT batch parity. The naive incremental form — decay the single
    running total, then add new events — is NOT the batch value:
    (Σ v_i) >> b differs from Σ (v_i >> b) (floor before vs after the
    sum). Parity needs per-slot granularity, and the decay horizon
    bounds it: events older than max_age_halflives half-lives
    contribute exactly 0, so the state is a RING of at most
    (max_age_halflives + 1) * half_life_slots per-slot sums per key —
    fixed-size state, and the emitted value recomputes
    Σ slot_sum >> age from the ring — exactly the batch operator's
    slot-aggregated definition (per-slot sums first, then the shift;
    event-level shifting would not be mergeable at all).

    Late arrivals merge into their slot's sum (order-free); slots that
    fall off the horizon are dropped from state. Emits one snapshot
    per key per batch: (key, last_slot, n_events, decayed)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    h = int(half_life_slots)
    horizon = (max_age_halflives + 1) * h

    def update(key, pdfs, state):
        if state.exists:
            n_events, slots, sums = state.get
            ring = dict(zip(slots, sums))
        else:
            n_events, ring = 0, {}
        for pdf in pdfs:
            for s, v in zip(pdf[slot_col], pdf[val_col]):
                s, v = int(s), int(v)
                ring[s] = ring.get(s, 0) + v
                n_events += 1
        if ring:
            last = max(ring)
            ring = {
                s: v for s, v in ring.items() if last - s < horizon
            }
            decayed = sum(
                v >> ((last - s) // h) for s, v in ring.items()
            )
        else:
            last, decayed = 0, 0
        state.update(
            (n_events, list(ring.keys()), [ring[s] for s in ring])
        )
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "last_slot": [last],
                "n_events": [n_events],
                "decayed": [decayed],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} long, last_slot long, n_events long, decayed long"
        ),
        stateStructType=(
            "n_events long, slots array<long>, sums array<long>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
