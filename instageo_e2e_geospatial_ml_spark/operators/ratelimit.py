"""Token-bucket rate limiting — batch replay + the exact admission
decision, all integer.

The token bucket (capacity B tokens, refill r tokens/second) is THE
admission policy of every API gateway and crawler politeness layer;
auditing a historical event stream against it ("which requests WOULD
have been throttled") is a genuinely sequential per-key recurrence:

    avail_i = min(B·1e6, tokens_{i-1} + (t_i − t_{i-1})·r)   [µtokens]
    admit_i = avail_i >= 1e6 ;  tokens_i = avail_i − 1e6·admit_i

Micro-tokens (1e-6 token) make the refill EXACT integer arithmetic:
r tokens/second ≡ r µtokens per µs, so refill = Δt_µs · r with no
division at all. The recurrence is order-dependent state — not a
window/aggregate shape — so the batch form runs as a per-key
applyInPandas fold (numpy-backed, the sessionize contract: per-key
history is the parallelism unit) and the oracle is a DuckDB RECURSIVE
CTE stepping the identical recurrence. The streaming twin
(token_bucket_stream) carries (tokens, last_ts) per key in GroupState —
O(1) state — and matches the batch fold on in-order feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def token_bucket_admit(
    events: DataFrame,
    rate_per_s: int,
    burst: int,
    key_col: str = "k",
    ts_col: str = "tus",
    id_col: str = "eid",
) -> DataFrame:
    """Batch replay: per key, fold the bucket over (ts, id)-ordered
    arrivals → (k, n_arrivals, n_admitted, n_throttled,
    first_throttled_us or NULL)."""
    import pandas as pd

    cap = burst * 1_000_000
    cost = 1_000_000

    def fold(key, pdf):
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        ts = pdf[ts_col].astype("int64").to_numpy()
        tokens = cap
        last = None
        admitted = 0
        first_thr = None
        for t in ts:
            if last is not None:
                tokens = min(cap, tokens + (int(t) - last) * rate_per_s)
            last = int(t)
            if tokens >= cost:
                tokens -= cost
                admitted += 1
            elif first_thr is None:
                first_thr = int(t)
        return pd.DataFrame(
            {
                "k": [key[0]],
                "n_arrivals": [len(ts)],
                "n_admitted": [admitted],
                "n_throttled": [len(ts) - admitted],
                "first_throttled_us": [first_thr],
            }
        )

    return events.groupBy(key_col).applyInPandas(
        fold,
        "k string, n_arrivals long, n_admitted long, n_throttled long, "
        "first_throttled_us long",
    )


def token_bucket_admit_sql(
    events_sql: str, rate_per_s: int, burst: int
) -> str:
    """DuckDB twin: the identical recurrence as a RECURSIVE CTE over
    per-key arrival indexes (`events_sql` yields k, tus, eid)."""
    cap = burst * 1_000_000
    cost = 1_000_000
    return f"""
WITH RECURSIVE ev AS (
  SELECT k, CAST(tus AS BIGINT) AS tus,
         row_number() OVER (PARTITION BY k ORDER BY tus, eid) AS rn
  FROM ({events_sql})
),
walk(k, rn, tus, tokens, admitted) AS (
  SELECT k, rn, tus,
         CASE WHEN {cap} >= {cost} THEN {cap} - {cost}
              ELSE {cap} END,
         CASE WHEN {cap} >= {cost} THEN 1 ELSE 0 END
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.k, e.rn, e.tus,
    CASE WHEN least({cap}, w.tokens + (e.tus - w.tus) * {rate_per_s})
              >= {cost}
         THEN least({cap}, w.tokens + (e.tus - w.tus) * {rate_per_s})
              - {cost}
         ELSE least({cap}, w.tokens + (e.tus - w.tus) * {rate_per_s})
    END,
    CASE WHEN least({cap}, w.tokens + (e.tus - w.tus) * {rate_per_s})
              >= {cost}
         THEN 1 ELSE 0 END
  FROM ev e JOIN walk w ON e.k = w.k AND e.rn = w.rn + 1
)
SELECT k, CAST(count(*) AS BIGINT) AS n_arrivals,
       CAST(sum(admitted) AS BIGINT) AS n_admitted,
       CAST(count(*) - sum(admitted) AS BIGINT) AS n_throttled,
       min(CASE WHEN admitted = 0 THEN tus END) AS first_throttled_us
FROM walk GROUP BY k
"""


def token_bucket_stream(
    events: DataFrame,
    rate_per_s: int,
    burst: int,
    key_col: str = "k",
    ts_col: str = "ts",
    id_col: str = "eid",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin: emits one row per THROTTLED arrival (k,
    arrival_us, tokens_short) as it happens; GroupState carries
    (tokens_µ, last_us). In-order parity with token_bucket_admit; the
    usual append-mode cross-batch-disorder caveat applies."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    cap = burst * 1_000_000
    cost = 1_000_000
    out_schema = "k string, arrival_us long, tokens_short long"
    state_schema = "tokens long, last long"

    def proc(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, id_col], kind="mergesort")
        ts_us = (
            rows[ts_col].astype("datetime64[us]").astype("int64")
        ).to_numpy()
        if state.exists:
            tokens, last = state.get
        else:
            tokens, last = cap, -1
        throttled = []
        for t in ts_us:
            t = int(t)
            if last >= 0:
                tokens = min(cap, tokens + (t - last) * rate_per_s)
            last = t
            if tokens >= cost:
                tokens -= cost
            else:
                throttled.append((key[0], t, cost - tokens))
        state.update((int(tokens), int(last)))
        if throttled:
            yield pd.DataFrame(
                throttled, columns=["k", "arrival_us", "tokens_short"]
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
