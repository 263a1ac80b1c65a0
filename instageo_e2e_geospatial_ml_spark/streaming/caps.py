"""Streaming per-key admission cap: the online twin of
functions/web.cap_per_domain (the RefinedWeb/C4-style per-domain
document budget), as a custom stateful operator.

An ingest pipeline admitting documents continuously cannot run a batch
row_number window — it needs a persistent per-key counter: the first
`max_per_key` arrivals of each key pass (with their admission rank),
everything after is dropped. State per key is ONE integer, so the state
store is bounded by the number of distinct keys regardless of volume —
the same bounded-state discipline as streaming/sessions.py and
streaming/neardup.py.

Determinism: within a micro-batch, arrivals are ordered by `order_col`
before admission, so a replay of the same batch boundaries admits the
same rows. Across different batchings the admitted SET can differ for
keys straddling the cap (an online operator sees arrival order, not the
global order the batch twin sorts by) — the batch-parity claim is exact
for single-batch input and for any input whose per-key arrival order
matches the batch sort order, which the parity test pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cap_per_key_stream(
    df: DataFrame,
    max_per_key: int,
    key_col: str = "domain",
    order_col: str = "doc_id",
) -> DataFrame:
    """Streaming DataFrame → (key, order_col, rank_in_key) rows for the
    first `max_per_key` admissions of each key (append mode)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def admit(key, pdfs, state):
        seen = state.get[0] if state.exists else 0
        out_ord, out_rank = [], []
        for pdf in pdfs:
            for v in sorted(pdf[order_col]):
                if seen >= max_per_key:
                    break
                seen += 1
                out_ord.append(v)
                out_rank.append(seen)
        state.update((seen,))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(out_ord),
                order_col: out_ord,
                "rank_in_key": out_rank,
            }
        )

    return df.select(key_col, order_col).groupBy(key_col).applyInPandasWithState(
        admit,
        outputStructType=f"{key_col} string, {order_col} long, rank_in_key long",
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
