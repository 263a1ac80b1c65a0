"""Streaming heavy hitters: a sharded Misra-Gries summary — the online
twin of functions/text.heavy_hitter_tokens (the exact batch gate).

A continuous ingest pipeline cannot re-count the full token stream per
micro-batch; it needs a bounded sketch. Misra-Gries keeps at most
`capacity` counters per shard and guarantees, after n tokens on a shard,
  est(t)  <=  true(t)  <=  est(t) + n/(capacity+1)
so every token with true share > 1/(capacity+1) of the shard stream is
present in the summary (no false negatives above the share bound).

Batch merge form (Agarwal et al., "Mergeable Summaries", PODS'12): each
micro-batch's token counts are aggregated first, added to the summary,
then the (capacity+1)-th largest count is subtracted from every counter
and non-positive ones are dropped. Merging whole-batch counts instead of
decrement-per-token makes the summary independent of row order inside a
micro-batch — all Arrow chunks for a shard are gathered before counting
(applyInPandasWithState chunking is not deterministic across replays,
the streaming/caps.py lesson) — so a replay with the same batch
boundaries reproduces the summary bit-for-bit.

Sharding: tokens hash to `n_shards` state keys, so (a) state is
n_shards x capacity counters regardless of vocabulary size, and (b) each
token's whole stream lands on one shard — the per-shard MG bound applies
to the token's TRUE global count. At 100 TB the state store scales with
n_shards x capacity only; raise capacity to tighten the error bound,
n_shards for parallelism.

Emission (update mode): a full per-shard snapshot each batch, tagged
with the shard's cumulative token count n_seen — readers take the
max-n_seen snapshot per shard as current.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters_stream(
    df: DataFrame,
    capacity: int = 8,
    tok_col: str = "tok",
    n_shards: int = 4,
) -> DataFrame:
    """Streaming DataFrame with a token column → per-shard Misra-Gries
    snapshots (shard, n_seen, tok, est). est undercounts by at most
    n_seen/(capacity+1)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        from collections import Counter

        if state.exists:
            n, toks, cnts = state.get
            summ = dict(zip(toks, cnts))
        else:
            n, summ = 0, {}
        batch = Counter()
        # gather every chunk before counting: chunk boundaries are not
        # deterministic and must not influence the summary
        for pdf in pdfs:
            for t in pdf[tok_col]:
                batch[str(t)] += 1
        n += sum(batch.values())
        for t, c in batch.items():
            summ[t] = summ.get(t, 0) + c
        if len(summ) > capacity:
            d = sorted(summ.values(), reverse=True)[capacity]
            summ = {t: c - d for t, c in summ.items() if c > d}
        state.update((n, list(summ.keys()), [summ[t] for t in summ]))
        out = sorted(summ)
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(out),
                "n_seen": [n] * len(out),
                "tok": out,
                "est": [summ[t] for t in out],
            }
        )

    sharded = df.select(
        F.pmod(F.hash(F.col(tok_col)), F.lit(n_shards)).alias("shard"),
        F.col(tok_col).cast("string").alias(tok_col),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType="shard int, n_seen long, tok string, est long",
        stateStructType="n_seen long, toks array<string>, cnts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
