"""Stream-static point-in-time enrichment: the streaming twin of
operators/cdc.temporal_dim_join (q139).

A fact stream (clicks, orders, telemetry) joins the dimension VERSION
valid at each fact's event time, against a STATIC SCD2 history table.
Spark runs stream-static joins statelessly — each micro-batch joins
against the static side — so this is the cheap, watermark-free form of
temporal enrichment: no state store, no late-data bookkeeping, exactly
the batch operator's semantics per batch.

Semantics to know (documented, not hidden):
  * The static dim is re-read per micro-batch by Spark's design. If
    the SCD2 table is being appended to concurrently, different
    batches can see different dim snapshots; pin a snapshot (cache()
    the dim, or read a fixed version of the table) when runs must be
    reproducible — the parity test pins the cached form.
  * Facts with no valid version at their timestamp keep NULL dim
    columns (left join) — identical to the batch operator.
  * Row-level results are a pure function of (fact row, dim snapshot):
    replay, batch-boundary changes, and arrival order cannot change
    them — the strongest determinism class in the streaming family
    (stateless), pinned by the any-batching parity test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.cdc import temporal_dim_join


def temporal_enrich_stream(
    stream_facts: DataFrame,
    dim_history: DataFrame,
    key_col: str,
    fact_ts_us_col: str = "ts_us",
    valid_from_col: str = "valid_from_us",
    valid_to_col: str = "valid_to_us",
) -> DataFrame:
    """Streaming facts -> facts + the dim version valid at event time.
    `stream_facts` is a streaming DataFrame; `dim_history` a static
    SCD2 table (cache it for snapshot stability). Returns a streaming
    DataFrame (append mode; stateless)."""
    return temporal_dim_join(
        stream_facts,
        dim_history,
        key_col,
        fact_ts_us_col=fact_ts_us_col,
        valid_from_col=valid_from_col,
        valid_to_col=valid_to_col,
        how="left",
    )
