"""Online (streaming) MinHash-LSH near-duplicate detection.

The batch pipeline (operators/dedup.minhash_lsh_dedup) self-joins LSH
band buckets — inherently offline. This is the streaming twin as a
custom stateful operator: per-band-bucket GroupState remembers the
bucket's KEEPER (first document ever seen in it); each later arrival
emits one candidate edge (keeper, doc). Star edges to the keeper connect
exactly the same documents a full within-bucket pair join connects, so
connected-component clustering over the streamed edges yields the SAME
clusters as over the batch pairs FOR BUCKETS BELOW THE BATCH max_bucket
SKEW CAP — verified by the parity test; see neardup_pairs_stream's
docstring for the over-cap scope and the optional matching cap.

Scale notes — the streaming form is actually STRONGER against skew than
the batch join: a degenerate bucket (empty docs, boilerplate) produces
O(n) star edges instead of O(n²) join rows; state is O(1) per distinct
bucket (keeper id + member count). At 10^12-doc scale the state store is
bounded by the distinct-bucket count — the same cardinality the batch
join shuffles on. Unbounded retention is the default (a near-dup of a
year-old document is still a near-dup); the state_ttl_minutes knob
evicts idle buckets for bounded-state deployments.

Signatures are computed per row (pandas UDF over the document's own
shingles — no aggregation, no shuffle) with the exact integer minhash
family of the batch path (first 60 bits of md5('<j>:'||shingle)), so
streamed and batch band keys are bit-identical.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _band_structs(num_hashes: int, rows_per_band: int):
    n_bands = -(-num_hashes // rows_per_band)
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "|",
                    *[
                        F.col("sig")[j]
                        for j in range(
                            b * rows_per_band,
                            min((b + 1) * rows_per_band, num_hashes),
                        )
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )


def minhash_signature_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    ts_col: str | None = None,
) -> DataFrame:
    """(id, sig array<bigint>[, ts]) computed per row — streaming-safe (no
    aggregation) and bit-identical to operators/dedup.minhash_signatures.
    Documents with fewer than shingle_n tokens get no signature (dropped),
    matching the batch shingle filter. ts_col (optional) is passed through
    untouched for event-time state TTL downstream."""
    import pandas as pd

    def sig_batch(it):
        for pdf in it:
            out_ids, out_sigs, out_ts = [], [], []
            for r in pdf.itertuples(index=False):
                toks = str(getattr(r, text_col)).strip().split()
                if len(toks) < shingle_n:
                    continue
                shingles = {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                }
                sig = []
                for j in range(num_hashes):
                    pre = f"{j}:".encode()
                    sig.append(
                        min(
                            int(
                                hashlib.md5(pre + s.encode()).hexdigest()[:15], 16
                            )
                            for s in shingles
                        )
                    )
                out_ids.append(getattr(r, id_col))
                out_sigs.append(sig)
                if ts_col is not None:
                    out_ts.append(getattr(r, ts_col))
            out = {id_col: out_ids, "sig": out_sigs}
            if ts_col is not None:
                out[ts_col] = out_ts
            yield pd.DataFrame(out)

    cols = [id_col, text_col] + ([ts_col] if ts_col is not None else [])
    schema = f"{id_col} long, sig array<long>" + (
        f", {ts_col} timestamp" if ts_col is not None else ""
    )
    return docs.select(*cols).mapInPandas(sig_batch, schema)


def neardup_pairs_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
    state_ttl_minutes: float | None = None,
    ts_col: str = "ts",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming LSH candidate edges: (doc_a, doc_b, band_id) where doc_a
    is the band bucket's keeper and doc_b a later arrival sharing it.
    Within one micro-batch the keeper is the minimum id (deterministic
    replay); across batches the established keeper persists in state.

    Batch-parity scope: with max_bucket=None the streamed star edges
    connect the same documents as the batch within-bucket pair join FOR
    BUCKETS THE BATCH JOIN KEEPS, i.e. those below the batch operator's
    max_bucket skew cap. A degenerate bucket (empty/boilerplate docs)
    that the batch path anti-joins away still emits edges here unless you
    pass the same max_bucket: with it set, a bucket stops emitting edges
    once its cumulative membership exceeds the cap (the online mirror of
    the batch drop — an online operator cannot un-emit the first
    max_bucket edges the way the offline join drops the whole bucket, so
    parity under a cap is "no NEW edges past the cap", documented here
    rather than hidden). The cap counts ARRIVALS, not distinct documents:
    state stores only (keeper, count), so a doc_id that re-arrives in a
    later micro-batch re-emits its keeper edge and increments the count
    again. Duplicate edges are harmless downstream (connected components
    is idempotent over repeated edges — at-least-once semantics), but a
    bucket whose members are re-delivered heavily reaches the cap sooner
    than its distinct membership would; track a membership sketch in
    state instead if distinct-doc cap semantics ever matter.

    state_ttl_minutes bounds state for long-running deployments: a bucket
    whose last-seen EVENT TIME is older than the TTL when the watermark
    passes is evicted (EventTimeTimeout on `ts_col` with `watermark`,
    which the operator applies to the stream), and the bucket's next
    arrival re-elects a keeper. Event time — not processing time — keeps
    eviction replay-deterministic, and terminates drain runs
    (Trigger.AvailableNow): a ProcessingTimeTimeout operator reports
    "might have more timeouts" unconditionally, so an AvailableNow drain
    would spin no-data batches forever. Trade-off: edges across an
    eviction gap are lost (a doc arriving after eviction no longer links
    to pre-eviction members), so recall degrades exactly on buckets
    colder than the TTL — set it to the staleness your dedup policy
    tolerates, or leave None to keep buckets forever (a near-dup of a
    year-old doc is still a near-dup).  With the TTL on, `docs` must
    carry an event-time column `ts_col`."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    use_ttl = state_ttl_minutes is not None
    ttl_ms = int(state_ttl_minutes * 60 * 1000) if use_ttl else 0
    sigs = minhash_signature_rows(
        docs, text_col, id_col, shingle_n, num_hashes,
        ts_col=ts_col if use_ttl else None,
    )
    band_cols = [
        F.col(id_col).alias("doc"),
        F.inline(_band_structs(num_hashes, rows_per_band)),
    ]
    if use_ttl:
        sigs = sigs.withWatermark(ts_col, watermark)
        bands = sigs.select(F.col(ts_col).alias("_ts"), *band_cols)
        timeout_conf = GroupStateTimeout.EventTimeTimeout
        state_schema = "keeper long, seen long, last_ms long"
    else:
        bands = sigs.select(*band_cols)
        timeout_conf = GroupStateTimeout.NoTimeout
        state_schema = "keeper long, seen long"

    def proc(key, pdfs, state: GroupState):
        if use_ttl and state.hasTimedOut:
            # idle past TTL: drop the keeper; next arrival re-elects
            state.remove()
            yield pd.DataFrame(columns=["doc_a", "doc_b", "band_id"]).astype(
                {"doc_a": "int64", "doc_b": "int64", "band_id": "int32"}
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        ids = sorted(int(d) for d in rows["doc"].unique())
        last_ms = 0
        if state.exists:
            if use_ttl:
                keeper, seen, last_ms = state.get
            else:
                keeper, seen = state.get
        else:
            keeper, seen = ids[0], 1
        out = []
        for d in ids:
            if d == keeper:
                continue
            seen += 1
            if max_bucket is not None and seen > max_bucket:
                break
            out.append((keeper, d, int(key[0])))
        if use_ttl:
            batch_ms = int(rows["_ts"].max().value // 1_000_000)
            last_ms = max(last_ms, batch_ms)
            state.update((keeper, seen, last_ms))
            state.setTimeoutTimestamp(
                max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.update((keeper, seen))
        yield pd.DataFrame(out, columns=["doc_a", "doc_b", "band_id"])

    return bands.groupBy("band_id", "band_key").applyInPandasWithState(
        proc,
        outputStructType="doc_a long, doc_b long, band_id int",
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
