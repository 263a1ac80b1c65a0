"""Online (streaming) MinHash-LSH near-duplicate detection.

The batch pipeline (operators/dedup.minhash_lsh_dedup) self-joins LSH
band buckets — inherently offline. This is the streaming twin as a
custom stateful operator: per-band-bucket GroupState remembers the
bucket's KEEPER (first document ever seen in it); each later arrival
emits one candidate edge (keeper, doc). Star edges to the keeper connect
exactly the same documents a full within-bucket pair join connects, so
connected-component clustering over the streamed edges yields the SAME
clusters as over the batch pairs — verified by the parity test.

Scale notes — the streaming form is actually STRONGER against skew than
the batch join: a degenerate bucket (empty docs, boilerplate) produces
O(n) star edges instead of O(n²) join rows, so no bucket cap is needed;
state is O(1) per distinct bucket (one keeper id). At 10^12-doc scale
the state store is bounded by the distinct-bucket count — the same
cardinality the batch join shuffles on. For unbounded-retention concerns
use the state-TTL knob of the surrounding deployment (the operator keeps
buckets forever by design: a near-dup of a year-old document is still a
near-dup).

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
) -> DataFrame:
    """(id, sig array<bigint>) computed per row — streaming-safe (no
    aggregation) and bit-identical to operators/dedup.minhash_signatures.
    Documents with fewer than shingle_n tokens get no signature (dropped),
    matching the batch shingle filter."""
    import pandas as pd

    def sig_batch(it):
        for pdf in it:
            out_ids, out_sigs = [], []
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
            yield pd.DataFrame({id_col: out_ids, "sig": out_sigs})

    return docs.select(id_col, text_col).mapInPandas(
        sig_batch, f"{id_col} long, sig array<long>"
    )


def neardup_pairs_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Streaming LSH candidate edges: (doc_a, doc_b, band_id) where doc_a
    is the band bucket's keeper and doc_b a later arrival sharing it.
    Within one micro-batch the keeper is the minimum id (deterministic
    replay); across batches the established keeper persists in state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    sigs = minhash_signature_rows(docs, text_col, id_col, shingle_n, num_hashes)
    bands = sigs.select(
        F.col(id_col).alias("doc"), F.inline(_band_structs(num_hashes, rows_per_band))
    )

    def proc(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        ids = sorted(int(d) for d in rows["doc"].unique())
        if state.exists:
            (keeper,) = state.get
        else:
            keeper = ids[0]
            state.update((keeper,))
        out = [
            (keeper, d, int(key[0]))
            for d in ids
            if d != keeper
        ]
        yield pd.DataFrame(out, columns=["doc_a", "doc_b", "band_id"])

    return bands.groupBy("band_id", "band_key").applyInPandasWithState(
        proc,
        outputStructType="doc_a long, doc_b long, band_id int",
        stateStructType="keeper long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
