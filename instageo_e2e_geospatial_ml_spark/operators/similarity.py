"""Similarity search over embedding columns (array<float>).

Quantized-integer scoring: elements are scaled (×1000) and rounded to
int64 before the dot product, making scores order-independent exact
integers — bit-identical across engines (the DuckDB oracle) and across
shuffle orders (no float-sum nondeterminism). Ranking quality at 3 decimal
digits of precision is unchanged for normalized embeddings.

  * brute_force_topk: exact baseline — query×corpus dot-product join +
    window rank. O(Q·N) — the correctness oracle and fine for small Q.
  * lsh_buckets / lsh_topk: sign-random-projection LSH — md5-derived
    deterministic integer weights; candidates share a bucket → the scale
    path (candidate set shrinks by ~2^bits).
  * ivf_topk: IVF-style two-stage — coarse centroid assign (provided
    centroids table) + search only the best nprobe inverted lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _quant(col: Column) -> Column:
    """element → round(double(element)*1000) as int64 (engine-portable)."""
    return F.round(col.cast("double") * 1000).cast("long")


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two array<float> columns.

    Measured note: the zip_with/aggregate shape beats an unrolled
    element_at chain (the HOF scans the array storage contiguously;
    per-index element_at re-derives offsets and defeats JIT inlining at
    dim 64) — keep this shape. Parallelism, not expression form, is the
    lever on cross scores: callers must ensure the fact side has enough
    partitions (a single-file parquet scan otherwise runs one task)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _quant(x) * _quant(y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    qid: str = "qid",
    pid: str = "pid",
    qvec: str = "qvec",
    pvec: str = "pvec",
    exclude_self: bool = True,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact top-k by quantized dot product: (qid, pid, dot, rank).

    Fast path: the (small by contract) query set is collected into an int64
    numpy matrix, sc.broadcast once (NOT closure-captured — closures are
    re-serialized per task), and scored in a mapInPandas over corpus
    partitions — one exact int64 matmul per Arrow batch, then per-partition
    top-k pruning (≤ k rows per query per partition cross the shuffle) and
    a final window rank. ~100× the zip_with/aggregate expression path while
    producing bit-identical integer scores.

    Guarded by max_queries: a miscall with a huge query side raises loudly
    instead of OOM-ing the driver. For query sets beyond the cap, use
    lsh_topk / ivf_topk (the at-scale entries).
    """
    import numpy as np
    import pandas as pd

    def _q(m: "np.ndarray") -> "np.ndarray":
        # round half AWAY FROM ZERO — matches Spark/DuckDB round(), not
        # numpy's banker's rounding
        return (np.sign(m) * np.floor(np.abs(m) * 1000.0 + 0.5)).astype(np.int64)

    q_rows = queries.select(qid, qvec).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"brute_force_topk capped at {max_queries} queries; "
            "use lsh_topk/ivf_topk for large query sets"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = _q(np.array([r[1] for r in q_rows], dtype=np.float64))
    bc = queries.sparkSession.sparkContext.broadcast((q_ids, qm))

    def score(it):
        q_ids, qm = bc.value
        for pdf in it:
            pids = pdf[pid].to_numpy(np.int64)
            pm = _q(np.stack(pdf[pvec].map(lambda v: np.asarray(v, dtype=np.float64))))
            dots = pm @ qm.T  # (n, q) exact int64
            out_q, out_p, out_d = [], [], []
            for j in range(qm.shape[0]):
                col = dots[:, j]
                mask = pids != q_ids[j] if exclude_self else np.ones(len(pids), bool)
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                # partial top-k by (dot desc, pid asc)
                order = np.lexsort((pids[idx], -col[idx]))[:k]
                sel = idx[order]
                out_q.extend([q_ids[j]] * len(sel))
                out_p.extend(pids[sel])
                out_d.extend(col[sel])
            yield pd.DataFrame({qid: out_q, pid: out_p, "dot": out_d})

    cand = corpus.select(pid, pvec).mapInPandas(
        score, f"{qid} long, {pid} long, dot long"
    )
    w = Window.partitionBy(qid).orderBy(F.col("dot").desc(), F.col(pid).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, pid, "dot", "rank")
    )


def _proj_weight(j: Column | int, i: Column, seed: str = "lsh") -> Column:
    """Deterministic pseudo-random integer weight in [-1000, 1000] from
    md5(seed:j:i) — identical in any engine with md5 + hex→int."""
    jj = F.lit(j) if isinstance(j, int) else j
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), jj.cast("string"), i.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return h % 2001 - 1000


def lsh_buckets(
    vecs: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 8,
    seed: str = "lsh",
) -> DataFrame:
    """(id, bucket): sign-random-projection bucket id with n_bits planes.

    All-integer: quantized elements × md5 weights, summed exactly.
    """
    el = vecs.select(
        id_col,
        F.posexplode(vec_col).alias("i", "e"),
    ).withColumn("eq", _quant(F.col("e")))
    votes = (
        el.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))))
        .withColumn("w", _proj_weight(F.col("j"), F.col("i"), seed))
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("eq") * F.col("w")).alias("proj"))
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("proj") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0)
        ).alias("bucket")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    qid: str = "qid",
    pid: str = "pid",
    qvec: str = "qvec",
    pvec: str = "pvec",
    n_bits: int = 8,
    multi_probe: bool = False,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: only candidates sharing the LSH bucket are scored.

    Recall < 1 by design (bucketing). multi_probe=True additionally probes
    every single-bit-flip neighbor of each query's bucket (the standard
    multi-probe recall knob): the query side explodes into n_bits+1 probe
    buckets — all distinct, and each corpus row lives in exactly one
    bucket, so a (query, candidate) pair still joins at most once (no
    dedup needed). Cost: the broadcast query side grows ×(n_bits+1);
    corpus-side work grows only with the extra candidates actually
    matched.

    broadcast_queries=True fits the interactive-lookup shape (query set
    small by contract). For the corpus-scale shape — a full kNN graph
    where queries == corpus (LLM-dedup's canonical use) — pass False: the
    candidate join then shuffles both sides on the bucket key instead of
    broadcasting a corpus-sized query table to every executor (AQE still
    picks a broadcast at runtime when the query side is genuinely small)."""
    qb = lsh_buckets(queries.select(F.col(qid).alias("_id"), F.col(qvec).alias("v")), "v", "_id", n_bits)
    pb = lsh_buckets(corpus.select(F.col(pid).alias("_id"), F.col(pvec).alias("v")), "v", "_id", n_bits)
    q = queries.join(qb.select(F.col("_id").alias(qid), "bucket"), qid)
    p = corpus.join(pb.select(F.col("_id").alias(pid), "bucket"), pid)
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)],
        )
        q = q.withColumn("bucket", F.explode(probes))
    j = (
        (F.broadcast(q) if broadcast_queries else q)
        .join(p, "bucket")
        .filter(F.col(qid) != F.col(pid))
        .withColumn("dot", int_dot(F.col(qvec), F.col(pvec)))
    )
    w = Window.partitionBy(qid).orderBy(F.col("dot").desc(), F.col(pid).asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, pid, "dot", "rank")
    )


def label_centroids(
    vecs: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    assemble: bool = False,
) -> DataFrame:
    """Per-label centroid of an embedding column — the IVF coarse-quantizer
    builder (feed the assembled form into ivf_topk as `centroids`).

    Exactness: elements are quantized ×1000 to int64 and SUMMED exactly
    (integer partial aggregation, order-independent), then one fixed-shape
    division produces the double centroid — deterministic across shuffle
    orders and engines, unlike a float avg().

    assemble=False → long form (label, i, c) for value checks;
    assemble=True → (cid, cvec array<float>) ready for ivf_topk.
    """
    el = vecs.select(
        F.col(label_col).alias("cid"), F.posexplode(vec_col).alias("i", "e")
    ).withColumn("eq", _quant(F.col("e")))
    agg = el.groupBy("cid", "i").agg(
        F.sum("eq").alias("s"), F.count(F.lit(1)).alias("n")
    )
    long_form = agg.select(
        "cid",
        (F.col("i") + 1).alias("i"),  # 1-based, matching SQL array indexing
        F.round(F.col("s") / (F.col("n") * F.lit(1000.0)), 6).alias("c"),
    )
    if not assemble:
        return long_form
    return long_form.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
        ).cast("array<float>").alias("cvec")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    qid: str = "qid",
    pid: str = "pid",
    qvec: str = "qvec",
    pvec: str = "pvec",
    cid: str = "cid",
    cvec: str = "cvec",
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF: assign corpus rows to their nearest centroid (inverted lists),
    probe the nprobe closest lists per query, exact-score within them.

    Scale notes: the corpus→centroid assignment is a broadcast cross score
    + map-side `max(struct(cdot, -cid))` aggregation — partial aggregation
    combines the C candidate rows per vector inside each task, so the one
    shuffle moves N rows, not N×C (a window rank would shuffle the full
    cross product). At real scale the assignment is computed once and
    persisted with the list id as a partition key → partition pruning per
    query batch. The centroid table (k rows) is always broadcast; the
    QUERY side is broadcast only when broadcast_queries=True (the
    interactive-lookup contract) — for corpus-scale query sets (full
    kNN-graph builds where queries == corpus) pass False and the probe
    join shuffles both sides on the list id instead (AQE still broadcasts
    a genuinely small side at runtime).
    """
    # corpus side: top-1 centroid by (cdot desc, cid asc) via max(struct)
    pj = corpus.crossJoin(F.broadcast(centroids)).withColumn(
        "cdot", int_dot(F.col(pvec), F.col(cvec))
    )
    p = (
        pj.groupBy(pid)
        .agg(
            F.max(F.struct(F.col("cdot"), (-F.col(cid)).alias("_nc"))).alias("_m"),
            F.first(pvec).alias(pvec),
        )
        .withColumn(cid, -F.col("_m._nc"))
        .drop("_m")
    )

    # query side: nprobe lists per query (small side — window rank is fine)
    qj = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "cdot", int_dot(F.col(qvec), F.col(cvec))
    )
    wq = Window.partitionBy(qid).orderBy(F.col("cdot").desc(), F.col(cid).asc())
    q = (
        qj.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .drop("cdot", "crank", cvec)
    )
    j = (
        (F.broadcast(q) if broadcast_queries else q)
        .join(p, cid)
        .filter(F.col(qid) != F.col(pid))
        .withColumn("dot", int_dot(F.col(qvec), F.col(pvec)))
    )
    w = Window.partitionBy(qid).orderBy(F.col("dot").desc(), F.col(pid).asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, pid, "dot", "rank")
    )


def train_centroids(
    vecs: DataFrame,
    k: int = 8,
    n_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    materialize: bool = True,
) -> DataFrame:
    """Distributed k-means (Lloyd) over an embedding column → (cid,
    c: array<long>) centroids in the ×1000-quantized integer domain —
    the unsupervised IVF coarse-quantizer builder (label_centroids needs a
    label column; corpora have none). Reference analogue: the splitter's
    KMeans cascade (data_splitter.py:856-950), which runs driver-side over
    a tiny per-tile table; this is the full-corpus distributed form.

    Every quantity is integer-exact and engine-portable (DuckDB oracle):
      * seed: the k vectors ranked first by md5(id) — a deterministic
        pseudo-random draw computed as a distributed partial top-k
        (TakeOrderedAndProject), not a global sort;
      * assign: argmin ||v − c||² = argmax(2·v·c − |c|²) over quantized
        int64 elements, as a broadcast cross-score + map-side
        max(struct(score, −cid)) aggregation — the one shuffle per round
        moves N rows, not N×k (the ivf_topk assignment pattern);
      * update: per-(cluster, dim) exact integer sums via posexplode +
        map-side partial aggregation, one fixed-shape round(sum/n) per
        element (half-away-from-zero in both engines). Measured note: a
        "de-exploded" single-aggregate form (one sum(element_at(v, i))
        per dimension in one hash aggregate) was tried and REVERTED — at
        dim 64 the 64 aggregate expressions bloat the generated code and
        run ~2× slower end to end (3.0 s vs 1.4 s per training at bench
        scale), while the posexplode never materializes the ×dim rows:
        it pipelines straight into a k×dim-group hash aggregate whose
        map-side combine keeps the shuffle at k×dim rows per task
        regardless of corpus size.

    Empty clusters are dropped (k may shrink — the standard Lloyd
    degeneracy; k-means‖ style re-seeding is a caller concern). Each
    round's centroid table (≤ k rows) is cut from the lineage with a lazy
    localCheckpoint so the iterative plan doesn't grow exponentially
    (pass materialize=False for explain-only use).

    Feed the result through centroids_as_vectors() for ivf_topk.
    """
    zero = F.lit(0).cast("long")
    q = vecs.select(
        id_col, F.transform(F.col(vec_col), lambda e: _quant(e)).alias("v")
    )
    if materialize:
        q = q.localCheckpoint(eager=False)

    # deterministic seeding: distributed top-k by hash order
    seeds = (
        q.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(k)
    )
    cents = seeds.withColumn(
        # partition-less window over the limit(k) seed rows only (k
        # centroids, never the corpus) — bounded at any input size
        "cid", F.row_number().over(Window.orderBy("_h", F.col(id_col)))
    ).select("cid", F.col("v").alias("c"))

    for _ in range(n_iters):
        scored = (
            q.crossJoin(F.broadcast(cents))
            .withColumn(
                "score",
                F.lit(2)
                * F.aggregate(
                    F.zip_with("v", "c", lambda x, y: x * y), zero, lambda a, x: a + x
                )
                - F.aggregate("c", zero, lambda a, x: a + x * x),
            )
        )
        assigned = (
            scored.groupBy(id_col)
            .agg(
                F.max(F.struct(F.col("score"), (-F.col("cid")).alias("_nc"))).alias("_m"),
                F.first("v").alias("v"),
            )
            .select(id_col, (-F.col("_m._nc")).alias("cid"), "v")
        )
        upd = (
            assigned.select("cid", F.posexplode("v").alias("i", "e"))
            .groupBy("cid", "i")
            .agg(F.round(F.sum("e") / F.count(F.lit(1))).cast("long").alias("ce"))
        )
        cents = upd.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "ce"))), lambda s: s["ce"]
            ).alias("c")
        )
        if materialize:
            cents = cents.localCheckpoint(eager=False)
    return cents


def centroids_as_vectors(cents: DataFrame) -> DataFrame:
    """(cid, c array<long>) from train_centroids → (cid, cvec array<float>)
    in the embedding domain, ready for ivf_topk."""
    return cents.select(
        "cid",
        F.transform("c", lambda x: x / F.lit(1000.0)).cast("array<float>").alias("cvec"),
    )


def pq_adc_topk(
    vecs: DataFrame,
    query_id: int = 0,
    m: int = 4,
    k: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    topk: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product quantization with asymmetric-distance (ADC) search — the
    FAISS IVF-PQ memory layout that makes billion-vector ANN fit RAM:
    split each vector into `m` subvectors, train an independent `k`-entry
    codebook per subspace (the SAME exact-integer Lloyd as
    train_centroids, applied to slices — DuckDB-twin exact), encode
    every vector as m small codes, and score a query by summing per-
    subspace lookup scores 2·q_m·c − |c|² over the codes (monotone in
    ||q − v̂||² against the reconstruction v̂).

    100 TB shape: codebooks are m×k rows (broadcast); encoding is a
    subspace explode (×m) into a broadcast join + map-side argmax —
    one shuffle of N×m → N rows; the ADC table is m×k values computed
    once and broadcast; the scan is a broadcast hash join + partial
    top-k (TakeOrdered), never a global sort. The stored index is
    m·log2(k) bits per vector instead of dim·32.

    Returns the top-`topk` (pid, adc_score, rank) for `query_id`,
    deterministic (score desc, id asc). Exact DuckDB twin: q60."""
    if dim % m:
        raise ValueError("dim must divide evenly into m subspaces")
    sub = dim // m
    zero = F.lit(0).cast("long")

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), zero, lambda acc, x: acc + x
        )

    def _norm(a):
        return F.aggregate(a, zero, lambda acc, x: acc + x * x)

    qv = vecs.select(
        id_col, F.transform(F.col(vec_col), lambda e: _quant(e)).alias("v")
    ).localCheckpoint(eager=False)

    books = None
    for mi in range(m):
        sl = vecs.select(
            id_col, F.slice(F.col(vec_col), mi * sub + 1, sub).alias(vec_col)
        )
        cb = train_centroids(
            sl, k=k, n_iters=n_iters, vec_col=vec_col, id_col=id_col
        ).withColumn("m", F.lit(mi))
        books = cb if books is None else books.unionByName(cb)
    books = books.localCheckpoint(eager=False)  # m*k tiny rows

    # encode: subspace explode -> broadcast codebook join -> argmax
    parts = F.array(
        *[
            F.struct(
                F.lit(mi).alias("m"),
                F.slice("v", mi * sub + 1, sub).alias("sv"),
            )
            for mi in range(m)
        ]
    )
    ex = qv.select(id_col, F.explode(parts).alias("p")).select(
        id_col, F.col("p.m").alias("m"), F.col("p.sv").alias("sv")
    )
    scored = ex.join(F.broadcast(books), "m").withColumn(
        "score", F.lit(2) * _dot("sv", "c") - _norm("c")
    )
    codes = (
        scored.groupBy(id_col, "m")
        .agg(F.max(F.struct(F.col("score"), (-F.col("cid")).alias("_nc"))).alias("_x"))
        .select(id_col, "m", (-F.col("_x._nc")).alias("code"))
    )

    # ADC lookup table for the query: m*k scores, broadcast
    qrow = qv.filter(F.col(id_col) == query_id).select(F.col("v").alias("qv"))
    adc = (
        books.crossJoin(F.broadcast(qrow))
        .withColumn(
            "qs",
            F.lit(2) * _dot(F.slice("qv", F.col("m") * sub + 1, sub), "c")
            - _norm("c"),
        )
        .select("m", "cid", "qs")
    )
    total = (
        codes.join(
            F.broadcast(adc),
            (codes["m"] == adc["m"]) & (codes["code"] == adc["cid"]),
        )
        .groupBy(id_col)
        .agg(F.sum("qs").cast("long").alias("adc_score"))
        .filter(F.col(id_col) != query_id)
    )
    top = total.orderBy(F.col("adc_score").desc(), F.col(id_col)).limit(topk)
    # rank over the <= topk surviving rows only (bounded window)
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("adc_score").desc(), F.col(id_col))
        ).cast("long"),
    ).select(F.col(id_col).alias("pid"), "adc_score", "rank")
