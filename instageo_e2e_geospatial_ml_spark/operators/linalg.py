"""Distributed dense linear algebra for embedding columns — the Gram /
covariance accumulation behind PCA, whitening, and linear probes.

The 100 TB shape: G = Xᵀ X decomposes into per-partition partials
(G = Σ_p Xᵀ_p X_p), so each task runs ONE numpy matmul over its Arrow
batch and emits d(d+1)/2 upper-triangle cells; the shuffle then carries
partials·cells, never rows — the classic "compute the d×d sufficient
statistic distributed, eigensolve the tiny result on the driver"
pattern. d=64 → 2080 cells per partial; a billion rows reduce to
partitions×2080 integers.

Exactness: vectors are quantized to integers first (×scale,
round-half-away-from-zero — the repo's ANN convention), so every
product and sum is exact bigint and the oracle can pin every cell.
|q| ≤ scale·max|x| keeps Σ q_i q_j far under 2^63 for embedding-norm
data at any realistic row count (bound documented, not enforced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(
    vectors: DataFrame,
    vec_col: str = "embedding",
    scale: int = 100,
) -> DataFrame:
    """Exact integer Gram matrix of quantized vectors: one row per
    upper-triangle cell (i, j, g), 1-indexed, g = Σ_rows q_i q_j with
    q = sign(x)·floor(|x|·scale + 0.5). mapInPandas partial matmuls +
    one (i, j)-keyed sum."""
    import pandas as pd

    def partials(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # float64 BEFORE quantizing (the similarity.py convention):
            # Arrow array<float> is float32, and abs(x)*scale+0.5 in
            # f32 rounds differently than the oracle's CAST AS DOUBLE
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = (np.sign(x) * np.floor(np.abs(x) * scale + 0.5)).astype(
                np.int64
            )
            g = q.T @ q
            iu, ju = np.triu_indices(g.shape[0])
            yield pd.DataFrame(
                {
                    "i": (iu + 1).astype("int32"),
                    "j": (ju + 1).astype("int32"),
                    "g": g[iu, ju],
                }
            )

    cells = vectors.select(vec_col).mapInPandas(
        partials, "i int, j int, g long"
    )
    return cells.groupBy("i", "j").agg(F.sum("g").alias("g"))


def gram_matrix_sql(
    table_sql: str, vec_col: str = "embedding", dim: int = 64, scale: int = 100
) -> str:
    """The identical exact Gram accumulation as DuckDB SQL (position
    pairs via generate_series; quantization shape matches numpy's
    sign·floor(|x|·scale+0.5))."""
    return f"""
WITH pos AS (
  SELECT a.i, b.j
  FROM (SELECT unnest(generate_series(1, {dim})) AS i) a,
       (SELECT unnest(generate_series(1, {dim})) AS j) b
  WHERE a.i <= b.j
),
q AS (
  SELECT list_transform(
           {vec_col},
           x -> CAST(sign(x) * floor(abs(CAST(x AS DOUBLE)) * {scale} + 0.5)
                     AS BIGINT)
         ) AS qv
  FROM ({table_sql})
)
SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j,
       CAST(sum(qv[p.i] * qv[p.j]) AS BIGINT) AS g
FROM q, pos p
GROUP BY 1, 2
"""


def jl_project(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    d_out: int = 16,
    scale: int = 100,
    salt: str = "jl",
) -> DataFrame:
    """Johnson-Lindenstrauss sign projection (Achlioptas 2003): y = q R
    with R[i,k] = ±1 derived from md5(salt:i:k) — a projection matrix
    that is a pure FUNCTION, never materialized or broadcast, identical
    on every engine and every rerun (the reproducibility property a
    training pipeline needs: re-projecting a shard months later yields
    bit-identical features). Input vectors quantize to integers first
    (the gram_matrix convention), so outputs are exact bigints.

    Plan: one mapInPandas; each task builds the d_in×d_out sign matrix
    locally from md5 (tiny, deterministic) and runs one numpy matmul
    per Arrow batch. Output is (id, k, y) long-form — k is 1-indexed."""
    import pandas as pd

    def project(batches):
        import hashlib

        import numpy as np

        r = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if r is None:
                d_in = x.shape[1]
                r = np.empty((d_in, d_out), dtype=np.int64)
                for i in range(d_in):
                    for k in range(d_out):
                        h = hashlib.md5(
                            f"{salt}:{i + 1}:{k + 1}".encode()
                        ).hexdigest()
                        r[i, k] = 1 if int(h[0], 16) < 8 else -1
            q = (np.sign(x) * np.floor(np.abs(x) * scale + 0.5)).astype(
                np.int64
            )
            y = q @ r
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), d_out),
                    "k": np.tile(np.arange(1, d_out + 1), n).astype("int32"),
                    "y": y.reshape(-1),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, k int, y long"
    )


def jl_project_sql(
    table_sql: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    d_in: int = 64,
    d_out: int = 16,
    scale: int = 100,
    salt: str = "jl",
) -> str:
    """The identical deterministic sign projection as DuckDB SQL: the
    sign matrix regenerates from md5 the same way (first hex nibble
    < 8 -> +1), positions pair via generate_series."""
    return f"""
WITH r AS (
  SELECT i.i, k.k,
         CASE WHEN CAST('0x' || substring(
                md5('{salt}:' || CAST(i.i AS VARCHAR) || ':' || CAST(k.k AS VARCHAR)),
                1, 1) AS BIGINT) < 8
              THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(generate_series(1, {d_in})) AS i) i,
       (SELECT unnest(generate_series(1, {d_out})) AS k) k
),
q AS (
  SELECT {id_col}, list_transform(
           {vec_col},
           x -> CAST(sign(x) * floor(abs(CAST(x AS DOUBLE)) * {scale} + 0.5)
                     AS BIGINT)
         ) AS qv
  FROM ({table_sql})
)
SELECT q.{id_col}, CAST(r.k AS INTEGER) AS k,
       CAST(sum(qv[r.i] * r.s) AS BIGINT) AS y
FROM q, r
GROUP BY 1, 2
"""
