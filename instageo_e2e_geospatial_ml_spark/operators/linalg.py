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
            x = np.stack(pdf[vec_col].to_numpy())
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
