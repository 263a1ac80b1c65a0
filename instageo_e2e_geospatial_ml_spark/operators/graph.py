"""Link-graph analytics: PageRank in exact integer arithmetic.

PageRank (Brin & Page 1998) is the standard importance prior for
web-crawl curation — Common Crawl releases per-host ranks, and quality
pipelines (e.g. the original PageRank-seeded WebText recipe) filter or
weight documents by it. A 100 TB crawl's link graph is far past
driver-side NetworkX; the Spark-native shape is the classic iterative
join-aggregate: contributions flow along edges (join on src), fold at
the destination (groupBy dst), plus a teleport term.

Engine-exactness: floating-point PageRank sums in shuffle order and
never hash-matches a second engine. Here every step is integer:
initial mass floor(SCALE / N) per node, per-edge transfer
floor(floor(score * d_num / d_den) / outdeg), teleport
floor(SCALE * (d_den - d_num) / d_den / N). Floor division is the same
operation in Spark (`div`) and DuckDB (`//`), so a fixed iteration
count yields bit-identical scores — the q88 oracle is the unrolled
3-round CTE chain. Mass lost to flooring and to dangling nodes is NOT
redistributed (documented deviation from the renormalizing variant;
deterministic, and immaterial for ranking use).

Scale: each round is one shuffle on dst (the join on src co-partitions
with the edge list after the first round under AQE). Skewed in-degree
(every real web graph) is the known hazard — the groupBy(dst).sum is a
partial-aggregating hash agg, so hot destinations combine map-side;
edge storage pre-bucketed by src turns the per-round join into a
co-located probe.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # 1e12 integer mass units


def pagerank_int(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """(src, dst) edge list -> (node, score, in_deg, out_deg) after
    `iters` exact integer PageRank rounds (see module docstring).
    Duplicate edges are collapsed first (a double link is one vote)."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    indeg = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n"))

    pr = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.expr(f"{PR_SCALE} div n").alias("score")
    )
    teleport = F.expr(
        f"{PR_SCALE} * {damp_den - damp_num} div {damp_den} div n"
    )
    for _ in range(iters):
        contrib = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .join(F.broadcast(outdeg.withColumnRenamed("node", "src")), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"score * {damp_num} div {damp_den} div out_deg"
                ).alias("send"),
            )
            .groupBy("node")
            .agg(F.sum("send").alias("recv"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (teleport + F.coalesce(F.col("recv"), F.lit(0))).alias("score"),
            )
        )
    return (
        pr.join(F.broadcast(indeg), "node", "left")
        .join(F.broadcast(outdeg), "node", "left")
        .select(
            "node", "score",
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        )
    )


def pagerank_sql(
    edges_sql: str,
    iters: int = 3,
    damp_num: int = 85,
    damp_den: int = 100,
) -> str:
    """The identical computation as a DuckDB CTE chain (oracle twin):
    `edges_sql` must select columns src, dst."""
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "outdeg AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY 1)",
        "indeg AS (SELECT dst AS node, count(*) AS in_deg FROM e GROUP BY 1)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"pr0 AS (SELECT node, {PR_SCALE} // n AS score FROM nodes CROSS JOIN nn)",
    ]
    tele = f"{PR_SCALE} * {damp_den - damp_num} // {damp_den} // n"
    for i in range(iters):
        parts.append(
            f"c{i + 1} AS (SELECT e.dst AS node, "
            f"CAST(sum(p.score * {damp_num} // {damp_den} // o.out_deg) AS BIGINT) AS recv "
            f"FROM e JOIN pr{i} p ON p.node = e.src "
            f"JOIN outdeg o ON o.node = e.src GROUP BY 1)"
        )
        parts.append(
            f"pr{i + 1} AS (SELECT nodes.node, "
            f"{tele} + COALESCE(c.recv, 0) AS score "
            f"FROM nodes CROSS JOIN nn LEFT JOIN c{i + 1} c ON c.node = nodes.node)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT p.node, CAST(p.score AS BIGINT) AS score, "
        f"COALESCE(i.in_deg, 0) AS in_deg, COALESCE(o.out_deg, 0) AS out_deg "
        f"FROM pr{iters} p "
        f"LEFT JOIN indeg i ON i.node = p.node "
        f"LEFT JOIN outdeg o ON o.node = p.node"
    )
