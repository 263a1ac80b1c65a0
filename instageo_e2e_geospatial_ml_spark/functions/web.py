"""Web-crawl curation columns: URL parsing, registrable-domain
extraction, per-domain caps.

A 100 TB web-crawl training pipeline curates by URL structure before it
ever reads document bytes: scheme/host/path filters, eTLD+1 grouping,
and per-domain document caps (the RefinedWeb/C4-style guard against a
single site dominating the corpus). Everything here is built from JVM
`pyspark.sql.functions` expressions (regexp/CASE/window — whole-stage
codegen, no Python in the hot path) and has exact DuckDB twins in the
driver registry (q56/q57).

The registrable-domain logic is a documented HEURISTIC: last two host
labels, or last three when the second-level label sits under a known
two-part public suffix (co.uk, com.au, ...). A production system would
broadcast-join the full public-suffix list — same plan shape, bigger
dimension table; the heuristic keeps the oracle twin exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# two-part public suffixes recognized by the heuristic (extend freely —
# at scale this becomes a broadcast-joined dimension table)
TWO_PART_SUFFIXES = ("co.uk", "com.au", "co.jp", "com.br", "ac.uk")


def synth_urls(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic URL column derived from (doc_id, source, lang) — the
    driver/test surface for URL operators (the synthetic corpus carries
    no URLs; derivation follows the q19 derived-column pattern so the
    DuckDB oracle can rebuild the identical values)."""
    did = F.col(id_col)
    scheme = F.when(did % 3 == 0, F.lit("https")).otherwise(F.lit("http"))
    tld = (
        F.when(did % 5 == 0, F.lit("com"))
        .when(did % 5 == 1, F.lit("org"))
        .when(did % 5 == 2, F.lit("co.uk"))
        .when(did % 5 == 3, F.lit("io"))
        .otherwise(F.lit("com.au"))
    )
    host = F.concat(
        F.substring(F.md5(did.cast("string")), 1, 2),
        F.lit(".example"),
        (did % 7).cast("string"),
        F.lit("."),
        tld,
    )
    path = F.concat(
        F.lit("/"), F.col("source"), F.lit("/p"), (did % 50).cast("string"),
        F.lit(".html"),
    )
    qs = F.when(
        did % 4 == 0, F.concat(F.lit("?ref="), F.col("lang"))
    ).otherwise(F.lit(""))
    return docs.withColumn(
        "url", F.concat(scheme, F.lit("://"), host, path, qs)
    )


def url_components(df: DataFrame, url_col: str = "url") -> DataFrame:
    """scheme / host / path / query columns via anchored regexps (all
    JVM-side; empty string where a part is absent)."""
    u = F.col(url_col)
    return (
        df.withColumn("scheme", F.regexp_extract(u, r"^([a-z]+)://", 1))
        .withColumn("host", F.regexp_extract(u, r"^[a-z]+://([^/?#]+)", 1))
        .withColumn("path", F.regexp_extract(u, r"^[a-z]+://[^/?#]+([^?#]*)", 1))
        .withColumn("query", F.regexp_extract(u, r"\?([^#]*)", 1))
    )


def registrable_domain_col(host: Column) -> Column:
    """eTLD+1 heuristic (see module docstring): CASE on the known
    two-part suffixes avoids regex-alternation ordering differences
    between engines, keeping the DuckDB twin hash-exact."""
    expr = None
    for suf in TWO_PART_SUFFIXES:
        pat = r"([^.]+\." + suf.replace(".", r"\.") + r")$"
        branch = F.regexp_extract(host, pat, 1)
        cond = host.endswith("." + suf)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr.otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def registrable_domain(df: DataFrame, host_col: str = "host") -> DataFrame:
    return df.withColumn("domain", registrable_domain_col(F.col(host_col)))


def cap_per_domain(
    df: DataFrame,
    max_per_domain: int,
    domain_col: str = "domain",
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most `max_per_domain` documents per registrable domain,
    deterministically (ordered by `order_col`). One window shuffle keyed
    on the domain — at 100 TB the domain key is zipfian, but the cap
    itself bounds the retained skew and row_number is a streaming window
    (no buffering beyond the frame row)."""
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(F.col(order_col))
    return (
        df.withColumn("rank_in_domain", F.row_number().over(w))
        .filter(F.col("rank_in_domain") <= max_per_domain)
    )
