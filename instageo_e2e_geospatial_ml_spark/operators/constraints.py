"""Declarative data-quality constraint suite (the Deequ/Great-
Expectations primitive): validate a table against a list of
constraints and emit one report row per constraint —
(check_name, n_rows, n_violations, passed).

A 100 TB ingest gate needs this as ONE pass, not one job per check:
every constraint compiles to a conditional aggregate (SUM(CASE ...))
over the same scan, plus count(DISTINCT col) for uniqueness, so the
whole suite is a single partial-aggregated job regardless of how many
constraints it carries. The wide one-row result is exploded to long
form with `stack` — driver-side constant metadata only, no second
scan. All integer arithmetic; the DuckDB twin (check_constraints_sql)
aggregates the identical expressions and unions the identical rows.

Constraint kinds (col is any column; violations never count NULLs
except for not_null itself):
  ("name", "not_null",  col, None)        value IS NULL
  ("name", "unique",    col, None)        count(col) - count(DISTINCT col)
  ("name", "min",       col, bound)       value < bound
  ("name", "max",       col, bound)       value > bound
  ("name", "in_set",    col, (v, ...))    value not in the set
  ("name", "matches",   col, regex)       value !~ regex (RE2-safe subset)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KINDS = ("not_null", "unique", "min", "max", "in_set", "matches")


def _violation_expr(kind: str, col: str, param):
    c = F.col(col)
    if kind == "not_null":
        return F.sum(c.isNull().cast("long"))
    if kind == "unique":
        return F.count(c) - F.count_distinct(c)
    if kind == "min":
        return F.sum((c < F.lit(param)).cast("long"))
    if kind == "max":
        return F.sum((c > F.lit(param)).cast("long"))
    if kind == "in_set":
        return F.sum((~c.isin(list(param)) & c.isNotNull()).cast("long"))
    if kind == "matches":
        return F.sum(
            (c.isNotNull() & ~c.rlike(param)).cast("long")
        )
    raise ValueError(f"unknown constraint kind {kind!r} (want one of {_KINDS})")


def check_constraints(df: DataFrame, constraints: list[tuple]) -> DataFrame:
    """Run the suite in one aggregation pass; returns the long-form
    report (check_name, n_rows, n_violations, passed) with passed as
    0/1 int. SUM over an empty table is NULL — coalesced to 0 so an
    empty input passes every bound/set/regex check and fails none."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (name, kind, col, param) in enumerate(constraints):
        aggs.append(
            F.coalesce(_violation_expr(kind, col, param), F.lit(0))
            .cast("long")
            .alias(f"_v{i}")
        )
    wide = df.agg(*aggs)
    pairs = ", ".join(
        f"'{name}', _v{i}" for i, (name, _, _, _) in enumerate(constraints)
    )
    return wide.selectExpr(
        f"stack({len(constraints)}, {pairs}) AS (check_name, n_violations)",
        "_n",
    ).select(
        "check_name",
        F.col("_n").cast("long").alias("n_rows"),
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def _violation_sql(kind: str, col: str, param) -> str:
    if kind == "not_null":
        return f"SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)"
    if kind == "unique":
        return f"count({col}) - count(DISTINCT {col})"
    if kind == "min":
        return f"SUM(CASE WHEN {col} < {param} THEN 1 ELSE 0 END)"
    if kind == "max":
        return f"SUM(CASE WHEN {col} > {param} THEN 1 ELSE 0 END)"
    if kind == "in_set":
        vals = ", ".join(
            f"'{v}'" if isinstance(v, str) else str(v) for v in param
        )
        return (
            f"SUM(CASE WHEN {col} IS NOT NULL AND {col} NOT IN ({vals}) "
            f"THEN 1 ELSE 0 END)"
        )
    if kind == "matches":
        return (
            f"SUM(CASE WHEN {col} IS NOT NULL AND NOT "
            f"regexp_matches({col}, '{param}') THEN 1 ELSE 0 END)"
        )
    raise ValueError(f"unknown constraint kind {kind!r}")


def check_constraints_sql(table_sql: str, constraints: list[tuple]) -> str:
    """The identical one-pass suite as DuckDB SQL (oracle twin).

    NOTE regex parity: `matches` constraints must stay inside the
    lookahead-free ASCII-class subset both engines agree on (Spark
    rlike is java.util.regex with unanchored find; DuckDB
    regexp_matches is RE2 with unanchored search — identical on that
    subset)."""
    vs = ", ".join(
        f"COALESCE(CAST({_violation_sql(k, c, p)} AS BIGINT), 0) AS v{i}"
        for i, (_, k, c, p) in enumerate(constraints)
    )
    rows = " UNION ALL ".join(
        f"SELECT '{name}' AS check_name, CAST(n AS BIGINT) AS n_rows, "
        f"v{i} AS n_violations, "
        f"CAST(CASE WHEN v{i} = 0 THEN 1 ELSE 0 END AS INTEGER) AS passed "
        f"FROM w"
        for i, (name, _, _, _) in enumerate(constraints)
    )
    # MATERIALIZED: w is referenced once per constraint row and DuckDB
    # re-evaluates plain CTEs per reference (the q121 lesson).
    return (
        f"WITH w AS MATERIALIZED "
        f"(SELECT count(*) AS n, {vs} FROM ({table_sql}))\n{rows}"
    )
