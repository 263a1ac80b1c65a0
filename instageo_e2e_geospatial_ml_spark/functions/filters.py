"""Filter-string parser (reference chip_creator.py:96-145, S3).

The reference CLI accepts predicate strings like
    "('label' ? '>' ? 0); ('year' ? 'in' ? [2021, 2022])"
parsed into pyarrow filter tuples. Catalyst makes the parser unnecessary
for pushdown (any SQL predicate pushes down), but the translator is kept
for CLI parity — emitting a Spark Column (and an equivalent SQL string)
instead of pyarrow tuples.
"""

from __future__ import annotations

import ast
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_CLAUSE = re.compile(r"\(\s*'([^']+)'\s*\?\s*'([^']+)'\s*\?\s*(.+?)\s*\)")
_OPS = {"==", "=", ">", ">=", "<", "<=", "!=", "in", "not-in"}


def parse_filters(spec: str) -> list[tuple[str, str, object]]:
    """"('col' ? 'op' ? value); ..." → [(col, op, value)]."""
    out = []
    for m in _CLAUSE.finditer(spec):
        col, op, raw = m.group(1), m.group(2), m.group(3)
        if op not in _OPS:
            raise ValueError(f"unsupported operator {op!r}")
        out.append((col, op, ast.literal_eval(raw)))
    if not out and spec.strip():
        raise ValueError(f"unparseable filter spec: {spec!r}")
    return out


def filters_to_column(filters: list[tuple[str, str, object]]) -> Column:
    """[(col, op, value)] → one conjunctive Spark Column (pushdown-able)."""
    cond = F.lit(True)
    for col, op, val in filters:
        c = F.col(col)
        if op in ("==", "="):
            clause = c == F.lit(val)
        elif op == ">":
            clause = c > F.lit(val)
        elif op == ">=":
            clause = c >= F.lit(val)
        elif op == "<":
            clause = c < F.lit(val)
        elif op == "<=":
            clause = c <= F.lit(val)
        elif op == "!=":
            clause = c != F.lit(val)
        elif op == "in":
            clause = c.isin(list(val))
        elif op == "not-in":
            clause = ~c.isin(list(val))
        cond = cond & clause
    return cond


def filters_to_sql(filters: list[tuple[str, str, object]]) -> str:
    """Same predicate as an ANSI SQL WHERE fragment (oracle parity)."""
    parts = []
    for col, op, val in filters:
        if op in ("==", "="):
            parts.append(f"{col} = {val!r}" if isinstance(val, str) else f"{col} = {val}")
        elif op in (">", ">=", "<", "<=", "!="):
            parts.append(f"{col} {op} {val}")
        elif op == "in":
            vals = ", ".join(repr(v) if isinstance(v, str) else str(v) for v in val)
            parts.append(f"{col} IN ({vals})")
        elif op == "not-in":
            vals = ", ".join(repr(v) if isinstance(v, str) else str(v) for v in val)
            parts.append(f"{col} NOT IN ({vals})")
    return " AND ".join(parts) if parts else "TRUE"
