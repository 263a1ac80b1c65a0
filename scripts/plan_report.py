"""Sweep every registry query's PHYSICAL plan and emit a scale-hygiene
report (BENCH/PLANS.md): per query — EvalPython operators (row-Python
in the hot path), partition-less window specs (single-task sorts),
broadcast joins, exchanges, whole-stage-codegen spans — plus repo-wide
totals. The auditable artifact behind the plan tests: the tests pin
the invariants per named query; this report shows the whole surface
at once.

Usage: python scripts/plan_report.py [sf_dir] [out_md]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def main() -> int:
    import __spark_entry__ as em
    from instageo_e2e_geospatial_ml_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/PLANS.md"
    spark = get_spark(master="local[8]", shuffle_partitions=8)

    rows = []
    for name, fn in em.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # report, don't die
            rows.append((name, None, str(e)[:80]))
            continue
        n_eval = plan.count("BatchEvalPython")
        n_arrow = plan.count("MapInPandas") + plan.count(
            "FlatMapGroupsInPandas"
        ) + plan.count("ArrowEvalPython") + plan.count(
            "FlatMapGroupsInArrow"
        ) + plan.count("PythonMapInArrow")
        # NOTE: BatchEvalPython = row-at-a-time Python (the slow path);
        # ArrowEvalPython etc. are the Arrow-batched kernels and count
        # separately ("EvalPython" alone would substring-match both)
        n_bcast = plan.count("BroadcastExchange")
        n_exch = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
        n_gwin = 0
        for m in re.finditer(r"windowspecdefinition\(([^,)]+)[,)]", plan):
            first = m.group(1).strip()
            if (" ASC" in first or " DESC" in first
                    or first.startswith("specifiedwindowframe")):
                n_gwin += 1
        rows.append(
            (name, (n_eval, n_arrow, n_bcast, n_exch, n_wsc, n_gwin), "")
        )

    ok = [r for r in rows if r[1] is not None]
    tot = [sum(r[1][i] for r in ok) for i in range(6)]
    with open(out, "w") as f:
        f.write("# Physical-plan hygiene sweep\n\n")
        f.write(
            f"{len(ok)} queries compiled at `{sf_dir}`. Totals: "
            f"{tot[0]} BatchEvalPython (row-Python) operators, "
            f"{tot[1]} Arrow-batched Python kernels (by design), "
            f"{tot[2]} broadcast exchanges, {tot[3]} shuffle exchanges, "
            f"{tot[5]} partition-less window specs (each one a "
            f"documented bounded-input contract — see "
            f"tests/test_plans.py exclusion comments).\n\n"
        )
        f.write("| query | EvalPython | ArrowPy | bcast | shuffles "
                "| WSCG spans | global windows |\n|---|---|---|---|---|---|---|\n")
        for name, c, err in rows:
            if c is None:
                f.write(f"| {name} | ERR {err} | | | | | |\n")
            else:
                f.write(
                    f"| {name} | {c[0]} | {c[1]} | {c[2]} | {c[3]} "
                    f"| {c[4]} | {c[5]} |\n"
                )
    print(f"wrote {out}: {len(ok)} queries, totals {tot}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
