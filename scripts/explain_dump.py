"""Dump .explain("formatted") for named queries to plans/r08/<query>_<tag>.txt.

Usage: python scripts/explain_dump.py <tag> [--sf DIR] q05_asof_pick ...
(tag is usually 'before' or 'after'.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from instageo_e2e_geospatial_ml_spark.plans import driver_queries as dq  # noqa: E402
from instageo_e2e_geospatial_ml_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    tag = args.pop(0)
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    outdir = os.path.join("plans", "r08")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    try:
        for name in names:
            df = dq.QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path} ({len(plan)} bytes)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
