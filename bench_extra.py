"""Extra benchmarks (guide §1.4): per-query noop-sink isolation at any
sf_dir, without touching the frozen bench.py harness.

Usage:
    python bench_extra.py [--sf DIR] [--trials N] [--cpus C] [q05_asof_pick ...]

Times each named query (default: the bench.py HEADLINE list) with the
noop sink, prints per-trial walls and the best, as one JSON line at the
end. Mirrors bench.py's session config (shuffle_partitions=max(cpus,8),
local[cpus]) so numbers are comparable with the driver's harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from instageo_e2e_geospatial_ml_spark.plans import driver_queries as dq  # noqa: E402
from instageo_e2e_geospatial_ml_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    trials = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--trials":
            trials = int(args[i + 1]); i += 2
        elif args[i] == "--cpus":
            cpus = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    if not names:
        import bench
        names = list(bench.HEADLINE)

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    try:
        import bench
        bench.warm_up(spark)
        out = {}
        for name in names:
            samples = []
            for _ in range(trials):
                spark.sparkContext.setJobDescription(name)
                t0 = time.time()
                dq.QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples.append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            out[name] = {"best": min(samples), "samples": samples}
            print(f"{name:28s} best={min(samples):8.3f}  {samples}", flush=True)
        print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
