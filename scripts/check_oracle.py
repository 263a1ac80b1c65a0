"""Self-check harness mimicking the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB at the given sf dir; compares row count, sorted column
names, and an order-insensitive value hash (stringified rows, doubles
repr'd exactly — both engines must produce bit-identical values).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       CHECK_ORACLE_JSON=BENCH/ORACLE_r8.json python scripts/check_oracle.py …
           additionally archives {query: {rows, hash_ok, secs}} for the whole
           run — the per-round full-registry oracle artifact (VERDICT r7 #2).
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def norm(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)
    lines = sorted("\x1f".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from instageo_e2e_geospatial_ml_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    archive = {}
    import os as _os

    json_out = _os.environ.get("CHECK_ORACLE_JSON")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name:24s} rows={len(srows):7d}  (no oracle — rows-only) {time.time()-t0:5.1f}s")
                archive[name] = {"rows": len(srows), "hash_ok": None,
                                 "secs": round(time.time() - t0, 2)}
                continue
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            ok_n = len(srows) == len(orows)
            ok_c = sorted(scols) == sorted(ocols)
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
            ok_h = sh == oh
            status = "OK " if (ok_n and ok_c and ok_h) else "FAIL"
            if status == "FAIL":
                n_fail += 1
            print(
                f"{name:24s} {status} rows {len(srows)}/{len(orows)} cols_ok={ok_c} "
                f"hash_ok={ok_h} {time.time()-t0:5.1f}s"
            )
            archive[name] = {"rows": len(srows), "hash_ok": bool(ok_n and ok_c and ok_h),
                             "secs": round(time.time() - t0, 2)}
            if not ok_c:
                print(f"   spark cols: {sorted(scols)}\n   duckdb cols: {sorted(ocols)}")
            if ok_c and ok_n and not ok_h:
                # show first differing row for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                aset = sorted("\x1f".join(repr(r[i]) for i in order_s) for r in srows)
                bset = sorted("\x1f".join(repr(r[i]) for i in order_o) for r in orows)
                for a, b in zip(aset, bset):
                    if a != b:
                        print(f"   spark : {a[:200]}\n   duckdb: {b[:200]}")
                        break
        except Exception as e:
            n_fail += 1
            print(f"{name:24s} ERROR {type(e).__name__}: {str(e)[:300]}")
            archive[name] = {"rows": None, "hash_ok": False, "secs": None}
    if json_out:
        import json as _json

        with open(json_out, "w") as fh:
            _json.dump({"sf_dir": sf_dir, "n_fail": n_fail,
                        "queries": archive}, fh, indent=1)
        print(f"archived {len(archive)} query results -> {json_out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
