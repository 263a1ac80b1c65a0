"""Hausdorff trajectory join (operators/trajectory.hausdorff_join):
hand-computed asymmetric case + threshold exclusion + brute-force parity
on random clustered tracks (prefilter losslessness)."""

from __future__ import annotations

import numpy as np
import pytest

from instageo_e2e_geospatial_ml_spark.operators.trajectory import hausdorff_join


def _mk(spark, rows):
    return spark.createDataFrame(rows, "track_id long, px long, py long")


def _brute(rows, t2):
    from collections import defaultdict

    tr = defaultdict(list)
    for tid, x, y in rows:
        tr[tid].append((x, y))
    ids = sorted(tr)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = 0
            for s, d in ((a, b), (b, a)):
                for sx, sy in tr[s]:
                    md = min(
                        (sx - dx) ** 2 + (sy - dy) ** 2 for dx, dy in tr[d]
                    )
                    h = max(h, md)
            if h <= t2:
                out[(a, b)] = h
    return out


def test_hausdorff_asymmetry(spark):
    # A={(0,0)}, B={(0,0),(0,10)}: h(A,B)=0 but h(B,A)^2=100 -> H^2=100.
    rows = [(1, 0, 0), (2, 0, 0), (2, 0, 10)]
    got = {(r.a_id, r.b_id): r.h2 for r in hausdorff_join(_mk(spark, rows), 10).collect()}
    assert got == {(1, 2): 100}
    # threshold 9: 100 > 81 -> excluded
    assert hausdorff_join(_mk(spark, rows), 9).count() == 0


def test_hausdorff_brute_parity(spark):
    rng = np.random.RandomState(7)
    rows = []
    for tid in range(10):
        hx, hy = (tid % 3) * 40, (tid % 2) * 40
        for _ in range(12):
            rows.append(
                (tid, hx + int(rng.randint(0, 30)), hy + int(rng.randint(0, 30)))
            )
    thr = 25
    got = {
        (r.a_id, r.b_id): r.h2
        for r in hausdorff_join(_mk(spark, rows), thr).collect()
    }
    assert got == _brute(rows, thr * thr)
    assert got, "test setup produced no matching pairs"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
