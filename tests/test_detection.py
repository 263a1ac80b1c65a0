"""NMS (operators/detection.py): greedy semantics, cascade survival,
strict-threshold edge, and pandas-operator vs pure-python reference
parity on seeded random boxes."""

from __future__ import annotations

import numpy as np
import pytest

from instageo_e2e_geospatial_ml_spark.operators.detection import nms_boxes

def _ref_nms(rows, iou_num=3, iou_den=10):
    """Independent pure-python greedy NMS (no numpy, no shared code
    path with the operator's vectorized kernel)."""
    order = sorted(rows, key=lambda r: (-r["score"], r["box_id"]))
    kept = []
    for b in order:
        ok = True
        for k in kept:
            iw = min(b["x2"], k["x2"]) - max(b["x1"], k["x1"])
            ih = min(b["y2"], k["y2"]) - max(b["y1"], k["y1"])
            inter = max(iw, 0) * max(ih, 0)
            ua = (b["x2"] - b["x1"]) * (b["y2"] - b["y1"])
            ub = (k["x2"] - k["x1"]) * (k["y2"] - k["y1"])
            if iou_den * inter > iou_num * (ua + ub - inter):
                ok = False
                break
        if ok:
            kept.append(b)
    return [(b["box_id"], i + 1) for i, b in enumerate(kept)]


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        rows,
        "image_id long, box_id long, x1 long, y1 long, x2 long, y2 long, "
        "score long",
    )
    out = nms_boxes(df, **kw).collect()
    return sorted((r.box_id, r.keep_order) for r in out)


def test_nms_cascade_survival(spark):
    """A suppresses B; B would have suppressed C; C must survive —
    the case that distinguishes greedy NMS from pairwise filtering."""
    rows = [
        # A: [0,10)x[0,10) score 100
        (1, 1, 0, 0, 10, 10, 100),
        # B: [4,14)x[0,10) — IoU(A,B)=60/140 > 0.3, suppressed by A
        (1, 2, 4, 0, 14, 10, 90),
        # C: [12,22)x[0,10) — IoU(B,C)=20/180>... vs A: inter=0
        (1, 3, 12, 0, 22, 10, 80),
    ]
    got = _run(spark, rows)
    assert got == [(1, 1), (3, 2)]


def test_nms_threshold_edge_strict(spark):
    """IoU exactly == threshold is NOT suppressed (strict >)."""
    # A=[0,6)x[0,10) area 60, B=[3,9)x[0,10) area 60,
    # inter 30, union 90 -> IoU=1/3. With thr 1/3: equal -> kept.
    rows = [
        (7, 1, 0, 0, 6, 10, 50),
        (7, 2, 3, 0, 9, 10, 40),
    ]
    got = _run(spark, rows, iou_num=1, iou_den=3)
    assert got == [(1, 1), (2, 2)]
    # One unit more overlap -> strictly above 1/3 -> suppressed.
    rows = [
        (7, 1, 0, 0, 6, 10, 50),
        (7, 2, 2, 0, 8, 10, 40),
    ]
    got = _run(spark, rows, iou_num=1, iou_den=3)
    assert got == [(1, 1)]


def test_nms_score_tie_by_box_id(spark):
    rows = [
        (2, 9, 0, 0, 10, 10, 50),
        (2, 4, 1, 0, 11, 10, 50),  # same score, lower id wins
    ]
    got = _run(spark, rows)
    assert got == [(4, 1)]


def test_nms_random_parity_vs_reference(spark):
    rng = np.random.RandomState(42)
    rows = []
    bid = 0
    for img in range(12):
        for _ in range(int(rng.randint(1, 20))):
            x1 = int(rng.randint(0, 80))
            y1 = int(rng.randint(0, 80))
            rows.append(
                (
                    img,
                    bid,
                    x1,
                    y1,
                    x1 + int(rng.randint(5, 40)),
                    y1 + int(rng.randint(5, 40)),
                    int(rng.randint(0, 30)),  # small range -> score ties
                )
            )
            bid += 1
    got = _run(spark, rows)
    want = []
    for img in {r[0] for r in rows}:
        dicts = [
            dict(zip(("image_id", "box_id", "x1", "y1", "x2", "y2", "score"), r))
            for r in rows
            if r[0] == img
        ]
        want.extend(_ref_nms(dicts))
    assert got == sorted(want)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
