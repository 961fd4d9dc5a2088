"""Greedy k-center coreset (functions/coreset)."""

from __future__ import annotations

import math
import random
import struct

import pytest

from ocr_translation_spark.functions.coreset import kcenter_coreset


def _f32(x):
    return struct.unpack("f", struct.pack("f", x))[0]


def _mirror(pts, k):
    """Pure-Python Gonzalez with the same quantization/tie rules."""
    qp = {
        i: [math.floor(_f32(x) * 1048576.0) for x in v] for i, v in pts
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    sel = [(min(qp), 0)]
    md = {i: None for i in qp}
    for _ in range(1, min(k, len(qp))):
        c = qp[sel[-1][0]]
        for i in qp:
            d = d2(qp[i], c)
            md[i] = d if md[i] is None else min(md[i], d)
        cand = [
            (i, md[i]) for i in qp if i not in [s[0] for s in sel]
        ]
        best = max(cand, key=lambda t: (t[1], -t[0]))
        sel.append(best)
    c = qp[sel[-1][0]]
    for i in qp:
        d = d2(qp[i], c)
        md[i] = d if md[i] is None else min(md[i], d)
    rest = [md[i] for i in qp if i not in [s[0] for s in sel]]
    radius = max(rest) if rest else 0
    return [
        (rank, i, d, radius) for rank, (i, d) in enumerate(sel)
    ]


def test_randomized_python_parity_and_partition_invariance(spark):
    rng = random.Random(20260819)
    pts = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    want = sorted(_mirror(pts, 5))
    got = sorted(tuple(r) for r in kcenter_coreset(df, 5).collect())
    assert got == want
    # same result under a different physical layout
    got2 = sorted(
        tuple(r) for r in kcenter_coreset(df.repartition(7), 5).collect()
    )
    assert got2 == want


def test_duplicates_never_reselected_before_distant_points(spark):
    # three copies of the seed + one far point: the far point must be
    # picked at rank 1 (dup has md 0), and rank 2 must be a dup with
    # sel_dist2 == 0, smallest id first
    pts = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [0.0, 0.0]),
        (9, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    rows = sorted(
        (r["sel_rank"], r["vec_id"], r["sel_dist2"])
        for r in kcenter_coreset(df, 3).collect()
    )
    assert rows[0] == (0, 0, 0)
    assert rows[1][1] == 9 and rows[1][2] > 0
    assert rows[2] == (2, 1, 0)


def test_k_exceeding_corpus_stops_early(spark):
    pts = [(0, [0.1, 0.2]), (1, [0.9, -0.3])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    rows = kcenter_coreset(df, 10).collect()
    assert len(rows) == 2
    assert all(r["radius2"] == 0 for r in rows)  # nothing uncovered


def test_k1_and_validation(spark):
    pts = [(3, [0.5, 0.5]), (7, [-0.5, 0.5])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    [r] = kcenter_coreset(df, 1).collect()
    assert (r["sel_rank"], r["vec_id"], r["sel_dist2"]) == (0, 3, 0)
    assert r["radius2"] > 0  # the unselected point's distance
    with pytest.raises(ValueError):
        kcenter_coreset(df, 0)


def test_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kcenter_coreset(df, 4).count() == 0
