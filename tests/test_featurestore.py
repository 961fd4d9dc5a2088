"""Unit tests for pit_feature_join (functions/featurestore.py):
embargo semantics (inclusive boundary, no-feature NULL), the
leak_averted audit against hand-built timelines, the embargo=0
degenerate, and a random Python-mirror parity sweep."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from ocr_translation_spark.functions.featurestore import pit_feature_join

T0 = dt.datetime(2024, 1, 1)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


def _run(spark, feats, labels, embargo):
    f = spark.createDataFrame(
        [(u, _t(s), v) for u, s, v in feats],
        "user_id long, fts timestamp, feat_val long",
    )
    l = spark.createDataFrame(
        [(i, u, _t(s)) for i, u, s in labels],
        "label_id long, user_id long, ts timestamp",
    )
    out = pit_feature_join(
        l, f, "user_id", "ts", "fts", ["feat_val"], embargo
    ).collect()
    return {
        r.label_id: (r.feat_val_pit, r.feat_ts_pit, r.leak_averted)
        for r in out
    }


def test_pit_embargo_and_leak_audit(spark):
    feats = [(1, 3, 30), (1, 10, 100)]
    labels = [(1, 1, 11), (2, 1, 20), (3, 1, 2)]
    got = _run(spark, feats, labels, embargo=5)
    # label 1 at t=11: embargo cutoff t=6 -> picks t=3; naive would
    # pick t=10 -> leak averted
    assert got[1] == (30, _t(3), True)
    # label 2 at t=20: cutoff 15 -> picks t=10, naive same -> clean
    assert got[2] == (100, _t(10), False)
    # label 3 at t=2: no feature old enough; naive would pick NONE
    # either (t=3 > 2) -> no leak
    assert got[3] == (None, None, False)


def test_pit_no_feature_but_naive_would_leak(spark):
    got = _run(spark, [(1, 10, 7)], [(1, 1, 11)], embargo=5)
    # cutoff t=6: nothing; naive picks t=10 -> averted a pure
    # future-adjacent leak into a no-feature label
    assert got[1] == (None, None, True)


def test_pit_inclusive_boundary(spark):
    # feat_ts == label_ts - embargo is INCLUDED (as-of inclusivity)
    got = _run(spark, [(1, 6, 60)], [(1, 1, 11)], embargo=5)
    assert got[1] == (60, _t(6), False)


def test_pit_zero_embargo_never_flags(spark):
    feats = [(1, s, s * 10) for s in (1, 4, 9)]
    labels = [(i, 1, s) for i, s in enumerate((2, 5, 9, 12))]
    got = _run(spark, feats, labels, embargo=0)
    assert all(not leak for _, _, leak in got.values())
    assert got[2] == (90, _t(9), False)  # inclusive at equality


def test_pit_validation(spark):
    with pytest.raises(ValueError):
        _run(spark, [(1, 1, 1)], [(1, 1, 2)], embargo=-1)


def test_pit_random_matches_python_mirror(spark):
    rng = random.Random(17)
    feats, seen = [], set()
    for _ in range(60):
        u, s = rng.randint(1, 5), rng.randint(0, 500)
        if (u, s) not in seen:
            seen.add((u, s))
            feats.append((u, s, rng.randint(1, 999)))
    labels = [
        (i, rng.randint(1, 6), rng.randint(0, 520)) for i in range(80)
    ]
    emb = 37
    got = _run(spark, feats, labels, embargo=emb)
    byu = {}
    for u, s, v in feats:
        byu.setdefault(u, []).append((s, v))
    for i, u, s in labels:
        cand = [
            (fs, fv) for fs, fv in byu.get(u, []) if fs <= s - emb
        ]
        naive = [(fs, fv) for fs, fv in byu.get(u, []) if fs <= s]
        pick = max(cand) if cand else (None, None)
        npick = max(naive)[0] if naive else None
        expect = (
            pick[1],
            _t(pick[0]) if pick[0] is not None else None,
            npick != pick[0],
        )
        assert got[i] == expect, (i, u, s, expect, got[i])
