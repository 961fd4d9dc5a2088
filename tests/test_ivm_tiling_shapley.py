"""Unit tests for join-view IVM (functions/ivm.py), TextTiling
segmentation (functions/segmentation.py), and Shapley attribution
(functions/shapley.py): the delta-rule identity on hand and random
data, planted topic boundaries with a pure-Python mirror, and the
Shapley axioms (efficiency, dummy player) with exact hand values."""

from __future__ import annotations

import random
from itertools import combinations
from math import factorial

import pytest

from pyspark.sql import functions as F

from ocr_translation_spark.functions.ivm import (
    join_view_delta,
    refresh_join_view,
)
from ocr_translation_spark.functions.segmentation import (
    texttiling_boundaries,
)
from ocr_translation_spark.functions.shapley import shapley_attribution


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_ivm_three_terms_exact(spark):
    a = _df(spark, [(1, "a1"), (2, "a2")], "k long, av string")
    b = _df(spark, [(1, "b1")], "k long, bv string")
    da = _df(spark, [(1, "a3")], "k long, av string")
    db = _df(spark, [(2, "b2"), (1, "b3")], "k long, bv string")
    d = {
        (r.k, r.av, r.bv)
        for r in join_view_delta(a, da, b, db, "k").collect()
    }
    assert d == {
        (1, "a3", "b1"),  # dA |x| B
        (2, "a2", "b2"),  # A |x| dB
        (1, "a1", "b3"),
        (1, "a3", "b3"),  # dA |x| dB
    }


def test_ivm_refresh_equals_full_recompute(spark):
    rng = random.Random(9)
    a_rows = [(rng.randint(0, 9), f"a{i}") for i in range(40)]
    b_rows = [(rng.randint(0, 9), f"b{i}") for i in range(30)]
    da_rows = [(rng.randint(0, 9), f"da{i}") for i in range(12)]
    db_rows = [(rng.randint(0, 9), f"db{i}") for i in range(8)]
    a = _df(spark, a_rows, "k long, av string")
    b = _df(spark, b_rows, "k long, bv string")
    da = _df(spark, da_rows, "k long, av string")
    db = _df(spark, db_rows, "k long, bv string")
    view_old = a.join(b, "k")
    inc = refresh_join_view(view_old, a, da, b, db, "k")
    full = a.unionByName(da).join(b.unionByName(db), "k")
    key = lambda r: (r.k, r.av, r.bv)  # noqa: E731
    assert sorted(map(key, inc.collect())) == sorted(
        map(key, full.collect())
    )


def test_ivm_one_sided_and_noop(spark):
    a = _df(spark, [(1, "a")], "k long, av string")
    b = _df(spark, [(1, "b")], "k long, bv string")
    db = _df(spark, [(1, "b2")], "k long, bv string")
    view = a.join(b, "k")
    assert join_view_delta(a, None, b, None, "k") is None
    assert refresh_join_view(view, a, None, b, None, "k") is view
    one = refresh_join_view(view, a, None, b, db, "k")
    assert {(r.k, r.bv) for r in one.collect()} == {(1, "b"), (1, "b2")}


# ---------------------------------------------------------------------------


def _py_tiling(toks, w, thr):
    n = len(toks)
    if n < 2 * w:
        return []
    gaps = list(range(w, n - w + 1))
    sims = [
        len(set(toks[g - w:g]) & set(toks[g:g + w])) for g in gaps
    ]
    out = []
    for i, g in enumerate(gaps):
        depth = max(sims[: i + 1]) + max(sims[i:]) - 2 * sims[i]
        if depth >= thr:
            out.append((g, sims[i], depth))
    return out


def test_tiling_planted_topic_shift(spark):
    left = "a b c d e f g h i j " * 2
    right = "z y x w v u t s r q " * 2
    text = (left + right).strip()
    df = _df(spark, [(1, text)], "doc_id long, text string")
    got = sorted(
        (r.pos, r.sim, r.depth)
        for r in texttiling_boundaries(df, w=10, depth_threshold=4)
        .collect()
    )
    expect = sorted(_py_tiling(text.split(), 10, 4))
    assert got == expect
    # the deepest valley is exactly at the topic junction (token 20)
    deepest = max(got, key=lambda t: t[2])
    assert deepest[0] == 20 and deepest[1] == 0


def test_tiling_random_matches_python_mirror(spark):
    rng = random.Random(13)
    vocab = list("abcdefgh")
    rows = [
        (i, " ".join(rng.choice(vocab)
                     for _ in range(rng.randint(5, 45))))
        for i in range(40)
    ]
    df = _df(spark, rows, "doc_id long, text string")
    got = {}
    for r in texttiling_boundaries(df, w=5, depth_threshold=2).collect():
        got.setdefault(r.doc_id, []).append((r.pos, r.sim, r.depth))
    for i, text in rows:
        assert sorted(got.get(i, [])) == sorted(
            _py_tiling(text.split(), 5, 2)
        ), (i, text)


def test_tiling_short_doc_and_validation(spark):
    df = _df(spark, [(1, "a b c")], "doc_id long, text string")
    assert texttiling_boundaries(df, w=10).count() == 0
    with pytest.raises(ValueError):
        texttiling_boundaries(df, w=0)
    with pytest.raises(ValueError):
        texttiling_boundaries(df, depth_threshold=0)


# ---------------------------------------------------------------------------


def _game(spark, groups):
    """groups: {frozenset(channels): (n_units, n_converted)}; returns
    (exposures, conversions, universe) — the universe is what makes
    unexposed non-converters visible (the empty-set baseline)."""
    expo, conv, uid = [], [], 0
    for chans, (m, c) in groups.items():
        for j in range(m):
            for ch in sorted(chans):
                expo.append((uid, ch))
            if j < c:
                conv.append((uid,))
            uid += 1
    e = _df(spark, expo or [(None, None)], "unit long, channel string")
    if not expo:
        e = e.where(F.col("unit").isNotNull())
    c = _df(spark, conv or [(None,)], "unit long")
    if not conv:
        c = c.where(F.col("unit").isNotNull())
    u = _df(spark, [(i,) for i in range(uid)], "unit long")
    return e, c, u


def _py_shapley(groups, channels):
    n = len(channels)
    v = {}
    for chans, (m, c) in groups.items():
        mask = sum(1 << channels.index(ch) for ch in chans)
        v[mask] = c * 1_000_000 // m
    out = {}
    for i, ch in enumerate(channels):
        num = 0
        rest = [j for j in range(n) if j != i]
        for k in range(n):
            for sub in combinations(rest, k):
                s = sum(1 << j for j in sub)
                w = factorial(k) * factorial(n - 1 - k)
                num += w * (v.get(s | (1 << i), 0) - v.get(s, 0))
        sign = 1 if num >= 0 else -1
        out[ch] = sign * (abs(num) // factorial(n))
    return out


def test_shapley_hand_values_and_efficiency(spark):
    groups = {
        frozenset(): (10, 1),
        frozenset({"A"}): (10, 5),
        frozenset({"B"}): (10, 2),
        frozenset({"A", "B"}): (10, 8),
    }
    e, c, u = _game(spark, groups)
    got = {
        r.channel: r.shapley_ppm
        for r in shapley_attribution(e, c, ["A", "B"], universe=u)
        .collect()
    }
    assert got == {"A": 500_000, "B": 200_000}
    # efficiency: credits sum to v(N) - v(empty)
    assert sum(got.values()) == 800_000 - 100_000


def test_shapley_dummy_player_gets_zero(spark):
    # C never changes the rate: v(S u C) == v(S) for every observed S
    groups = {
        frozenset({"A"}): (10, 4),
        frozenset({"A", "C"}): (10, 4),
        frozenset(): (10, 2),
        frozenset({"C"}): (10, 2),
    }
    e, c, u = _game(spark, groups)
    got = {
        r.channel: r.shapley_ppm
        for r in shapley_attribution(e, c, ["A", "C"], universe=u)
        .collect()
    }
    assert got["C"] == 0
    assert got["A"] == 200_000


def test_shapley_random_matches_python_mirror(spark):
    rng = random.Random(21)
    channels = ["a", "b", "c", "d"]
    groups = {}
    for _ in range(10):
        s = frozenset(
            ch for ch in channels if rng.random() < 0.5
        )
        m = rng.randint(1, 12)
        groups[s] = (m, rng.randint(0, m))
    e, c, u = _game(spark, groups)
    got = {
        r.channel: r.shapley_ppm
        for r in shapley_attribution(e, c, channels, universe=u)
        .collect()
    }
    assert got == _py_shapley(groups, channels)


def test_shapley_validation(spark):
    e, c, _u = _game(spark, {frozenset({"A"}): (1, 0)})
    with pytest.raises(ValueError):
        shapley_attribution(e, c, ["A"])
    with pytest.raises(ValueError):
        shapley_attribution(e, c, ["A", "A"])
