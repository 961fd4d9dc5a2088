"""Item-item co-occurrence similarity (functions/cooccurrence)."""

from __future__ import annotations

import itertools
import random

import pytest

from ocr_translation_spark.functions.cooccurrence import (
    item_cooccurrence_sim,
)


def _run(spark, rows, cap=20, min_co=2):
    df = spark.createDataFrame(rows, "u long, i long")
    got = item_cooccurrence_sim(
        df, "u", "i", max_items_per_user=cap, min_co=min_co
    )
    return {
        (r.item_a, r.item_b): (r.n_co, r.c_a, r.c_b, r.sim2_micro)
        for r in got.collect()
    }


def _brute(rows, cap, min_co):
    from collections import Counter, defaultdict

    per_user = defaultdict(Counter)
    for u, i in rows:
        per_user[u][i] += 1
    kept = defaultdict(set)
    for u, cnt in per_user.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        for i, _ in ranked[:cap]:
            kept[u].add(i)
    c = Counter()
    co = Counter()
    for u, items in kept.items():
        for i in items:
            c[i] += 1
        for a, b in itertools.combinations(sorted(items), 2):
            co[(a, b)] += 1
    return {
        p: (n, c[p[0]], c[p[1]], (1_000_000 * n * n) // (c[p[0]] * c[p[1]]))
        for p, n in co.items()
        if n >= min_co
    }


def test_cooccurrence_hand_computed(spark):
    # users 1,2 both touch items {10, 20}; user 3 touches {10, 30}
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30)]
    got = _run(spark, rows, min_co=2)
    # only (10,20) is co-touched by >= 2 users; c_10=3, c_20=2
    assert got == {(10, 20): (2, 3, 2, (1_000_000 * 4) // 6)}


def test_cap_bounds_hub_user_fanout(spark):
    # a bot user touching 50 items must contribute only C(cap,2) pairs
    rows = [(99, i) for i in range(50)]
    # interactions all equal -> cap keeps the SMALLEST item ids
    got = _run(spark, rows, cap=5, min_co=1)
    assert set(got) == {
        (a, b) for a, b in itertools.combinations(range(5), 2)
    }


def test_cap_prefers_most_interacted(spark):
    rows = [(1, 7), (1, 7), (1, 7), (1, 3), (1, 3), (1, 9)] + [
        (2, 7), (2, 3),
    ]
    # cap=2 for user 1 keeps {7 (n=3), 3 (n=2)}, drops 9
    got = _run(spark, rows, cap=2, min_co=1)
    assert set(got) == {(3, 7)}
    assert got[(3, 7)] == (2, 2, 2, 1_000_000)


def test_brute_force_parity_randomized(spark):
    rng = random.Random(20260818)
    rows = [
        (rng.randrange(25), rng.randrange(15)) for _ in range(600)
    ]
    for cap, min_co in ((20, 2), (4, 1), (3, 3)):
        assert _run(spark, rows, cap, min_co) == _brute(rows, cap, min_co), (
            cap, min_co,
        )


def test_cap_validation(spark):
    df = spark.createDataFrame([(1, 1)], "u long, i long")
    with pytest.raises(ValueError, match="max_items_per_user"):
        item_cooccurrence_sim(df, "u", "i", max_items_per_user=1)
