"""Unit tests for loo_target_encoding (functions/encoding.py),
min_cover_window / proximity_topk (functions/proximity.py), and
adjusted_rand_index (functions/clusteval.py): hand-computed exact
values (Fraction mirrors with the documented truncation), degenerate
inputs, and random brute-force parity for the sweep."""

from __future__ import annotations

import random
from fractions import Fraction

import pytest

from pyspark.sql import functions as F

from ocr_translation_spark.functions.clusteval import adjusted_rand_index
from ocr_translation_spark.functions.encoding import loo_target_encoding
from ocr_translation_spark.functions.proximity import (
    min_cover_window,
    proximity_topk,
)


def _enc(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    out = loo_target_encoding(df, "source", "n_chars").collect()
    return {r.doc_id: (r.n_cat, r.loo_ppm) for r in out}


def test_loo_exact_and_excludes_self(spark):
    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 60), (4, "b", 7)]
    got = _enc(spark, rows)
    # category a: each row sees the mean of the OTHER two
    assert got[1] == (3, (20 + 60) * 1_000_000 // 2)
    assert got[2] == (3, (10 + 60) * 1_000_000 // 2)
    assert got[3] == (3, (10 + 20) * 1_000_000 // 2)
    # singleton b: leave-one-out GLOBAL mean (over rows 1-3)
    assert got[4] == (1, (10 + 20 + 60) * 1_000_000 // 3)


def test_loo_truncation_matches_fraction(spark):
    rows = [(1, "a", 1), (2, "a", 1), (3, "a", 2)]
    got = _enc(spark, rows)
    exact = Fraction(3, 2) * 1_000_000  # (1+2)/2 for row 1
    assert got[1][1] == int(exact)
    assert got[2][1] == int(exact)
    assert got[3][1] == 1_000_000  # (1+1)/2 exactly


def test_loo_one_row_corpus_is_null(spark):
    got = _enc(spark, [(1, "a", 5)])
    assert got[1] == (1, None)


# ---------------------------------------------------------------------------


def _win(spark, text, terms):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        min_cover_window(
            F.split(F.trim(F.col("text")), r"\s+"), terms
        ).alias("w")
    ).collect()[0]["w"]


def test_window_hand_cases(spark):
    assert _win(spark, "a x x b c", ["a", "b", "c"]) == 5
    assert _win(spark, "b a c a", ["a", "b", "c"]) == 3
    assert _win(spark, "a b a c", ["a", "b", "c"]) == 3
    assert _win(spark, "x a y", ["a"]) == 1
    assert _win(spark, "a b", ["a", "b", "c"]) is None
    assert _win(spark, "c b a", ["a", "b", "c"]) == 3


def test_window_validation(spark):
    with pytest.raises(ValueError):
        _win(spark, "a", [])
    with pytest.raises(ValueError):
        _win(spark, "a", ["a", "a"])


def _py_min_window(toks, terms):
    pos = [[i + 1 for i, t in enumerate(toks) if t == q] for q in terms]
    if any(not p for p in pos):
        return None
    best = None
    import itertools

    for combo in itertools.product(*pos):
        w = max(combo) - min(combo) + 1
        best = w if best is None else min(best, w)
    return best


def test_window_random_matches_brute_force(spark):
    rng = random.Random(3)
    vocab = ["a", "b", "c", "x", "y"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 18))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.w
        for r in df.select(
            "doc_id",
            min_cover_window(
                F.split(F.trim(F.col("text")), r"\s+"), ["a", "b", "c"]
            ).alias("w"),
        ).collect()
    }
    for i, text in rows:
        assert got[i] == _py_min_window(text.split(), ["a", "b", "c"]), (
            i, text,
        )


def test_proximity_topk_rank_and_ties(spark):
    rows = [
        (1, "a b c"),   # window 3
        (2, "a x b c"), # window 4... a=1,b=3,c=4 -> 4
        (3, "c b a"),   # window 3 (tie with doc 1, later id)
        (4, "a b"),     # excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = proximity_topk(df, ["a", "b", "c"], k=2).collect()
    assert [(r.doc_id, r.window_len, r.rank) for r in out] == [
        (1, 3, 1),
        (3, 3, 2),
    ]
    assert out[0].prox_ppm == 1_000_000 // 3


# ---------------------------------------------------------------------------


def _ari(spark, pairs):
    df = spark.createDataFrame(pairs, "gold string, pred string")
    return adjusted_rand_index(df).collect()[0]


def _py_ari_ppm(pairs):
    from collections import Counter

    n = len(pairs)
    nij = Counter(pairs)
    ai = Counter(g for g, _ in pairs)
    bj = Counter(p for _, p in pairs)
    c2 = lambda x: x * (x - 1) // 2  # noqa: E731
    s = sum(c2(v) for v in nij.values())
    a = sum(c2(v) for v in ai.values())
    b = sum(c2(v) for v in bj.values())
    t = c2(n)
    num = Fraction(t * s - a * b)
    den = Fraction(t * (a + b), 2) - a * b
    if n < 2 or den == 0:
        return None
    val = num / den
    mag = abs(val.numerator) * 1_000_000 // abs(val.denominator)
    sign = -1 if (val < 0) else 1
    return sign * mag


def test_ari_identity_is_one(spark):
    r = _ari(spark, [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")])
    assert r.ari_ppm == 1_000_000
    assert r.n_items == 4


def test_ari_negative_case_exact(spark):
    # gold {1,2|3,4}, pred {1,3|2,4}: every cell 1 -> ARI = -1/2
    r = _ari(spark, [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")])
    assert r.ari_ppm == -500_000
    assert r.sum_comb_cells == 0
    assert r.sum_comb_gold == 2 and r.sum_comb_pred == 2


def test_ari_degenerate_cases(spark):
    # both trivial (one row): NULL
    assert _ari(spark, [("a", "x")]).ari_ppm is None
    # gold one cluster, pred all singletons: ARI exactly 0
    r = _ari(spark, [("a", "x"), ("a", "y"), ("a", "z")])
    assert r.ari_ppm == 0
    # both sides single cluster: denominator 0 -> NULL
    assert _ari(spark, [("a", "x"), ("a", "x")]).ari_ppm is None


def test_ari_random_matches_fraction_mirror(spark):
    rng = random.Random(5)
    pairs = [
        (f"g{rng.randint(0, 4)}", f"p{rng.randint(0, 3)}")
        for _ in range(200)
    ]
    r = _ari(spark, pairs)
    assert r.ari_ppm == _py_ari_ppm(pairs)


def test_loo_null_category_is_own_stratum(spark):
    # a plain equi-join would silently DROP NULL-category rows; the
    # null-safe join keeps them as their own stratum
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 30), (3, "a", 7)],
        "doc_id long, source string, n_chars long",
    )
    got = {
        r.doc_id: (r.n_cat, r.loo_ppm)
        for r in loo_target_encoding(df, "source", "n_chars").collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == (2, 30 * 1_000_000)
    assert got[2] == (2, 10 * 1_000_000)
    # singleton 'a' falls back to the global LOO mean over ALL rows
    assert got[3] == (1, (10 + 30) * 1_000_000 // 2)


def test_ari_range_guard_raises(spark):
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame(
        [("a", "x")] * 20, "gold string, pred string"
    )
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)):
        adjusted_rand_index(df, max_items=10).collect()
