"""Sequential pattern mining: containment fold + GSP level-wise support."""

from __future__ import annotations

from itertools import product

import pytest

from pyspark.sql import functions as F

from ocr_translation_spark.functions.seqpat import (
    contains_subsequence,
    frequent_sequences,
)


def _py_contains(seq, pat):
    it = iter(seq)
    return all(s in it for s in pat)


def _py_frequent(seqs, ppm, max_len):
    alphabet = sorted({s for q in seqs for s in q})
    out = {}
    for L in range(1, max_len + 1):
        for pat in product(alphabet, repeat=L):
            sup = sum(1 for q in seqs if _py_contains(q, pat))
            if sup * 1_000_000 >= ppm * len(seqs):
                out[">".join(pat)] = (L, sup)
    return out


def _events(spark, seqs):
    rows = [
        (sid, i, s)
        for sid, q in enumerate(seqs)
        for i, s in enumerate(q)
    ]
    return spark.createDataFrame(rows, "sid int, pos int, sym string")


def _run(spark, seqs, ppm, max_len=3):
    df = frequent_sequences(
        _events(spark, seqs), ["sid"], ["pos"], "sym", ppm, max_len
    )
    return {r["pattern"]: (r["length"], r["support"]) for r in df.collect()}


def test_containment_fold_matches_python(spark):
    cases = [
        (["a", "b", "c"], ["a", "c"], True),
        (["a", "b", "c"], ["c", "a"], False),
        (["a", "a", "b"], ["a", "a", "b"], True),
        (["a", "b"], ["a", "a"], False),  # needs TWO a's, not one reused
        (["b", "a"], ["a", "b"], False),
        (["a"], ["a"], True),
        ([], ["a"], False),
    ]
    df = spark.createDataFrame(
        [(s, p, e) for s, p, e in cases],
        "seq array<string>, pat array<string>, expected boolean",
    )
    got = df.select(
        contains_subsequence(F.col("seq"), F.col("pat")).alias("g"),
        "expected",
    ).collect()
    for r, (s, p, e) in zip(got, cases):
        assert r["g"] == e, (s, p)
        assert _py_contains(s, p) == e, (s, p)


def test_hand_built_supports(spark):
    seqs = [
        ["a", "b", "c"],
        ["a", "c", "b"],
        ["b", "a", "b"],
        ["a", "b"],
        ["c"],
    ]
    got = _run(spark, seqs, ppm=400_000, max_len=3)  # support >= 2
    assert got["a"] == (1, 4)
    assert got["a>b"] == (2, 4)  # all four a-sequences reach a b later
    assert got["a>c"] == (2, 2)
    assert "c>a" not in got  # support 0
    # a>b>c contained only in seq 0 -> support 1 < 2: must be absent
    assert "a>b>c" not in got


def test_apriori_prune_is_lossless_vs_bruteforce(spark):
    # deterministic pseudo-random corpus over a 4-symbol alphabet
    alpha = ["w", "x", "y", "z"]
    seqs = []
    state = 1234567
    for i in range(60):
        n = (state := state * 1103515245 + 12345) % 5 + 1
        q = []
        for _ in range(n):
            state = (state * 1103515245 + 12345) % (2**31)
            q.append(alpha[state % 4])
        seqs.append(q)
    for ppm in (50_000, 200_000, 500_000):
        assert _run(spark, seqs, ppm) == _py_frequent(seqs, ppm, 3), ppm


def test_threshold_is_exact_cross_multiplied(spark):
    # 3 of 8 sessions contain the pattern: 375000 ppm exactly
    seqs = [["a", "b"]] * 3 + [["b", "a"]] * 5
    assert "a>b" in _run(spark, seqs, ppm=375_000)
    assert "a>b" not in _run(spark, seqs, ppm=375_001)


def test_alphabet_guard(spark):
    seqs = [[f"s{i}"] for i in range(10)]
    with pytest.raises(ValueError, match="max_alphabet"):
        frequent_sequences(
            _events(spark, seqs), ["sid"], ["pos"], "sym",
            min_support_ppm=1, max_len=2, max_alphabet=5,
        )


def test_empty_result_keeps_schema(spark):
    df = frequent_sequences(
        _events(spark, [["a"], ["b"]]), ["sid"], ["pos"], "sym",
        min_support_ppm=1_000_000, max_len=2,
    )
    assert df.columns == ["pattern", "length", "support"]
    assert df.count() == 0
