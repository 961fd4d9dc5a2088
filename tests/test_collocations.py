"""Unit + parity tests for functions/collocations.py.

The DuckDB value oracles (pmi_collocations / bpe_pair_counts in
__spark_entry__) pin engine equality; these tests pin the MATH —
hand-computed lift values, a pure-Python reference over a randomized
deterministic corpus, and partition invariance of the exact integer
arithmetic.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from ocr_translation_spark.functions.collocations import (
    LIFT_SCALE,
    bpe_pair_counts,
    pmi_collocations,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_tokens(text):
    return [t for t in " ".join(text.lower().split()).split(" ") if t]


def _py_pmi(texts, min_count, top_k):
    uni, pairs = Counter(), Counter()
    for t in texts:
        toks = _py_tokens(t)
        uni.update(toks)
        pairs.update(zip(toks, toks[1:]))
    total = sum(uni.values())
    rows = [
        (
            w1,
            w2,
            c,
            (c * total * LIFT_SCALE) // (uni[w1] * uni[w2]),
        )
        for (w1, w2), c in pairs.items()
        if c >= min_count
    ]
    rows.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    return rows[:top_k]


def _py_bpe(texts, top_k):
    words = Counter()
    for t in texts:
        words.update(_py_tokens(t))
    pairs = Counter()
    for w, n in words.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += n
    rows = [(a, b, c) for (a, b), c in pairs.items()]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:top_k]


def test_pmi_hand_computed(spark):
    # corpus: "a b" x3, "a c" x1 -> T=8, c(a)=4, c(b)=3, c(c)=1
    texts = ["a b", "a b", "a b", "a c"]
    got = [
        tuple(r)
        for r in pmi_collocations(_docs(spark, texts), 1, 10).collect()
    ]
    # lift(a,b) = 3*8*1e6 // (4*3) = 2_000_000 (PMI ratio 2.0)
    # lift(a,c) = 1*8*1e6 // (4*1) = 2_000_000 — tie broken by count
    assert got == [
        ("a", "b", 3, 2_000_000),
        ("a", "c", 1, 2_000_000),
    ]


def test_pmi_min_count_filters(spark):
    texts = ["a b", "a b", "a c"]
    got = pmi_collocations(_docs(spark, texts), 2, 10).collect()
    assert [(r.w1, r.w2) for r in got] == [("a", "b")]


def test_bpe_hand_computed(spark):
    # "ab ab cab" -> words: ab x2, cab x1
    # pairs: (a,b) from ab x2 + cab x1 = 3; (c,a) = 1
    got = [
        tuple(r)
        for r in bpe_pair_counts(_docs(spark, ["ab ab cab"]), 10).collect()
    ]
    assert got == [("a", "b", 3), ("c", "a", 1)]


def test_degenerate_docs_ignored(spark):
    # empty / blank / 1-char-word docs produce no pairs and no crash
    texts = ["", "   ", "x", "x y"]
    pmi = pmi_collocations(_docs(spark, texts), 1, 10).collect()
    assert [(r.w1, r.w2, r.pair_count) for r in pmi] == [("x", "y", 1)]
    bpe = bpe_pair_counts(_docs(spark, texts), 10).collect()
    assert bpe == []  # all words are single-char


@pytest.mark.parametrize("n_parts", [1, 7])
def test_randomized_python_parity(spark, n_parts):
    rng = random.Random(42)
    vocab = ["ab", "abc", "bcd", "a", "cab", "dab", "bc"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30)))
        for _ in range(200)
    ]
    df = _docs(spark, texts).repartition(n_parts)
    got_pmi = [
        tuple(r) for r in pmi_collocations(df, 2, 15).collect()
    ]
    assert got_pmi == _py_pmi(texts, 2, 15)
    got_bpe = [tuple(r) for r in bpe_pair_counts(df, 15).collect()]
    assert got_bpe == _py_bpe(texts, 15)
