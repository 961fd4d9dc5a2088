"""Skip-gram negative sampling: CDF construction + deterministic draws."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

from pyspark.sql import functions as F

from ocr_translation_spark.functions.negsamp import (
    skipgram_negsamp,
    unigram_cdf,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t.split()) for i, t in enumerate(texts)],
        "doc_id long, toks array<string>",
    )


def _py_expected(texts, vocab_size, m):
    counts = Counter(w for t in texts for w in t.split())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    cdf, lo = [], 0
    for w, c in top:
        cdf.append((w, lo, lo + c))
        lo += c
    total = lo
    vocab = {w for w, _, _ in cdf}

    def resolve(u):
        for w, a, b in cdf:
            if a <= u < b:
                return w
        raise AssertionError(u)

    out = Counter()
    for did, t in enumerate(texts):
        toks = t.split()
        for i in range(len(toks) - 1):
            pos = i + 1
            for d, c, w in (("f", toks[i], toks[i + 1]),
                            ("b", toks[i + 1], toks[i])):
                if c not in vocab or w not in vocab:
                    continue
                out[(c, w, 1)] += 1
                for j in range(m):
                    key = f"neg:{did}:{pos}:{d}:{j}"
                    u = int(
                        hashlib.sha256(key.encode()).hexdigest()[:15], 16
                    ) % total
                    out[(c, resolve(u), 0)] += 1
    return dict(out)


TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cat and dog and cat",
    "rare singleton",
    "the the the",
]


def test_unigram_cdf_order_and_intervals(spark):
    cdf = unigram_cdf(_docs(spark, TEXTS), F.col("toks"), vocab_size=3)
    # 'the' (7) first; 'cat' (3) beats 'and'/'on'/'sat' (2) and ties
    # broken by term asc among count-2 words -> 'and'
    assert [t for t, _, _ in cdf] == ["the", "cat", "and"]
    assert cdf[0] == ("the", 0, 7)
    assert cdf[1] == ("cat", 7, 10)
    assert cdf[2] == ("and", 10, 12)


@pytest.mark.parametrize("vocab_size,m", [(16, 2), (4, 1), (3, 0)])
def test_matches_pure_python_mirror(spark, vocab_size, m):
    got = {
        (r["center"], r["word"], r["label"]): r["n_pairs"]
        for r in skipgram_negsamp(
            _docs(spark, TEXTS), F.col("toks"),
            vocab_size=vocab_size, negatives_per_pair=m,
        ).collect()
    }
    assert got == _py_expected(TEXTS, vocab_size, m)


def test_oov_pairs_dropped_both_sides(spark):
    got = skipgram_negsamp(
        _docs(spark, TEXTS), F.col("toks"),
        vocab_size=1, negatives_per_pair=1,
    ).collect()
    # only 'the'-'the' adjacencies survive a 1-word vocab
    assert {(r["center"], r["word"]) for r in got} == {("the", "the")}
    pos = [r for r in got if r["label"] == 1]
    # 'the the the' has two adjacent the-the pairs, both directions
    assert pos[0]["n_pairs"] == 4
    negs = [r for r in got if r["label"] == 0]
    assert negs and negs[0]["n_pairs"] == 4  # every draw resolves to 'the'


def test_single_token_docs_emit_nothing(spark):
    out = skipgram_negsamp(
        _docs(spark, ["solo", "alone"]), F.col("toks"), vocab_size=4
    )
    assert out.count() == 0


def test_negative_draw_distribution_tracks_frequency(spark):
    # 'the' holds 7/12 of the CDF mass: over all draws it must be the
    # modal negative (sanity on proportional sampling, not exactness)
    rows = skipgram_negsamp(
        _docs(spark, TEXTS), F.col("toks"),
        vocab_size=16, negatives_per_pair=4,
    ).filter("label = 0").collect()
    by_word = Counter()
    for r in rows:
        by_word[r["word"]] += r["n_pairs"]
    assert by_word.most_common(1)[0][0] == "the"


def test_validates_params(spark):
    with pytest.raises(ValueError):
        skipgram_negsamp(
            _docs(spark, TEXTS), F.col("toks"), negatives_per_pair=-1
        )
