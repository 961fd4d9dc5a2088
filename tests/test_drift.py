"""Corpus drift terms (functions/drift.py): pure-Python parity of the
exact micro-ratio statistic and both rank heads on randomized
corpora, one-sided-term smoothing, the min_count floor, and the k
guard."""

import random

from ocr_translation_spark.functions.drift import corpus_drift_terms

import pytest


def _ref(docs_a, docs_b, k, min_count):
    ca, cb = {}, {}
    for d, c in ((docs_a, ca), (docs_b, cb)):
        for t in (tok for doc in d for tok in doc.split()):
            c[t] = c.get(t, 0) + 1
    vocab = set(ca) | set(cb)
    ta, tb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    scored = {
        t: (
            ca.get(t, 0),
            cb.get(t, 0),
            ((ca.get(t, 0) + 1) * (tb + v) * 1000000)
            // ((cb.get(t, 0) + 1) * (ta + v)),
        )
        for t in vocab
        if ca.get(t, 0) + cb.get(t, 0) >= min_count
    }
    by_desc = sorted(scored, key=lambda t: (-scored[t][2], t))[:k]
    by_asc = sorted(scored, key=lambda t: (scored[t][2], t))[:k]
    out = {}
    for r, t in enumerate(by_desc, 1):
        out[(t, "a")] = (*scored[t], r)
    for r, t in enumerate(by_asc, 1):
        out[(t, "b")] = (*scored[t], r)
    return out


def _dfs(spark, docs_a, docs_b):
    mk = lambda d: spark.createDataFrame(  # noqa: E731
        [(x,) for x in d], "text string"
    ).repartition(5)
    return mk(docs_a), mk(docs_b)


def test_matches_python_reference(spark):
    rng = random.Random(31)
    va = [f"w{i}" for i in range(30)] + ["acommon"] * 10
    vb = [f"w{i}" for i in range(15, 45)] + ["bcommon"] * 10
    docs_a = [" ".join(rng.choices(va, k=20)) for _ in range(60)]
    docs_b = [" ".join(rng.choices(vb, k=20)) for _ in range(60)]
    da, db = _dfs(spark, docs_a, docs_b)
    got = {
        (r["term"], r["direction"]):
        (r["cnt_a"], r["cnt_b"], r["ratio_micro"], r["rank"])
        for r in corpus_drift_terms(da, db, k=8, min_count=3).collect()
    }
    assert got == _ref(docs_a, docs_b, 8, 3)
    assert len(got) == 16


def test_one_sided_term_smoothing(spark):
    # "only_a" never appears in B: cb=0, the +1 smoothing keeps the
    # ratio finite and exactly computable
    docs_a = ["only_a shared shared"] * 5
    docs_b = ["shared shared shared"] * 5
    da, db = _dfs(spark, docs_a, docs_b)
    got = {
        (r["term"], r["direction"]): r["ratio_micro"]
        for r in corpus_drift_terms(da, db, k=2, min_count=1).collect()
    }
    # V=2, Ta=15, Tb=15: ratio(only_a) = 6*17*1e6 // (1*17) = 6e6
    assert got[("only_a", "a")] == 6000000


def test_min_count_floor_excludes_rare_terms(spark):
    docs_a = ["rare common common common common"]
    docs_b = ["common common common common"]
    da, db = _dfs(spark, docs_a, docs_b)
    terms = {
        r["term"]
        for r in corpus_drift_terms(da, db, k=5, min_count=2).collect()
    }
    assert "rare" not in terms and "common" in terms


def test_k_guard(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        corpus_drift_terms(df, df, k=0)
