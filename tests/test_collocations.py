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


# ---------------------------------------------------------------------------
# bpe_train_merges — iterative distributed BPE training
# ---------------------------------------------------------------------------


def _py_bpe_train(texts, rounds):
    """Pure-Python greedy BPE reference: per round, count adjacent
    symbol pairs weighted by word frequency, pick argmax (count desc,
    then lexicographic), merge greedily left-to-right."""
    words = Counter()
    for t in texts:
        words.update(w for w in _py_tokens(t) if ";" not in w)
    seqs = {w: list(w) for w in words}
    merges = []
    for rnd in range(1, rounds + 1):
        counts = Counter()
        for w, n in words.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += n
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, l, r, c))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_train_merges_hand_computed(spark):
    from ocr_translation_spark.functions.collocations import (
        bpe_train_merges,
    )

    # 'ab' dominates round 1; round 2 must see the MERGED symbol 'ab'
    # pairing with 'c' (the multi-char-symbol path), not raw chars.
    texts = ["abc abc abc abd", "abc abd abd xy"]
    got = [tuple(r) for r in bpe_train_merges(_docs(spark, texts), 2).collect()]
    assert got == [(1, "a", "b", 7), (2, "ab", "c", 4)]


def test_bpe_train_merges_greedy_run_collapse(spark):
    from ocr_translation_spark.functions.collocations import (
        bpe_train_merges,
    )

    # 'aaaa' under merge (a,a) must collapse to [aa, aa] (greedy
    # left-to-right, both symbols consumed per match) so round 2's
    # top pair is (aa, aa) — the case a shared-separator encoding
    # gets wrong.
    texts = ["aaaa aaaa aaaa"]
    got = [tuple(r) for r in bpe_train_merges(_docs(spark, texts), 2).collect()]
    assert got[0] == (1, "a", "a", 9)
    assert got[1] == (2, "aa", "aa", 3)


def test_bpe_train_merges_randomized_parity(spark):
    from ocr_translation_spark.functions.collocations import (
        bpe_train_merges,
    )

    rng = random.Random(20260818)
    vocab = ["aa", "ab", "ba", "abc", "cab", "a", "b", "c", "abab"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
        for _ in range(40)
    ]
    expect = _py_bpe_train(texts, 5)
    got = [tuple(r) for r in bpe_train_merges(_docs(spark, texts), 5).collect()]
    assert got == expect


def test_bpe_train_merges_stops_when_no_pairs(spark):
    from ocr_translation_spark.functions.collocations import (
        bpe_train_merges,
    )

    got = bpe_train_merges(_docs(spark, ["a b c", "b c a"]), 3).collect()
    assert got == []  # all words are single symbols: no pair to merge


# ---------------------------------------------------------------------------
# word_cooccurrence — GloVe-style windowed counting
# ---------------------------------------------------------------------------


def _py_cooc(texts, window, top_k):
    agg = {}
    for t in texts:
        toks = _py_tokens(t)
        for i in range(len(toks)):
            for j in range(i + 1, min(i + window, len(toks) - 1) + 1):
                key = tuple(sorted((toks[i], toks[j])))
                n, w = agg.get(key, (0, 0))
                agg[key] = (n + 1, w + 1_000_000 // (j - i))
    rows = [(k[0], k[1], n, w) for k, (n, w) in agg.items()]
    rows.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    return rows[:top_k]


def test_word_cooccurrence_hand_computed(spark):
    from ocr_translation_spark.functions.collocations import (
        word_cooccurrence,
    )

    # "x y x": pairs (x,y,d=1), (y,x,d=1), (x,x,d=2) — the self-pair
    # and the symmetric canonicalization both exercised.
    got = {
        (r["w1"], r["w2"]): (r["n_pairs"], r["weight_micro"])
        for r in word_cooccurrence(
            _docs(spark, ["x y x"]), window=4
        ).collect()
    }
    assert got == {("x", "y"): (2, 2_000_000), ("x", "x"): (1, 500_000)}


def test_word_cooccurrence_randomized_parity(spark):
    from ocr_translation_spark.functions.collocations import (
        word_cooccurrence,
    )

    rng = random.Random(42)
    vocab = list("abcdefg")
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15)))
        for _ in range(60)
    ]
    expect = _py_cooc(texts, 3, 30)
    got = [
        tuple(r)
        for r in word_cooccurrence(
            _docs(spark, texts), window=3, top_k=30
        ).collect()
    ]
    assert got == expect


def _py_bpe_encode(texts, merges):
    out = {}
    for i, t in enumerate(texts):
        toks = []
        for w in _py_tokens(t):
            s = list(w)
            for l, r in merges:
                nxt, j = [], 0
                while j < len(s):
                    if j + 1 < len(s) and s[j] == l and s[j + 1] == r:
                        nxt.append(l + r)
                        j += 2
                    else:
                        nxt.append(s[j])
                        j += 1
                s = nxt
            toks.extend(s)
        out[i] = toks
    return out


def test_bpe_encode_randomized_parity_with_training(spark):
    from ocr_translation_spark.functions.collocations import (
        bpe_encode,
        bpe_train_merges,
    )

    rng = random.Random(777)
    vocab = ["aa", "ab", "abc", "cab", "abab", "bc", "c"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10)))
        for _ in range(30)
    ]
    df = _docs(spark, texts)
    merges = [
        (r["left"], r["right"])
        for r in bpe_train_merges(df, rounds=4).collect()
    ]
    expect = _py_bpe_encode(texts, merges)
    got = {
        r["doc_id"]: (r["n_tokens"], r["tokens_csv"])
        for r in bpe_encode(df, merges, preview_tokens=100).collect()
    }
    for i, toks in expect.items():
        assert got[i] == (len(toks), " ".join(toks[:100])), i


def test_bpe_encode_plan_is_shuffle_free(spark):
    from ocr_translation_spark.functions.collocations import bpe_encode

    df = spark.range(20).selectExpr(
        "id as doc_id", "concat('abc abd w', id) as text"
    )
    plan = (
        bpe_encode(df, [("a", "b"), ("ab", "c")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_word_cooccurrence_single_exchange_no_python(spark):
    """Row-local pair generation: ONE pair-keyed exchange, TakeOrdered
    top-k (no global sort), zero Python crossings."""
    from ocr_translation_spark.functions.collocations import (
        word_cooccurrence,
    )

    df = spark.range(200).selectExpr(
        "id as doc_id",
        "concat('a b c d e f g w', id % 7) as text",
    )
    plan = (
        word_cooccurrence(df, window=4, top_k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _py_textrank(texts, window=2, iters=3):
    import re

    edges = set()
    for t in texts:
        toks = [
            w
            for w in re.sub(r"\s+", " ", t.strip().lower()).split(" ")
            if w != ""
        ]
        for i in range(len(toks)):
            for d in range(1, window + 1):
                if i + d < len(toks) and toks[i] != toks[i + d]:
                    a, b = sorted((toks[i], toks[i + d]))
                    edges.add((a, b))
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    r = {v: 1_000_000 for v in nbrs}
    for _ in range(iters):
        s = {v: 0 for v in nbrs}
        for u, ns in nbrs.items():
            c = r[u] // len(ns)
            for v in ns:
                s[v] += c
        r = {v: 150_000 + (850_000 * s[v]) // 1_000_000 for v in nbrs}
    return sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))


def test_textrank_python_parity(spark):
    from ocr_translation_spark.functions.collocations import (
        textrank_keywords,
    )

    texts = [
        "spark shuffles data across the cluster",
        "the cluster shuffles spark data",
        "graph ranking ranks graph vertices",
        "solo",
        "  ",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.term, r.rank_micro)
        for r in textrank_keywords(df, window=2, iterations=3).collect()
    ]
    assert got == _py_textrank(texts)
    # hub term ("spark"/"data"/"cluster" region) outranks leaf terms
    ranks = dict(got)
    assert ranks["data"] > ranks["solo"] if "solo" in ranks else True
    assert "solo" not in ranks  # isolated token: no edges, no vertex


def test_textrank_partition_invariance(spark):
    from ocr_translation_spark.functions.collocations import (
        textrank_keywords,
    )

    import random

    rng = random.Random(20260819)
    vocab = [f"w{i}" for i in range(15)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 12)))
        for _ in range(40)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = [
        tuple(r)
        for r in textrank_keywords(df, top_k=10).collect()
    ]
    b = [
        tuple(r)
        for r in textrank_keywords(df.repartition(11), top_k=10).collect()
    ]
    assert a == b
    full = _py_textrank(texts)
    assert a == full[:10]
