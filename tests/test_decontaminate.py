"""Eval n-gram decontamination (functions/decontaminate.py)."""

from __future__ import annotations

from ocr_translation_spark.functions.decontaminate import (
    ngram_decontaminate,
)


def _run(spark, train_rows, eval_rows, k, **kw):
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    out = ngram_decontaminate(train, ev, k=k, **kw)
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_grams"],
            r["n_hit_positions"],
            r["n_hit_grams"],
            r["n_eval_docs_hit"],
            r["contaminated"],
        )
        for r in out.collect()
    }


def test_planted_leak_and_clean_doc(spark):
    got = _run(
        spark,
        [
            # shares the 3-gram "q1 q2 q3" once
            (1, "intro words q1 q2 q3 outro"),
            # clean
            (2, "totally different content here"),
            # shares it twice (two positions, one gram, one eval doc)
            (3, "q1 q2 q3 pad q1 q2 q3"),
        ],
        [(100, "q1 q2 q3 tail tokens")],
        k=3,
    )
    assert got[1] == (6, 4, 1, 1, 1, True)
    assert got[2] == (4, 2, 0, 0, 0, False)
    assert got[3] == (7, 5, 2, 1, 1, True)


def test_multiple_eval_docs_counted_distinct(spark):
    # the same leaked gram appears in TWO eval docs -> n_eval_docs_hit
    # = 2 but n_hit_positions / n_hit_grams stay 1
    got = _run(
        spark,
        [(1, "a b c d")],
        [(100, "x a b c"), (200, "a b c y"), (300, "unrelated text z")],
        k=3,
    )
    assert got[1] == (4, 2, 1, 1, 2, True)


def test_within_eval_repetition_not_multiplied(spark):
    # eval doc contains the gram twice; hit rows must not duplicate
    got = _run(
        spark,
        [(1, "a b c d")],
        [(100, "a b c pad a b c")],
        k=3,
    )
    assert got[1] == (4, 2, 1, 1, 1, True)


def test_short_and_blank_docs(spark):
    got = _run(
        spark,
        [(1, "only two"), (2, "   "), (3, "a b c")],
        [(100, "a b c")],
        k=3,
    )
    assert got[1] == (2, 0, 0, 0, 0, False)
    assert got[2] == (0, 0, 0, 0, 0, False)
    assert got[3] == (3, 1, 1, 1, 1, True)


def test_normalization_case_and_whitespace(spark):
    # case folding + whitespace collapse happen on BOTH sides
    got = _run(
        spark,
        [(1, "The   Quick Brown fox")],
        [(100, "the quick BROWN cat")],
        k=3,
    )
    assert got[1] == (4, 2, 1, 1, 1, True)


def test_shuffled_join_parity(spark):
    rows = [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(40)]
    ev = [(100 + j, f"w{3*j} w{3*j+1} w{3*j+2}") for j in range(10)]
    a = _run(spark, rows, ev, k=3, broadcast_eval=True)
    b = _run(spark, rows, ev, k=3, broadcast_eval=False)
    assert a == b
    assert any(v[5] for v in a.values())


def test_brute_force_parity_randomized(spark):
    import random

    rng = random.Random(20260819)
    vocab = [f"t{i}" for i in range(6)]  # tiny vocab -> real collisions
    k = 3

    def doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    train = [(i, doc(rng.randrange(0, 12))) for i in range(30)]
    ev = [(100 + j, doc(rng.randrange(0, 12))) for j in range(5)]

    def grams(text):
        toks = text.split()
        return [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ]

    eval_grams = {}
    for eid, t in ev:
        for g in set(grams(t)):
            eval_grams.setdefault(g, set()).add(eid)
    want = {}
    for did, t in train:
        toks = t.split()
        gs = grams(t)
        hit_pos = [i for i, g in enumerate(gs) if g in eval_grams]
        hit_grams = {gs[i] for i in hit_pos}
        eids = set().union(
            *(eval_grams[g] for g in hit_grams)
        ) if hit_grams else set()
        want[did] = (
            len(toks),
            max(len(toks) - k + 1, 0),
            len(hit_pos),
            len(hit_grams),
            len(eids),
            bool(hit_pos),
        )
    got = _run(spark, train, ev, k=k)
    assert got == want
