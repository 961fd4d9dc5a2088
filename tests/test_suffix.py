"""Suffix prefix-doubling exact-substring duplicate spans
(functions/suffix.py) vs a brute-force pure-Python mirror."""

from __future__ import annotations

import random

import pytest

from ocr_translation_spark.functions.suffix import (
    substring_dup_spans,
    suffix_classes,
)


def _brute_spans(texts: dict[int, str], L: int):
    """Independent mirror: window dictionary -> duplicated positions ->
    merged spans. No suffix machinery."""
    windows: dict[str, int] = {}
    for t in texts.values():
        for p in range(len(t) - L + 1):
            w = t[p:p + L]
            windows[w] = windows.get(w, 0) + 1
    out = {}
    for did, t in texts.items():
        dup = [
            p
            for p in range(len(t) - L + 1)
            if windows[t[p:p + L]] >= 2
        ]
        spans = []
        for p in dup:
            if spans and p <= spans[-1][1] + L:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        covered = sum(e + L - s for s, e in spans)
        out[did] = (
            max(len(t) - L + 1, 0),
            len(dup),
            len(spans),
            covered,
        )
    return out


def _run(spark, texts: dict[int, str], L: int):
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    rows = substring_dup_spans(df, min_len=L).collect()
    return {
        r["doc_id"]: (
            r["n_windows"],
            r["dup_windows"],
            r["n_spans"],
            r["covered_chars"],
        )
        for r in rows
    }


def test_suffix_classes_equal_iff_prefix_equal(spark):
    texts = {
        0: "abcdabcdX",
        1: "abcdefgh",
        2: "ab",  # shorter than max_k: sentinel semantics
        3: "ab",  # identical short doc
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    rows = suffix_classes(df, max_k=4).collect()
    cls = {(r["doc_id"], r["pos"]): r["cls"] for r in rows}

    def prefix(did, pos, k=4):
        t = texts[did]
        # sentinel-padded: suffixes shorter than k are padded with a
        # char no real suffix contains, so equality == exact equality
        return (t[pos:pos + k], max(0, k - (len(t) - pos)))

    keys = list(cls)
    for a in keys:
        for b in keys:
            same = prefix(*a) == prefix(*b)
            assert (cls[a] == cls[b]) == same, (a, b)


def test_planted_cross_doc_duplicate(spark):
    boiler = "SUBSCRIBE-TO-OUR-NEWSLETTER-TODAY-FOR-MORE!"  # 43 chars
    texts = {
        0: "unique prefix zero " + boiler,
        1: "a different lead-in " + boiler + " and a tail",
        2: "no duplicates here at all, just original text",
    }
    L = 32
    assert _run(spark, texts, L) == _brute_spans(texts, L)


def test_within_doc_repeat_and_overlap_merge(spark):
    block = "0123456789abcdef0123456789ABCDEF"  # 32 chars
    texts = {
        0: block + "-middle-" + block,  # self-repeat, two spans
        1: block * 2,  # overlapping duplicated windows, one span
        2: "x" * 80,  # run of one char: everything duplicated
    }
    assert _run(spark, texts, 32) == _brute_spans(texts, 32)


def test_short_empty_and_boundary_docs(spark):
    texts = {
        0: "",  # empty
        1: "tiny",  # far below L
        2: "exactly-thirty-two-characters-!!",  # == L, 1 window
        3: "exactly-thirty-two-characters-!!",  # its duplicate
        4: "exactly-thirty-two-characters-!?",  # 1 char off: no dup
    }
    assert len(texts[2]) == 32
    assert _run(spark, texts, 32) == _brute_spans(texts, 32)


def test_randomized_corpus_matches_brute_force(spark):
    rng = random.Random(7)
    alpha = "ab"
    texts = {
        i: "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        for i in range(24)
    }
    # binary alphabet, L=8: organic duplicates guaranteed and messy
    assert _run(spark, texts, 8) == _brute_spans(texts, 8)


def test_partition_invariance(spark):
    rng = random.Random(11)
    texts = {
        i: "".join(
            rng.choice("abc") for _ in range(rng.randint(10, 60))
        )
        for i in range(16)
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    a = sorted(
        map(tuple, substring_dup_spans(df, min_len=8).collect())
    )
    b = sorted(
        map(
            tuple,
            substring_dup_spans(
                df.repartition(7), min_len=8
            ).collect(),
        )
    )
    assert a == b


def test_max_k_must_be_power_of_two(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        suffix_classes(df, max_k=12)


def test_large_max_k_widens_the_pid_margin(spark):
    # the doubling step reaches max_k/2; the packed-space margin must
    # scale with it or pid+k crosses into the next document's range —
    # verify a 256-threshold run stays exact on adjacent doc_ids
    texts = {
        0: "A" * 300,
        1: "A" * 300,  # duplicated 256-window across adjacent ids
        # all-distinct characters: no window repeats anywhere
        2: "".join(chr(33 + i) for i in range(300)),
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["dup_windows"], r["n_windows"])
        for r in substring_dup_spans(df, min_len=256).collect()
    }
    assert got[0] == (45, 45) and got[1] == (45, 45)
    assert got[2] == (0, 45)
    # and the guard itself refuses a max_k the pid space cannot host
    with pytest.raises(ValueError):
        suffix_classes(df, max_k=1 << 21)
