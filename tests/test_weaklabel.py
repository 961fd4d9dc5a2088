"""Weak-supervision vote/report operators (functions/weaklabel)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions.weaklabel import (
    lf_report,
    majority_label,
)


def _lfs():
    return [
        ("lf_len_pos", F.when(F.col("n_chars") >= 300, 1).otherwise(0)),
        ("lf_len_neg", F.when(F.col("n_chars") < 120, -1).otherwise(0)),
        ("lf_kw_data", F.when(F.col("text").contains("data"), 1).otherwise(0)),
        ("lf_kw_slow", F.when(F.col("text").contains("slow"), -1).otherwise(0)),
        ("lf_lang_en", F.when(F.col("lang") == "en", 1).otherwise(0)),
    ]


def _hand_rows():
    return [
        (1, 350, "the data is slow", "en"),
        (2, 100, "fast table", "vi"),
        (3, 250, "data data", "en"),
        (4, 90, "slow slow", "en"),
    ]


def test_majority_hand_computed(spark):
    df = spark.createDataFrame(
        _hand_rows(), "doc_id long, n_chars long, text string, lang string"
    )
    got = sorted(tuple(r) for r in majority_label(df, _lfs()).collect())
    assert got == [(1, 3, 1, 1), (2, 0, 1, -1), (3, 2, 0, 1), (4, 1, 2, -1)]


def test_report_hand_computed(spark):
    df = spark.createDataFrame(
        _hand_rows(), "doc_id long, n_chars long, text string, lang string"
    )
    got = {r["lf_name"]: tuple(r)[1:] for r in lf_report(df, _lfs()).collect()}
    assert got["lf_len_pos"] == (4, 1, 250000, 1, 1)
    assert got["lf_len_neg"] == (4, 2, 500000, 1, 1)
    assert got["lf_kw_data"] == (4, 2, 500000, 2, 1)
    assert got["lf_kw_slow"] == (4, 2, 500000, 2, 2)
    assert got["lf_lang_en"] == (4, 3, 750000, 3, 2)


def test_report_randomized_python_parity(spark):
    rng = random.Random(20260819)
    k = 4
    votes = [
        tuple(rng.choice((-1, 0, 0, 1)) for _ in range(k))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, *v) for i, v in enumerate(votes)],
        "doc_id long, " + ", ".join(f"c{j} int" for j in range(k)),
    )
    lfs = [(f"lf{j}", F.col(f"c{j}")) for j in range(k)]
    got = {
        r["lf_name"]: (
            r["n_labeled"],
            r["n_overlap"],
            r["n_conflict"],
        )
        for r in lf_report(df, lfs).collect()
    }
    for j in range(k):
        lab = sum(1 for v in votes if v[j] != 0)
        ovl = sum(
            1
            for v in votes
            if v[j] != 0
            and any(v[i] != 0 for i in range(k) if i != j)
        )
        cfl = sum(
            1
            for v in votes
            if v[j] != 0
            and any(v[i] == -v[j] for i in range(k) if i != j)
        )
        assert got[f"lf{j}"] == (lab, ovl, cfl), (j, got[f"lf{j}"])
    # majority parity on the same rows
    maj = {
        r["doc_id"]: r["label"]
        for r in majority_label(df, lfs).collect()
    }
    for i, v in enumerate(votes):
        np_, nn_ = sum(1 for x in v if x == 1), sum(1 for x in v if x == -1)
        want = 1 if np_ > nn_ else (-1 if nn_ > np_ else 0)
        assert maj[i] == want


def test_out_of_range_vote_raises_in_plan(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, c int")
    bad = [("lf_bad", F.col("c"))]
    with pytest.raises(Exception, match="must be -1, 0, or 1"):
        majority_label(df, bad).collect()


def test_null_vote_is_abstain_and_empty_lfs_rejected(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 1)], "doc_id long, c int"
    )
    got = {
        r["doc_id"]: r["label"]
        for r in majority_label(df, [("lf", F.col("c"))]).collect()
    }
    assert got == {1: 0, 2: 1}
    with pytest.raises(ValueError):
        lf_report(df, [])
