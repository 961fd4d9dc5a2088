"""Unit tests for the round-5 additions: Unicode canonicalization,
the hashed linear quality classifier, and cohort retention — value
semantics plus the plan-shape guarantees their docstrings promise
(row-local ops stay shuffle-free; only the NFC step crosses to
Python, Arrow-batched)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F

from ocr_translation_spark.functions.classifier import (
    hashed_linear_score,
)
from ocr_translation_spark.functions.normalize import (
    canonical_fingerprint,
    canonicalize_text,
)
from ocr_translation_spark.functions.retention import cohort_retention


# ---------------------------------------------------------------- NFC


def test_nfd_and_nfc_forms_canonicalize_identically(spark):
    nfd = "Cafe\u0301  du\tMonde"  # e + combining acute, run of 2 sp
    nfc = "Caf\u00e9 du Monde"  # precomposed, single spaces
    df = spark.createDataFrame(
        [Row(doc_id=1, text=nfd), Row(doc_id=2, text=nfc)]
    )
    out = canonicalize_text(df).select("canon_text").collect()
    assert out[0][0] == out[1][0] == "caf\u00e9 du monde"


def test_canonicalize_is_idempotent(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=" A\u0308rger   im\r\nBu\u0308ro ")]
    )
    once = canonicalize_text(df, out_col="c1")
    twice = canonicalize_text(once, text_col="c1", out_col="c2")
    r = twice.select("c1", "c2").first()
    assert r["c1"] == r["c2"] == "\u00e4rger im b\u00fcro"


def test_canonical_fingerprint_collapses_byte_different_twins(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="RE\u0301SUME\u0301 draft"),
            Row(doc_id=2, text="r\u00e9sum\u00e9\tdraft"),
            Row(doc_id=3, text="unrelated text"),
        ]
    )
    fp = canonical_fingerprint(df).collect()
    by_id = {r["doc_id"]: r for r in fp}
    assert by_id[1]["canon_sha256"] == by_id[2]["canon_sha256"]
    assert by_id[1]["canon_len"] == len("r\u00e9sum\u00e9 draft")
    assert by_id[3]["canon_sha256"] != by_id[1]["canon_sha256"]


def test_canonical_fingerprint_plan_is_row_local(spark):
    """Zero shuffles; exactly one Arrow Python crossing (the NFC
    step) — everything else stays in JVM codegen."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t "), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        canonical_fingerprint(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1


# --------------------------------------------------------- classifier


def test_classifier_is_deterministic_and_consistent(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox"),
            Row(doc_id=2, text="the quick brown fox"),
            Row(doc_id=3, text="jumps over the lazy dog"),
        ]
    )
    rows = {
        r["doc_id"]: r for r in hashed_linear_score(df).collect()
    }
    assert rows[1]["logit"] == rows[2]["logit"]
    assert rows[1]["n_tokens"] == 4
    for r in rows.values():
        assert r["keep"] == (r["logit"] > 0)


def test_classifier_handles_degenerate_docs(spark):
    """Single-token and empty docs must not trip the sequence(1, n-1)
    descending-range guard."""
    df = spark.createDataFrame(
        [Row(doc_id=1, text="solo"), Row(doc_id=2, text="")]
    )
    rows = {r["doc_id"]: r for r in hashed_linear_score(df).collect()}
    # a single token has no bigrams: logit == its unigram weight,
    # which is bounded by the weight range
    assert abs(rows[1]["logit"]) <= 1000
    assert rows[2]["n_tokens"] == 1  # split('') -> ['']


def test_classifier_bigrams_change_the_score(spark):
    """Same bag of words, different order => different bigrams =>
    (almost surely) different logit; with bigrams off they tie."""
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta"),
            Row(doc_id=2, text="delta gamma beta alpha"),
        ]
    )
    with_bi = {
        r["doc_id"]: r["logit"]
        for r in hashed_linear_score(df).collect()
    }
    no_bi = {
        r["doc_id"]: r["logit"]
        for r in hashed_linear_score(df, use_bigrams=False).collect()
    }
    assert no_bi[1] == no_bi[2]
    assert with_bi[1] != with_bi[2]


def test_classifier_plan_no_shuffle_no_python(spark):
    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("a few plain tokens here").alias("text"),
    )
    plan = (
        hashed_linear_score(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan


# ---------------------------------------------------------- retention


def test_cohort_retention_hand_case(spark):
    """u1 joins week of Mon 2024-01-01 and returns 2 weeks later; u2
    joins the next week and never returns; u3 shares u1's cohort."""
    ts = datetime.datetime
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=ts(2024, 1, 2, 10)),  # cohort 01-01
            Row(user_id=1, ts=ts(2024, 1, 17, 9)),  # offset 2
            Row(user_id=3, ts=ts(2024, 1, 7, 23)),  # Sun, cohort 01-01
            Row(user_id=2, ts=ts(2024, 1, 8, 0)),  # Mon, cohort 01-08
        ]
    )
    rows = {
        (r["cohort_week"], r["week_offset"]): (
            r["active_users"],
            r["n_events"],
        )
        for r in cohort_retention(df).collect()
    }
    assert rows == {
        ("2024-01-01", 0): (2, 2),
        ("2024-01-01", 2): (1, 1),
        ("2024-01-08", 0): (1, 1),
    }


def test_cohort_retention_offsets_non_negative(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = cohort_retention(ev)
    assert out.filter(F.col("week_offset") < 0).count() == 0
    # every user's cohort row (offset 0) must exist
    n_cohorts = out.filter(F.col("week_offset") == 0).count()
    assert n_cohorts >= 1


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
