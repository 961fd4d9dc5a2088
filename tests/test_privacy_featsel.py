"""Units for the k-anonymity audit and chi-squared feature scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions.featsel import chi2_feature_scores
from ocr_translation_spark.functions.privacy import k_anonymity_audit


def test_k_anonymity_flags(spark):
    # group (a, 1): 3 rows, 1 sensitive value  -> k-violation (k=3 ok,
    #   k=4 not) and l-violation (all share the value)
    # group (b, 1): 4 rows, 3 sensitive values -> clean at k=4, l=3
    rows = [
        ("a", 1, "x"), ("a", 1, "x"), ("a", 1, "x"),
        ("b", 1, "x"), ("b", 1, "y"), ("b", 1, "z"), ("b", 1, "x"),
    ]
    df = spark.createDataFrame(rows, "qa string, qb long, s string")
    out = {
        (r.qa, r.qb): r
        for r in k_anonymity_audit(
            df, qi_cols=["qa", "qb"], sensitive_col="s", k=4, l=3
        ).collect()
    }
    a, b = out[("a", 1)], out[("b", 1)]
    assert a.group_size == 3 and a.k_violation and a.l_violation
    assert a.n_sensitive_distinct == 1
    assert b.group_size == 4 and not b.k_violation and not b.l_violation
    assert b.n_sensitive_distinct == 3


def test_k_anonymity_generalization_expressions(spark):
    # banding IS the remediation: with 10-unit age bands the two
    # singleton ages merge into one k=2 class
    df = spark.createDataFrame([(31, "u"), (39, "v")], "age long, s string")
    fine = k_anonymity_audit(df, [F.col("age")], "s", k=2, l=1).collect()
    assert all(r.k_violation for r in fine)
    banded = k_anonymity_audit(
        df, [F.expr("age div 10").alias("age_band")], "s", k=2, l=1
    ).collect()
    assert len(banded) == 1
    assert banded[0].age_band == 3 and not banded[0].k_violation


def test_k_anonymity_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", "s")], "q string, s string")
    with pytest.raises(ValueError):
        k_anonymity_audit(df, ["q"], "s", k=0, l=1)


def _chi2_reference(rows, feature_ix=0, label_ix=1):
    """Pure-Python mirror of the exact integer chi-squared form."""
    from collections import Counter

    cells = Counter((r[feature_ix], r[label_ix]) for r in rows)
    feats = Counter(r[feature_ix] for r in rows)
    labs = Counter(r[label_ix] for r in rows)
    n = len(rows)
    out = {}
    for f, r_tot in feats.items():
        s = 0
        for l, c_tot in labs.items():
            o = cells.get((f, l), 0)
            d = o * n - r_tot * c_tot
            s += (d * d) // (r_tot * c_tot)
        out[f] = (r_tot, (s * 1_000_000) // n)
    return out


def test_chi2_matches_pure_python_reference(spark):
    rows = [
        ("src_a", "en"), ("src_a", "en"), ("src_a", "en"), ("src_a", "vi"),
        ("src_b", "vi"), ("src_b", "vi"), ("src_b", "en"),
        ("src_c", "en"), ("src_c", "de"),
    ]
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {
        r.feature_value: (r.n_rows, r.chi2_micro)
        for r in chi2_feature_scores(df, "source", "lang").collect()
    }
    assert got == _chi2_reference(rows)


def test_chi2_zero_cells_score(spark):
    # src_b never co-occurs with 'en' — the absent cell must still
    # contribute (skipping it understates the statistic): in a
    # perfectly label-separated 2x2 table each feature ROW carries
    # exactly half the full-table statistic N, and half of each row's
    # share comes from its ZERO cell
    rows = [("src_a", "en")] * 5 + [("src_b", "vi")] * 5
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {
        r.feature_value: r.chi2_micro
        for r in chi2_feature_scores(df, "source", "lang").collect()
    }
    n = len(rows)
    half = n * 1_000_000 // 2
    assert got == {"src_a": half, "src_b": half}
    # and the pure-Python mirror agrees
    assert got == {f: v[1] for f, v in _chi2_reference(rows).items()}


def test_chi2_independent_feature_scores_zero(spark):
    # identical label distribution under every feature value -> d = 0
    # in every cell -> chi2 exactly 0 (no float fuzz to threshold)
    rows = [
        (f, l)
        for f in ("src_a", "src_b", "src_c")
        for l in ("en", "en", "vi")
    ]
    df = spark.createDataFrame(rows, "source string, lang string")
    got = chi2_feature_scores(df, "source", "lang").collect()
    assert {r.chi2_micro for r in got} == {0}
    assert {r.n_rows for r in got} == {3}


def test_chi2_null_label_category_scores_correctly(spark):
    # a NULL label is a first-class category: the grid rejoin must be
    # null-safe or the observed (f, NULL) counts silently zero out and
    # every feature's statistic inflates (review-finding regression)
    rows = [
        ("src_a", "en"), ("src_a", None), ("src_a", None),
        ("src_b", "en"), ("src_b", "en"), ("src_b", None),
    ]
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {
        r.feature_value: (r.n_rows, r.chi2_micro)
        for r in chi2_feature_scores(df, "source", "lang").collect()
    }
    assert got == _chi2_reference(rows)
    # and the statistic is genuinely non-zero here (distributions differ)
    assert any(v[1] > 0 for v in got.values())
