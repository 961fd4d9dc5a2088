"""Units: exact pairwise Pearson statistics + Cohen's kappa."""

from __future__ import annotations

import pytest

from ocr_translation_spark.functions.correlation import pairwise_corr
from ocr_translation_spark.functions.evaluation import cohens_kappa


def _py_corr_parts(rows, i, j):
    n = len(rows)
    sx = sum(r[i] for r in rows)
    sy = sum(r[j] for r in rows)
    sxx = sum(r[i] * r[i] for r in rows)
    syy = sum(r[j] * r[j] for r in rows)
    sxy = sum(r[i] * r[j] for r in rows)
    return n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy


def test_corr_exact_parts_and_r2(spark):
    rows = [(1, 2, 7), (2, 4, 1), (3, 6, 5), (4, 8, 2), (5, 10, 9)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = {
        (r["feat_x"], r["feat_y"]): r
        for r in pairwise_corr(df, ["x", "y", "z"]).collect()
    }
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    for (a, b), idx in {("x", "y"): (0, 1), ("x", "z"): (0, 2),
                        ("y", "z"): (1, 2)}.items():
        num, dx, dy = _py_corr_parts(rows, *idx)
        r = got[(a, b)]
        assert (int(r["num"]), int(r["den_x"]), int(r["den_y"])) == (
            num, dx, dy,
        ), (a, b)
        assert r["r2"] == round(num * num / (dx * dy), 6)
    # y = 2x exactly: perfect correlation
    assert got[("x", "y")]["r2"] == 1.0 and got[("x", "y")]["r_sign"] == 1


def test_corr_negative_and_constant(spark):
    rows = [(1, 5, 3), (2, 4, 3), (3, 3, 3), (4, 2, 3)]
    df = spark.createDataFrame(rows, "x long, y long, c long")
    got = {
        (r["feat_x"], r["feat_y"]): r
        for r in pairwise_corr(df, ["x", "y", "c"]).collect()
    }
    assert got[("x", "y")]["r_sign"] == -1
    assert got[("x", "y")]["r2"] == 1.0  # exactly anti-linear
    assert got[("x", "c")]["r2"] is None  # constant feature -> NULL
    assert int(got[("x", "c")]["den_y"]) == 0


def test_corr_validates(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        pairwise_corr(df, ["x"])
    with pytest.raises(ValueError):
        pairwise_corr(df, ["x", "x"])


def _kappa(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    return cohens_kappa(df, "a", "b").collect()[0]


def test_kappa_textbook_example(spark):
    # classic 2x2: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    pairs = ([("y", "y")] * 20 + [("y", "n")] * 5
             + [("n", "y")] * 10 + [("n", "n")] * 15)
    r = _kappa(spark, pairs)
    n, agree = 50, 35
    marg = 25 * 30 + 25 * 20  # yes marginals 25/30, no 25/20
    assert (r["n"], r["n_agree"], r["marginal_prod_sum"]) == (
        n, agree, marg,
    )
    num, den = n * agree - marg, n * n - marg
    assert r["kappa_ppm"] == (1_000_000 * num) // den  # positive here
    assert r["kappa_ppm"] == 400_000  # kappa = 0.4 exactly


def test_kappa_perfect_and_negative(spark):
    assert _kappa(spark, [("a", "a")] * 3 + [("b", "b")] * 2)[
        "kappa_ppm"
    ] == 1_000_000
    # systematic disagreement: kappa < 0, toward-zero division
    r = _kappa(spark, [("a", "b")] * 5 + [("b", "a")] * 5)
    num = 10 * 0 - (5 * 5 + 5 * 5)
    den = 100 - 50
    assert num < 0 and r["kappa_ppm"] == -((1_000_000 * -num) // den)


def test_kappa_degenerate_is_null(spark):
    r = _kappa(spark, [("a", "a")] * 4)  # both constant: pe = 1
    assert r["kappa_ppm"] is None
    assert r["n"] == 4 and r["n_agree"] == 4


def test_kappa_nulls_filtered(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", None), (None, "b"), ("b", "b")],
        "a string, b string",
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 2 and r["n_agree"] == 2


def test_corr_null_rows_dropped_complete_case(spark):
    rows = [(1, 2), (2, 4), (None, 9), (3, None), (3, 6)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = pairwise_corr(df, ["x", "y"]).collect()[0]
    num, dx, dy = _py_corr_parts([(1, 2), (2, 4), (3, 6)], 0, 1)
    assert (r["n"], int(r["num"]), int(r["den_x"]), int(r["den_y"])) == (
        3, num, dx, dy,
    )
    assert r["r2"] == 1.0


def test_kappa_survives_large_n_decimal_path(spark):
    # 8M rows would wrap pure-BIGINT ppm arithmetic (1e6 * ~1.6e13);
    # the DECIMAL(38,0) path must stay exact
    n_half = 4_000_000
    df = spark.range(2 * n_half).selectExpr(
        "case when id % 2 = 0 then 'a' else 'b' end as a",
        "case when id % 8 = 0 then 'b' else "
        "(case when id % 2 = 0 then 'a' else 'b' end) end as b",
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    n = 2 * n_half
    agree = r["n_agree"]
    marg = r["marginal_prod_sum"]
    num, den = n * agree - marg, n * n - marg
    assert r["kappa_ppm"] == (1_000_000 * num) // den
    assert 0 < r["kappa_ppm"] < 1_000_000
