"""Exact Spearman: Fraction-exact mirror with heavy ties."""

from __future__ import annotations

import random
from fractions import Fraction

from ocr_translation_spark.functions.correlation import (
    spearman_rank_corr,
)


def _avg_rank2(vals):
    """2-scaled tied-average ranks (exact integers)."""
    out = []
    s = sorted(vals)
    for v in vals:
        smaller = sum(1 for w in s if w < v)
        ties = sum(1 for w in s if w == v)
        out.append(2 * smaller + ties + 1)
    return out


def _mirror(xs, ys):
    rx, ry = _avg_rank2(xs), _avg_rank2(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    return num, dx, dy


def _ppm(num, dx, dy):
    if dx <= 0 or dy <= 0:
        return None
    a = (abs(num) * 1_000_000) // dx
    b = (a * abs(num)) // dy
    return (1 if num >= 0 else -1) * b


def _run(spark, xs, ys):
    df = spark.createDataFrame(
        list(zip(xs, ys)), "x long, y long"
    )
    return spearman_rank_corr(df, "x", "y").collect()[0]


def test_randomized_tied_parity(spark):
    rng = random.Random(42)
    xs = [rng.randint(0, 6) for _ in range(80)]  # heavy ties
    ys = [x + rng.randint(-2, 2) for x in xs]  # monotone-ish, tied
    num, dx, dy = _mirror(xs, ys)
    row = _run(spark, xs, ys)
    assert int(row["num"]) == num
    assert int(row["den_x"]) == dx
    assert int(row["den_y"]) == dy
    assert row["rho2_signed_ppm"] == _ppm(num, dx, dy)
    # the exact pieces reproduce rho^2 as a Fraction
    assert Fraction(num * num, dx * dy) <= 1


def test_perfect_monotone_is_one(spark):
    xs = list(range(1, 31))
    ys = [3 * x + 7 for x in xs]
    row = _run(spark, xs, ys)
    assert row["rho2_signed_ppm"] == 1_000_000
    assert row["r_sign"] == 1


def test_perfect_reversal_is_minus_one(spark):
    xs = list(range(1, 31))
    ys = [-2 * x for x in xs]
    row = _run(spark, xs, ys)
    assert row["rho2_signed_ppm"] == -1_000_000
    assert row["r_sign"] == -1


def test_constant_column_null_rho(spark):
    row = _run(spark, [1, 2, 3, 4], [5, 5, 5, 5])
    assert row["rho2_signed_ppm"] is None


def test_ties_use_average_ranks_not_first(spark):
    # all-tied x pairs with distinct y: average ranks make num == 0
    # (first/dense ranks would not)
    xs = [1, 1, 2, 2]
    ys = [1, 2, 3, 4]
    num, dx, dy = _mirror(xs, ys)
    row = _run(spark, xs, ys)
    assert int(row["num"]) == num
    assert row["rho2_signed_ppm"] == _ppm(num, dx, dy)
