"""Split-conformal thresholds (functions/conformal.py): exact order
statistic with the (n+1)-adjusted rank, the +inf small-n regime, and
the coverage audit."""

from __future__ import annotations

import math

import pytest

from ocr_translation_spark.functions.conformal import (
    conformal_rank,
    conformal_thresholds,
)


def _cal(spark, rows):
    return spark.createDataFrame(rows, "grp string, score double")


def _run(spark, cal_rows, test_rows, **kw):
    out = conformal_thresholds(
        _cal(spark, cal_rows), _cal(spark, test_rows), "grp", "score",
        **kw,
    )
    return {r["grp"]: r.asDict() for r in out.collect()}


def test_rank_formula_exact():
    # alpha = 0.1: k = ceil((n+1) * 9/10)
    for n in range(1, 50):
        assert conformal_rank(n, 1, 10) == math.ceil((n + 1) * 9 / 10)
    # alpha = 1/3
    for n in range(1, 50):
        assert conformal_rank(n, 1, 3) == math.ceil((n + 1) * 2 / 3)


def test_threshold_is_kth_smallest_with_n_plus_one_rank(spark):
    # n = 19, alpha = 0.1 -> k = ceil(20 * 0.9) = 18; the naive
    # ceil(n * 0.9) = 18 too, so push where they differ: n = 9 ->
    # conformal k = 9, naive k = ceil(8.1) = 9 ... use n = 10:
    # conformal k = ceil(11 * .9) = 10, naive = 9 — the (n+1) bites.
    scores = [float(s) for s in (5, 1, 9, 3, 7, 2, 8, 4, 6, 10)]
    got = _run(
        spark,
        [("g", s) for s in scores],
        [("g", 9.5), ("g", 10.5)],
    )["g"]
    assert got["n_cal"] == 10 and got["k_rank"] == 10
    assert got["threshold"] == 10.0  # 10th smallest, not 9th (9.0)
    assert got["n_test"] == 2 and got["n_covered"] == 1
    assert got["coverage_ppm"] == 500000


def test_ties_at_the_rank_boundary(spark):
    scores = [1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0]
    got = _run(spark, [("g", s) for s in scores], [("g", 2.0)])["g"]
    assert got["threshold"] == 2.0 and got["n_covered"] == 1


def test_small_n_degrades_to_infinite_threshold(spark):
    # n = 3, alpha = 0.1: k = ceil(4 * 0.9) = 4 > 3 -> +inf, cover all
    got = _run(
        spark,
        [("g", 1.0), ("g", 2.0), ("g", 3.0)],
        [("g", 1e12), ("g", -5.0)],
    )["g"]
    assert got["k_rank"] == 4
    assert math.isinf(got["threshold"])
    assert got["n_covered"] == 2 and got["coverage_ppm"] == 1000000


def test_group_routing_and_edges(spark):
    cal = (
        [("a", float(s)) for s in range(1, 21)]
        + [("b", float(s)) for s in range(1, 21)]
        + [(None, 1.0), ("c", None)]
    )
    test = [("a", 5.0), ("only_test", 1.0), (None, 2.0)]
    got = _run(spark, cal, test)
    assert set(got) == {"a", "b"}          # no cal -> no row
    assert got["a"]["n_test"] == 1
    assert got["b"]["n_test"] == 0         # no test rows
    assert got["b"]["coverage_ppm"] is None
    assert got["a"]["threshold"] == got["b"]["threshold"] == 19.0


def test_marginal_coverage_holds_on_exchangeable_scores(spark):
    # deterministic pseudo-random scores, same law both sides: the
    # realized coverage of a single split sits near 1 - alpha
    import hashlib

    def h(i):
        return int(hashlib.sha256(f"s{i}".encode()).hexdigest()[:8], 16)

    cal = [("g", float(h(i))) for i in range(0, 400, 2)]
    tst = [("g", float(h(i))) for i in range(1, 400, 2)]
    got = _run(spark, cal, tst)["g"]
    assert 850000 <= got["coverage_ppm"] <= 980000


def test_alpha_validation(spark):
    with pytest.raises(ValueError):
        conformal_thresholds(None, None, "g", "s", alpha_num=0)
    with pytest.raises(ValueError):
        conformal_thresholds(None, None, "g", "s", alpha_num=5, alpha_den=5)


def test_rank_for_out_of_range_raises(spark):
    from ocr_translation_spark.functions.selection import (
        group_exact_quantiles,
    )

    df = _cal(spark, [("g", 1.0), ("g", 2.0)])
    with pytest.raises(ValueError, match="outside"):
        group_exact_quantiles(
            df, "grp", "score", qs=("x",), rank_for=lambda q, n: n + 1
        )
