"""Unit tests for rolling_active_users (growth.py), srm_check
(experiment.py), and stratified_kfold (splitting.py) — the value
oracles prove Spark == DuckDB on the derived corpora; these prove the
operators compute the RIGHT thing on hand-built and adversarial
inputs (window churn, dead spine days, exact chi-square rationals,
missing arms, balance bounds)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict
from fractions import Fraction

import pytest

from ocr_translation_spark.functions.experiment import srm_check
from ocr_translation_spark.functions.growth import rolling_active_users
from ocr_translation_spark.functions.splitting import stratified_kfold


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, 12, 0)) for u, d in rows],
        "user_id long, ts timestamp",
    )


def _wau(spark, rows, window_days=7):
    out = rolling_active_users(
        _events(spark, rows), window_days=window_days
    ).collect()
    return {r.day: (r.dau, r.wau) for r in out}


def test_wau_churn_and_dead_days(spark):
    # activity on days 1 and 10 only: user 1 stops contributing after
    # day 7 (window churn), days 8-9 exist in the spine with 0/0
    got = _wau(spark, [(1, 1), (2, 1), (1, 10)])
    assert len(got) == 10  # full calendar spine, no gaps
    assert got["2024-01-01"] == (2, 2)
    assert got["2024-01-07"] == (0, 2)  # last day of day-1's window
    assert got["2024-01-08"] == (0, 0)  # dead day: activity aged out
    assert got["2024-01-09"] == (0, 0)
    assert got["2024-01-10"] == (1, 1)


def test_wau_distinct_not_sum(spark):
    # the same user on every window day counts ONCE
    got = _wau(spark, [(7, d) for d in range(1, 6)])
    assert got["2024-01-05"] == (1, 1)


def test_wau_window_one_equals_dau(spark):
    rows = [(1, 1), (2, 1), (1, 2), (3, 4)]
    got = _wau(spark, rows, window_days=1)
    assert all(dau == wau for dau, wau in got.values())


def test_wau_matches_python_mirror(spark):
    import random

    rng = random.Random(42)
    rows = [
        (rng.randint(1, 20), rng.randint(1, 25)) for _ in range(300)
    ]
    got = _wau(spark, rows)
    days = sorted({d for _, d in rows})
    byday = defaultdict(set)
    for u, d in rows:
        byday[d].add(u)
    for d in range(days[0], days[-1] + 1):
        dau = len(byday.get(d, set()))
        wau = len(set().union(*[
            byday.get(x, set()) for x in range(d - 6, d + 1)
        ]))
        assert got[f"2024-01-{d:02d}"] == (dau, wau)


def test_wau_rejects_bad_window(spark):
    with pytest.raises(ValueError):
        rolling_active_users(_events(spark, [(1, 1)]), window_days=0)


# ---------------------------------------------------------------------------


def _asg(spark, counts):
    """counts: {(experiment, arm): n} -> one row per unit."""
    rows = []
    uid = 0
    for (exp, arm), n in counts.items():
        for _ in range(n):
            rows.append((exp, uid, arm))
            uid += 1
    return spark.createDataFrame(
        rows, "experiment string, unit long, arm string"
    )


def _chi2_ppm_exact(obs: dict[str, int], weights: dict[str, int]) -> int:
    n = sum(obs.values())
    tw = sum(weights.values())
    total = 0
    for a, w in weights.items():
        o = obs.get(a, 0)
        num = (o * tw - n * w) ** 2 * 1_000_000
        total += num // (tw * n * w)  # the op's per-arm truncation
    return total


def test_srm_exact_value_and_flag(spark):
    counts = {("e", "A"): 700, ("e", "B"): 300}
    out = srm_check(
        _asg(spark, counts), arm_col="arm",
        weights={"A": 1, "B": 1},
    ).collect()
    (r,) = out
    expect = _chi2_ppm_exact({"A": 700, "B": 300}, {"A": 1, "B": 1})
    assert int(r.chi2_ppm) == expect
    # sanity vs the unrounded rational: truncation loses < n_arms ppm
    exact = sum(
        Fraction((o * 2 - 1000) ** 2, 2 * 1000)
        for o in (700, 300)
    ) * 1_000_000
    assert 0 <= exact - int(r.chi2_ppm) < 2
    assert r.srm_flag  # 160e6 ppm >> 10.8e6
    assert r.n_units == 1000


def test_srm_balanced_not_flagged(spark):
    out = srm_check(
        _asg(spark, {("e", "A"): 501, ("e", "B"): 499}),
        arm_col="arm", weights={"A": 1, "B": 1},
    ).collect()
    assert not out[0].srm_flag


def test_srm_missing_designed_arm_contributes(spark):
    # an arm with ZERO observed units is the strongest mismatch and
    # must not vanish from the spine
    out = srm_check(
        _asg(spark, {("e", "A"): 50}), arm_col="arm",
        weights={"A": 1, "B": 1},
    ).collect()
    (r,) = out
    assert int(r.chi2_ppm) == _chi2_ppm_exact(
        {"A": 50}, {"A": 1, "B": 1}
    ) == 50_000_000
    assert r.srm_flag


def test_srm_unequal_design_ok(spark):
    # a 9:1 design observed at 9:1 is healthy
    out = srm_check(
        _asg(spark, {("e", "A"): 900, ("e", "B"): 100}),
        arm_col="arm", weights={"A": 9, "B": 1},
    ).collect()
    assert int(out[0].chi2_ppm) == 0
    assert not out[0].srm_flag


def test_srm_validation(spark):
    df = _asg(spark, {("e", "A"): 1})
    with pytest.raises(ValueError):
        srm_check(df, arm_col="arm", weights={})
    with pytest.raises(ValueError):
        srm_check(df, arm_col="arm", weights={"A": 1, "B": 0})
    with pytest.raises(ValueError):
        srm_check(df, arm_col="arm", weights={"A": 1})
    with pytest.raises(ValueError):
        srm_check(
            df, arm_col="arm",
            weights={str(i): 1 for i in range(12)},
        )


# ---------------------------------------------------------------------------


def _docs(spark, strata_sizes):
    rows = []
    i = 0
    for s, n in strata_sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_kfold_exact_balance(spark):
    df = _docs(spark, {"en": 103, "de": 7, "vi": 3, "fr": 1})
    out = stratified_kfold(df, "lang", "doc_id", k=5).collect()
    sizes = defaultdict(lambda: defaultdict(int))
    for r in out:
        assert 0 <= r.fold < 5
        sizes[r.lang][r.fold] += 1
    for s, n in {"en": 103, "de": 7, "vi": 3, "fr": 1}.items():
        per = [sizes[s][f] for f in range(5)]
        assert sum(per) == n
        assert max(per) - min(per) <= 1, (s, per)


def test_kfold_deterministic_and_order_free(spark):
    df = _docs(spark, {"en": 40, "de": 11})
    a = {r.doc_id: r.fold for r in
         stratified_kfold(df, "lang", "doc_id").collect()}
    shuffled = df.orderBy((df.doc_id * 37) % 41)
    c = {r.doc_id: r.fold for r in
         stratified_kfold(shuffled, "lang", "doc_id").collect()}
    assert a == c


def test_kfold_salt_changes_assignment(spark):
    df = _docs(spark, {"en": 200})
    a = {r.doc_id: r.fold for r in
         stratified_kfold(df, "lang", salt="kfold").collect()}
    b = {r.doc_id: r.fold for r in
         stratified_kfold(df, "lang", salt="other").collect()}
    assert a != b


def test_kfold_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        stratified_kfold(_docs(spark, {"en": 3}), "lang", k=1)


def test_srm_rogue_arm_flags(spark):
    # units logged to an arm the design does not know are themselves a
    # mismatch: they must flag and be counted, not fall out of N
    out = srm_check(
        _asg(spark, {("e", "A"): 500, ("e", "B"): 500, ("e", "C"): 300}),
        arm_col="arm", weights={"A": 1, "B": 1},
    ).collect()
    (r,) = out
    assert r.n_undesigned == 300
    assert r.n_units == 1000  # designed-arm units only
    assert int(r.chi2_ppm) == 0  # designed arms are balanced
    assert r.srm_flag  # flagged by the rogue count alone


def test_srm_all_units_undesigned_still_reported(spark):
    out = srm_check(
        _asg(spark, {("e", "X"): 40}), arm_col="arm",
        weights={"A": 1, "B": 1},
    ).collect()
    (r,) = out
    assert r.n_undesigned == 40 and r.n_units == 0
    assert r.chi2_ppm is None and r.srm_flag


def test_srm_clean_experiment_has_zero_undesigned(spark):
    out = srm_check(
        _asg(spark, {("e", "A"): 10, ("e", "B"): 10}),
        arm_col="arm", weights={"A": 1, "B": 1},
    ).collect()
    assert out[0].n_undesigned == 0 and not out[0].srm_flag
