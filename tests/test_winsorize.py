"""Unit tests for winsorized per-group robust statistics
(functions/winsorize.py).

Checked against a pure-Python reference (sorted-list discrete
quantiles -> clamp -> HALF_UP micro rounding -> integer sums) on
randomized data with duplicates and negatives, plus partition
invariance and the all-equal degenerate group."""

import random
from fractions import Fraction

from ocr_translation_spark.functions.winsorize import winsorized_stats


def _ref(rows, q_low, q_high):
    by_g = {}
    for g, v in rows:
        if v is not None and g is not None:
            by_g.setdefault(g, []).append(v)
    want = {}
    for g, vs in by_g.items():
        vs.sort()
        n = len(vs)

        def cut(q):
            fq = Fraction(q)
            r = max(1, -((-fq.numerator * n) // fq.denominator))
            return vs[r - 1]

        lo, hi = cut(q_low), cut(q_high)

        def micro(x):
            # both engines round the DOUBLE product x*1e6 HALF_UP
            # (away from zero); mirror that exactly: take the double
            # product first, then rational half-away rounding of it
            p = Fraction(x * 1e6)
            sign = 1 if p >= 0 else -1
            return sign * int(abs(p) + Fraction(1, 2))

        clipped = [min(max(v, lo), hi) for v in vs]
        sm = sum(micro(c) for c in clipped)
        mean = (abs(sm) // n) * (1 if sm >= 0 else -1)
        want[g] = (
            n,
            sum(1 for v in vs if v < lo),
            sum(1 for v in vs if v > hi),
            micro(lo),
            micro(hi),
            sm,
            mean,
        )
    return want


def _got(df):
    return {
        r["grp"]: (
            r["n"], r["n_low"], r["n_high"], r["lo_micro"],
            r["hi_micro"], r["sum_micro"], r["mean_micro"],
        )
        for r in df.collect()
    }


def test_matches_python_reference(spark):
    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", round(rng.uniform(-50, 450), 2))
        for i in range(600)
    ] + [("g0", None), (None, 1.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorized_stats(df, "g", "v", bins=4, limit=16)
    assert _got(out) == _ref(
        [r for r in rows if r[0] is not None], "0.05", "0.95"
    )


def test_mean_division_truncates_toward_zero(spark):
    # all-negative group: sum_micro < 0; Spark div and the pure-
    # Python reference must both truncate toward zero
    rows = [("neg", -1.5), ("neg", -2.5), ("neg", -3.5)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = _got(winsorized_stats(df, "g", "v", q_low="0.0",
                                q_high="1.0", bins=4, limit=16))
    assert out == _ref(rows, "0.0", "1.0")
    assert out["neg"][6] == -2500000  # (-7500000) div 3


def test_partition_invariance_and_degenerate_group(spark):
    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 7.0)] * 5
    a = _got(winsorized_stats(
        spark.createDataFrame(rows, "g string, v double").coalesce(1),
        "g", "v", bins=4, limit=8))
    b = _got(winsorized_stats(
        spark.createDataFrame(rows, "g string, v double")
        .repartition(13), "g", "v", bins=4, limit=8))
    assert a == b
    # all-equal group clamps nothing, mean == the value
    assert a["b"] == (5, 0, 0, 7000000, 7000000, 35000000, 7000000)
    # p05 of 1..100 is 5, p95 is 95: 4 rows below, 5 above
    assert a["a"][1] == 4 and a["a"][2] == 5
    assert a["a"][3] == 5000000 and a["a"][4] == 95000000
