"""Unit tests for exact per-group quantiles by histogram narrowing
(functions/selection.py).

Checked against a pure-Python sorted-list reference on randomized
data with duplicates, with `limit` forced far below the group sizes
so the narrowing loop actually runs multiple rounds; plus partition
invariance, the all-equal resolved path, the q=0 / q=1 rank edges,
the inf-width midpoint-split round, and the max_rounds error."""

import random
from fractions import Fraction

import pytest

from ocr_translation_spark.functions.selection import (
    group_exact_quantiles,
)

QS = ("0.0", "0.25", "0.5", "0.9", "0.99", "1.0")


def _ref(rows, qs):
    by_g = {}
    for g, v in rows:
        if v is not None:
            by_g.setdefault(g, []).append(v)
    want = {}
    for g, vs in by_g.items():
        vs.sort()
        for q in qs:
            fq = Fraction(q)
            r = max(1, -((-fq.numerator * len(vs)) // fq.denominator))
            want[(g, q)] = (r, len(vs), vs[r - 1])
    return want


def _got(df):
    return {
        (r["grp"], r["q"]): (r["rank"], r["n"], r["value"])
        for r in df.collect()
    }


def test_matches_sorted_reference_with_forced_rounds(spark):
    rng = random.Random(7)
    rows = []
    for g, n in (("big", 4000), ("odd", 317), ("single", 1)):
        rows += [(g, round(rng.uniform(-50, 50), 2)) for _ in range(n)]
    rows += [("big", 3.14)] * 200        # heavy duplicate mass
    rows += [("nullish", None), ("nullish", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double").repartition(9)
    out = group_exact_quantiles(df, "g", "v", qs=QS, bins=4, limit=16)
    assert _got(out) == _ref(rows, QS)


def test_all_equal_group_resolves_without_rounds(spark):
    rows = [("dup", 7.5)] * 100
    df = spark.createDataFrame(rows, ["g", "v"])
    out = _got(group_exact_quantiles(df, "g", "v", qs=("0.5",), limit=2))
    assert out == {("dup", "0.5"): (50, 100, 7.5)}


def test_partition_invariance(spark):
    rng = random.Random(11)
    rows = [("g", round(rng.uniform(0, 1), 4)) for _ in range(2000)]
    a = _got(group_exact_quantiles(
        spark.createDataFrame(rows, ["g", "v"]).coalesce(1),
        "g", "v", qs=("0.5", "0.9"), bins=8, limit=32))
    b = _got(group_exact_quantiles(
        spark.createDataFrame(rows, ["g", "v"]).repartition(13),
        "g", "v", qs=("0.5", "0.9"), bins=8, limit=32))
    assert a == b == _ref(rows, ("0.5", "0.9"))


def test_inf_width_takes_midpoint_split(spark):
    # hi - lo overflows double: the round must degrade to the exact
    # midpoint 2-way split instead of minting NaN bins
    rows = [("g", -1.7e308), ("g", -1.0), ("g", 0.0), ("g", 2.0),
            ("g", 1.7e308)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = _got(group_exact_quantiles(df, "g", "v",
                                     qs=("0.5",), bins=4, limit=1))
    assert out == {("g", "0.5"): (3, 5, 0.0)}


def test_rank_edges_q0_and_q1(spark):
    rows = [("g", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = _got(group_exact_quantiles(df, "g", "v", qs=("0.0", "1.0"),
                                     bins=4, limit=8))
    assert out[("g", "0.0")] == (1, 100, 1.0)
    assert out[("g", "1.0")] == (100, 100, 100.0)


def test_q_out_of_range_rejected(spark):
    df = spark.createDataFrame([("g", 1.0)], ["g", "v"])
    with pytest.raises(ValueError):
        group_exact_quantiles(df, "g", "v", qs=("1.5",))


def test_max_rounds_exceeded_errors_loudly(spark):
    rows = [("g", float(i)) for i in range(5000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    with pytest.raises(RuntimeError):
        group_exact_quantiles(df, "g", "v", qs=("0.5",), bins=2,
                              limit=1, max_rounds=2)


def test_narrowing_prefilter_reaches_the_scan(spark, tmp_path):
    # the round prefilter is a LITERAL predicate (unlike the bounds
    # join's column comparison) precisely so it pushes to parquet
    # row-group stats: later rounds must scan O(selectivity), not all
    from ocr_translation_spark.functions.selection import (
        _range_prefilter,
    )

    p = str(tmp_path / "vals.parquet")
    spark.createDataFrame(
        [("g", float(i)) for i in range(1000)], "grp string, v double"
    ).write.parquet(p)
    states = {("g", "0.5"): {"lo": 200.0, "hi": 300.0}}
    plan = (
        spark.read.parquet(p)
        .filter(_range_prefilter(states))
        ._jdf.queryExecution().simpleString()
    )
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    # simpleString truncates long filter lists; match prefixes
    assert "GreaterThanOrEqual(v,200" in pushed
    assert "LessThanOrEqual(v,300" in pushed


def test_prefilter_group_cap_falls_back_to_global_envelope(spark):
    from ocr_translation_spark.functions.selection import (
        _PREFILTER_GROUP_CAP,
        _range_prefilter,
    )

    states = {
        (f"g{i}", "0.5"): {"lo": float(i), "hi": float(i + 1)}
        for i in range(_PREFILTER_GROUP_CAP + 1)
    }
    df = spark.createDataFrame(
        [("g0", 0.5), ("g0", 999.0)], "grp string, v double"
    )
    # global envelope [0, cap+1]: keeps 0.5, drops 999
    assert df.filter(_range_prefilter(states)).count() == 1


def test_null_group_keys_dropped_not_looping(spark):
    # a NULL group key can never match the narrowing equi-join; it
    # must be dropped up front, not loop to max_rounds (review fix)
    rows = [(None, float(i)) for i in range(500)]
    rows += [("g", float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = _got(group_exact_quantiles(df, "g", "v", qs=("0.5",),
                                     bins=4, limit=8, max_rounds=16))
    assert set(out) == {("g", "0.5")}
    assert out[("g", "0.5")] == (250, 500, 249.0)


def test_weighted_matches_expanded_reference(spark):
    # weighted quantile == unweighted quantile over the row expanded
    # weight times; forced narrowing rounds
    rng = random.Random(23)
    rows = [("g", round(rng.uniform(0, 100), 1), rng.randrange(1, 7))
            for _ in range(800)]
    rows += [("h", 5.0, 3), ("h", 9.0, 1)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = {
        (r["grp"], r["q"]): (r["rank"], r["n"], r["value"])
        for r in group_exact_quantiles(
            df, "g", "v", qs=("0.5", "0.9"), bins=4, limit=16,
            weight_col="w",
        ).collect()
    }
    expanded = [(g, v) for g, v, w in rows for _ in range(w)]
    assert got == _ref(expanded, ("0.5", "0.9"))
    # hand check: group h has W=4, ceil(.5*4)=2 -> cumulative weight
    # of 5.0 is 3 >= 2 -> the median is 5.0
    assert got[("h", "0.5")] == (2, 4, 5.0)


def test_nonpositive_and_null_weights_dropped(spark):
    rows = [("g", 1.0, 2), ("g", 2.0, 0), ("g", 3.0, -5),
            ("g", 4.0, None), ("g", 9.0, 2)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = {
        (r["grp"], r["q"]): (r["rank"], r["n"], r["value"])
        for r in group_exact_quantiles(
            df, "g", "v", qs=("1.0",), weight_col="w"
        ).collect()
    }
    assert got == {("g", "1.0"): (4, 4, 9.0)}
