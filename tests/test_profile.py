"""One-pass per-column table profiling (functions/profile)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ocr_translation_spark.functions.profile import profile_table


def _snap(df):
    return {
        r.col_name: (
            r.n_rows, r.n_nulls, r.n_distinct,
            r.min_str, r.max_str, r.min_num, r.max_num,
        )
        for r in df.collect()
    }


def test_profile_hand_computed(spark):
    t = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        ("a", 5, 1.5, t),
        ("b", None, 2.25, t + datetime.timedelta(days=1)),
        ("a", 7, None, t),
        (None, 5, 1.5, None),
    ]
    df = spark.createDataFrame(
        rows, "s string, i long, m double, ts timestamp"
    )
    got = _snap(
        profile_table(
            df, text_cols=["s"], int_cols=["i"],
            money_cols=["m"], ts_cols=["ts"],
        )
    )
    assert got["s"] == (4, 1, 2, "a", "b", None, None)
    assert got["i"] == (4, 1, 2, None, None, 5, 7)
    # money canonical: 1.5 -> 15000, 2.25 -> 22500
    assert got["m"] == (4, 1, 2, None, None, 15000, 22500)
    epoch = int(t.replace(tzinfo=datetime.timezone.utc).timestamp())
    assert got["ts"][0:3] == (4, 1, 2)
    assert got["ts"][5] == epoch * 1_000_000


def test_profile_all_null_and_single_valued_columns(spark):
    rows = [(None, 9), (None, 9), (None, 9)]
    df = spark.createDataFrame(rows, "s string, i long")
    got = _snap(profile_table(df, text_cols=["s"], int_cols=["i"]))
    assert got["s"] == (3, 3, 0, None, None, None, None)
    assert got["i"] == (3, 0, 1, None, None, 9, 9)


def test_profile_distinct_is_exact_not_approx(spark):
    # 1000 rows, 137 distinct values: approx_count_distinct would
    # drift; the profile must be exact
    df = spark.range(1000).select(
        (F.col("id") % 137).alias("i"), F.lit("x").alias("s")
    )
    got = _snap(profile_table(df, text_cols=["s"], int_cols=["i"]))
    assert got["i"] == (1000, 0, 137, None, None, 0, 136)
    assert got["s"] == (1000, 0, 1, "x", "x", None, None)


def test_profile_single_shuffle_plan(spark):
    # the whole profile is ONE (column, value) exchange + the tiny
    # per-column rollup — no per-column aggregate jobs
    df = spark.range(100).select(
        F.col("id").alias("i"),
        F.concat(F.lit("v"), (F.col("id") % 7).cast("string")).alias("s"),
    )
    prof = profile_table(df, text_cols=["s"], int_cols=["i"])
    prof.collect()
    plan = (
        prof._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    # one exchange for (col,value) grouping, one for the rollup
    assert plan.count("Exchange") == 2
    assert plan.count("Generate explode") == 1  # one pass over the scan


def test_profile_requires_columns(spark):
    import pytest

    df = spark.range(3)
    with pytest.raises(ValueError, match="no columns"):
        profile_table(df)


# ---------------------------------------------------------------------------
# skew_report — hot-key diagnostic
# ---------------------------------------------------------------------------


def test_skew_report_hand_computed(spark):
    from ocr_translation_spark.functions.profile import skew_report

    rows = [(i, "hot" if i % 2 == 0 else f"k{i % 5}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = [tuple(r) for r in skew_report(df, "key", top_k=3).collect()]
    # hot=50; k1/k3 (odd i) each 25? no: odd i%5 cycles 1,3,0,2,4 -> each 10
    assert got == [
        (1, "hot", 50, 500_000, 500_000),
        (2, "k0", 10, 100_000, 600_000),
        (3, "k1", 10, 100_000, 700_000),
    ]


def test_skew_report_share_is_of_full_total_not_topk(spark):
    from ocr_translation_spark.functions.profile import skew_report

    df = spark.createDataFrame(
        [(i, f"k{i}") for i in range(10)], "id long, key string"
    )
    got = skew_report(df, "key", top_k=2).collect()
    # 10 singleton keys: each share = 1/10 of the FULL total even
    # though only 2 rows are emitted
    assert [r["share_micro"] for r in got] == [100_000, 100_000]
    assert got[-1]["cum_share_micro"] == 200_000
