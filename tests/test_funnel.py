"""Filter-funnel drop accounting: hand-computed cascade values, empty
input, and the plan shape (one aggregate over one scan — no per-stage
pass, no row shuffle beyond the single-row agg merge)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions.funnel import filter_funnel


def _report(spark, rows, filters):
    df = spark.createDataFrame(rows, "doc_id int, a int, b int")
    out = filter_funnel(df, filters)
    return {r["filter"]: r.asDict() for r in out.collect()}


def test_hand_computed_cascade(spark):
    # a >= 10: rows 1,2,3 pass;  b >= 5: rows 1,4 pass
    rows = [
        (1, 10, 5),   # passes both
        (2, 10, 0),   # passes 1, dropped at 2
        (3, 15, 4),   # passes 1, dropped at 2
        (4, 0, 3),    # dropped at 1 (and would fail 2 in isolation)
    ]
    got = _report(
        spark, rows,
        [("a_min", F.col("a") >= 10), ("b_min", F.col("b") >= 5)],
    )
    assert got["a_min"] == {
        "stage": 1, "filter": "a_min", "n_fail": 1,
        "n_dropped_here": 1, "n_remaining": 3,
    }
    # row 4 fails b too, but was already dropped at stage 1 — only
    # rows 2,3 are dropped HERE; n_fail counts all 3 failures
    assert got["b_min"] == {
        "stage": 2, "filter": "b_min", "n_fail": 3,
        "n_dropped_here": 2, "n_remaining": 1,
    }


def test_empty_input_yields_zero_rows_not_nulls(spark):
    got = _report(spark, [], [("a_min", F.col("a") >= 10)])
    assert got["a_min"]["n_fail"] == 0
    assert got["a_min"]["n_remaining"] == 0


def test_requires_filters(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        filter_funnel(df, [])


def test_single_aggregate_plan(spark):
    df = spark.createDataFrame([(1, 2, 3)], "doc_id int, a int, b int")
    plan = filter_funnel(
        df, [("x", F.col("a") > 0), ("y", F.col("b") > 0)]
    )._jdf.queryExecution().executedPlan().toString()
    # one scan, one partial+final agg pair — never one agg per stage
    assert plan.count("HashAggregate") <= 2
    assert "Generate" in plan  # the explode to per-stage rows
