"""Interval coalescing (gaps-and-islands) and sequential-Poisson
weighted sampling: hand-computed islands, boundary/touch semantics,
loud guards, plan shape, and Python parity."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.errors import PySparkException
from pyspark.sql import Row

from ocr_translation_spark.functions.sampling import (
    weighted_priority_sample,
)
from ocr_translation_spark.functions.timeseries import (
    coalesce_intervals,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _iv(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                user_id=u,
                start=T0 + dt.timedelta(minutes=s),
                end=T0 + dt.timedelta(minutes=e),
            )
            for u, s, e in rows
        ],
        "user_id long, start timestamp_ntz, end timestamp_ntz",
    )


def _islands(spark, rows):
    out = coalesce_intervals(_iv(spark, rows)).collect()
    return sorted(
        (
            r["user_id"],
            int((r["island_start"] - T0).total_seconds() // 60),
            int((r["island_end"] - T0).total_seconds() // 60),
            r["n_merged"],
        )
        for r in out
    )


def test_merge_touch_and_gap(spark):
    rows = [
        (1, 0, 10),
        (1, 5, 20),  # overlaps -> merges
        (1, 20, 30),  # touches the running end -> merges
        (1, 31, 40),  # strict gap -> new island
        (2, 0, 5),  # other key never mixes
    ]
    assert _islands(spark, rows) == [
        (1, 0, 30, 3),
        (1, 31, 40, 1),
        (2, 0, 5, 1),
    ]


def test_contained_and_out_of_order_intervals(spark):
    rows = [
        (1, 0, 100),
        (1, 10, 20),  # fully contained
        (1, 150, 160),
        (1, 90, 155),  # bridges the two islands
    ]
    assert _islands(spark, rows) == [(1, 0, 160, 4)]


def test_duplicate_intervals_count(spark):
    rows = [(1, 0, 10), (1, 0, 10)]
    assert _islands(spark, rows) == [(1, 0, 10, 2)]


def test_inverted_interval_raises(spark):
    with pytest.raises(PySparkException, match="inverted"):
        coalesce_intervals(_iv(spark, [(1, 10, 0)])).collect()


def test_null_endpoint_raises(spark):
    df = _iv(spark, [(1, 0, 10)]).union(
        _iv(spark, [(1, 0, 10)]).selectExpr(
            "user_id", "CAST(NULL AS timestamp_ntz) AS start", "end"
        )
    )
    with pytest.raises(PySparkException, match="NULL"):
        coalesce_intervals(df).collect()


def test_single_exchange_plan(spark):
    """Both windows and the island aggregate key on the user (or a
    superset), so the whole fold runs off ONE hash exchange."""
    df = coalesce_intervals(_iv(spark, [(1, 0, 10), (1, 5, 20)]))
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def _docs(spark, weights):
    return spark.createDataFrame(
        [Row(doc_id=i, w=w) for i, w in enumerate(weights)],
        "doc_id long, w long",
    )


def _py_priority(doc_id, w):
    h = int(hashlib.sha256(str(doc_id).encode()).hexdigest()[:15], 16)
    return h // w


def test_weighted_sample_matches_python_ranking(spark):
    weights = [(i % 7) + 1 for i in range(300)]
    got = [
        (r["doc_id"], r["priority"])
        for r in weighted_priority_sample(
            _docs(spark, weights), "w", 25, "doc_id"
        ).collect()
    ]
    ranked = sorted(
        (( _py_priority(i, w), i) for i, w in enumerate(weights))
    )[:25]
    assert got == [(i, p) for p, i in ranked]
    # deterministic across invocations
    again = [
        (r["doc_id"], r["priority"])
        for r in weighted_priority_sample(
            _docs(spark, weights), "w", 25, "doc_id"
        ).collect()
    ]
    assert got == again


def test_weight_bias(spark):
    """Rows with a 10^6x weight draw ~10^6x smaller priorities; all
    ten heavy rows beat the light field into the top 100."""
    weights = [1_000_000 if i < 10 else 1 for i in range(1000)]
    picked = {
        r["doc_id"]
        for r in weighted_priority_sample(
            _docs(spark, weights), "w", 100, "doc_id"
        ).collect()
    }
    assert set(range(10)) <= picked


def test_nonpositive_weight_raises(spark):
    with pytest.raises(PySparkException, match="positive"):
        weighted_priority_sample(
            _docs(spark, [1, 0, 3]), "w", 2, "doc_id"
        ).collect()


def test_bad_k_raises(spark):
    with pytest.raises(ValueError, match=">= 1"):
        weighted_priority_sample(_docs(spark, [1]), "w", 0, "doc_id")


def test_take_ordered_plan(spark):
    """No global sort materializes: Spark plans TakeOrderedAndProject
    (per-task k-heaps merged on the driver)."""
    df = weighted_priority_sample(
        _docs(spark, [1] * 50), "w", 5, "doc_id"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
