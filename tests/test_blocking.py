"""Sorted-neighborhood blocking + distributed global rank
(functions/blocking)."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from ocr_translation_spark.functions.blocking import (
    global_rank_by,
    sorted_neighborhood_pairs,
)


def _rand_keys(rng, n):
    return [
        (i, "".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 8))))
        for i in range(n)
    ]


def test_global_rank_matches_python_sort(spark):
    rng = random.Random(20260818)
    rows = _rand_keys(rng, 200)
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        r.id: r.rank
        for r in global_rank_by(df, key="k", id_col="id").collect()
    }
    want = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want


def test_global_rank_handles_duplicate_keys_and_short_keys(spark):
    rows = [(1, "aa"), (2, "aa"), (3, "a"), (4, ""), (5, "b")]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        r.id: r.rank
        for r in global_rank_by(df, key="k", id_col="id").collect()
    }
    # sort: "" < "a" < "aa"(id 1) < "aa"(id 2) < "b"
    assert got == {4: 1, 3: 2, 1: 3, 2: 4, 5: 5}


def test_snm_pairs_match_python_window(spark):
    rng = random.Random(7)
    rows = _rand_keys(rng, 120)
    df = spark.createDataFrame(rows, "id long, k string")
    for w in (2, 3, 5):
        got = {
            (r.id_a, r.id_b, r.rank_dist)
            for r in sorted_neighborhood_pairs(
                df, key="k", id_col="id", window=w
            ).collect()
        }
        order = [rid for rid, _ in sorted(rows, key=lambda t: (t[1], t[0]))]
        want = {
            (order[i], order[i + d], d)
            for i in range(len(order))
            for d in range(1, w)
            if i + d < len(order)
        }
        assert got == want, f"window={w}"


def test_snm_finds_planted_near_duplicates_adjacent(spark):
    # two near-identical records sort adjacently on the normalized key
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox jumps!"),
        (3, "zzz totally unrelated zzz"),
        (4, "aaa other text aaa"),
    ]
    df = spark.createDataFrame(rows, "id long, k string")
    pairs = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, key="k", id_col="id", window=2
        ).collect()
    }
    assert (1, 2) in pairs


def test_snm_no_single_task_global_window(spark):
    # the plan must contain per-bucket windows only: no empty
    # partitionBy window (which would serialize the whole corpus
    # through one task)
    df = spark.createDataFrame(
        [(i, f"k{i % 13:02d}") for i in range(100)], "id long, k string"
    )
    out = sorted_neighborhood_pairs(df, key="k", id_col="id", window=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    import pytest

    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, key="k", id_col="id", window=1)
