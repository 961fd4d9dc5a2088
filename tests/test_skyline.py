"""Unit tests for the exact 2-D skyline (functions/skyline.py):
brute-force dominance reference on randomized data with planted ties
and duplicates, partition invariance, the all-on-frontier
anti-correlated worst case, single-dominator collapse, NULL drops,
and payload pass-through."""

import random

from ocr_translation_spark.functions.skyline import skyline_2d


def _brute(rows):
    # rows: (id, x, y); dominate = x'>=x, y'<=y, one strict
    keep = []
    for i, (pid, x, y) in enumerate(rows):
        dom = any(
            (x2 >= x and y2 <= y and (x2 > x or y2 < y))
            for j, (_, x2, y2) in enumerate(rows) if j != i
        )
        if not dom:
            keep.append((pid, x, y))
    return sorted(keep)


def _run(spark, rows, parts=7):
    df = spark.createDataFrame(
        rows, "id string, x double, y double"
    ).repartition(parts)
    return sorted(
        (r["id"], r["x"], r["y"])
        for r in skyline_2d(df, "x", "y").collect()
    )


def test_matches_brute_force_with_ties(spark):
    rng = random.Random(3)
    rows = [(f"p{i}", float(rng.randrange(20)), float(rng.randrange(20)))
            for i in range(400)]
    rows += [("dupA", 19.0, 0.0), ("dupB", 19.0, 0.0)]  # exact dups
    assert _run(spark, rows) == _brute(rows)
    # the planted exact duplicates dominate neither way: both survive
    got = dict.fromkeys(i for i, _, _ in _run(spark, rows))
    assert "dupA" in got and "dupB" in got


def test_single_dominator_collapses_everything(spark):
    rows = [(f"p{i}", float(i), float(i + 1)) for i in range(100)]
    rows.append(("king", 1000.0, 0.0))
    assert _run(spark, rows) == [("king", 1000.0, 0.0)]


def test_anticorrelated_keeps_every_row(spark):
    # under (max x, min y), higher x only at higher y — the diagonal
    # x = y is a pure tradeoff: nothing dominates anything
    rows = [(f"p{i}", float(i), float(i)) for i in range(101)]
    assert _run(spark, rows) == _brute(rows)
    assert len(_run(spark, rows)) == 101


def test_partition_invariance(spark):
    rng = random.Random(17)
    rows = [(f"p{i}", float(rng.randrange(50)), float(rng.randrange(50)))
            for i in range(600)]
    assert _run(spark, rows, parts=1) == _run(spark, rows, parts=13)


def test_null_dimensions_dropped(spark):
    rows = [("a", 5.0, 5.0), ("b", None, 0.0), ("c", 99.0, None)]
    df = spark.createDataFrame(rows, "id string, x double, y double")
    assert [r["id"] for r in skyline_2d(df, "x", "y").collect()] == ["a"]


def test_payload_columns_pass_through(spark):
    rows = [("a", 5.0, 5.0, "keepme"), ("b", 1.0, 9.0, "gone")]
    df = spark.createDataFrame(
        rows, "id string, x double, y double, note string"
    )
    out = skyline_2d(df, "x", "y").collect()
    assert [(r["id"], r["note"]) for r in out] == [("a", "keepme")]
