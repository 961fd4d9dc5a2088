"""Unit tests for the incremental snapshot diff (functions/diff.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from ocr_translation_spark.functions.diff import snapshot_diff


def test_all_four_statuses(spark):
    old = spark.createDataFrame(
        [
            Row(doc_id=1, text="same"),
            Row(doc_id=2, text="before"),
            Row(doc_id=3, text="gone"),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=1, text="same"),
            Row(doc_id=2, text="after"),
            Row(doc_id=4, text="fresh"),
        ]
    )
    rows = {
        r["doc_id"]: r for r in snapshot_diff(old, new).collect()
    }
    assert rows[1]["status"] == "unchanged"
    assert rows[2]["status"] == "changed"
    assert rows[3]["status"] == "removed"
    assert rows[4]["status"] == "added"
    assert rows[3]["new_sha"] is None
    assert rows[4]["old_sha"] is None
    assert rows[1]["old_sha"] == rows[1]["new_sha"]
    assert rows[2]["old_sha"] != rows[2]["new_sha"]
    assert len(rows) == 4


def test_identical_snapshots_all_unchanged(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(20)]
    )
    out = snapshot_diff(df, df)
    statuses = {r["status"] for r in out.collect()}
    assert statuses == {"unchanged"}
    assert out.count() == 20


def test_join_carries_digests_not_payloads(spark):
    """The full-outer join input projects (id, sha) only — document
    bodies must not ride the shuffle."""
    df = spark.createDataFrame(
        [Row(doc_id=i, text="x" * 100) for i in range(10)]
    )
    plan = (
        snapshot_diff(df, df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # structural check: exactly one join, no cartesian
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count(
        "BroadcastHashJoin"
    ) + plan.count("ShuffledHashJoin") == 1


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
