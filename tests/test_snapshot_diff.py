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
    """The full-outer join input projects (id, sha, marker) only —
    document bodies must not ride the shuffle. Walks the executed
    plan and asserts no Exchange outputs a text attribute."""
    df = spark.createDataFrame(
        [Row(doc_id=i, text="x" * 100) for i in range(10)]
    )
    out = snapshot_diff(df, df)
    out.write.format("noop").mode("overwrite").save()
    pe = out._jdf.queryExecution().executedPlan()

    exchange_outputs = []

    def _walk(node):
        if "Exchange" in node.nodeName():
            cols = [
                node.output().apply(i).name()
                for i in range(node.output().length())
            ]
            exchange_outputs.append(cols)
        for i in range(node.children().length()):
            _walk(node.children().apply(i))

    _walk(pe)
    for cols in exchange_outputs:
        assert "text" not in cols, exchange_outputs
        assert any("sha" in c or c == "__id" for c in cols), (
            exchange_outputs
        )
    plan = pe.toString()
    # structural check: exactly one join, no cartesian
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count(
        "BroadcastHashJoin"
    ) + plan.count("ShuffledHashJoin") == 1


def test_null_payloads_use_presence_not_digest(spark):
    """sha2(NULL) is NULL: presence must come from join-side markers,
    and NULL-vs-value payloads are 'changed', NULL-vs-NULL
    'unchanged'."""
    old = spark.createDataFrame(
        [
            Row(doc_id=1, text=None),  # stays NULL -> unchanged
            Row(doc_id=2, text=None),  # NULL -> value: changed
            Row(doc_id=3, text="v"),  # value -> NULL: changed
            Row(doc_id=4, text=None),  # NULL doc removed
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=1, text=None),
            Row(doc_id=2, text="now set"),
            Row(doc_id=3, text=None),
            Row(doc_id=5, text=None),  # NULL doc added
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new).collect()
    }
    assert rows == {
        1: "unchanged",
        2: "changed",
        3: "changed",
        4: "removed",
        5: "added",
    }


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
