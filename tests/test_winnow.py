"""Unit tests for winnowing fingerprints (functions/winnow.py):
pure-Python reference parity, the winnowing guarantee, edges, and the
row-local plan shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from ocr_translation_spark.functions.winnow import (
    BASE,
    MOD,
    winnowing_fingerprint,
)


def _ref_fps(text: str, k: int = 8, w: int = 4) -> list[int]:
    """Independent reference implementation of the same recurrence."""
    cs = [ord(c) for c in text]
    if len(cs) < k:
        return []
    gh = []
    for i in range(len(cs) - k + 1):
        acc = 0
        for c in cs[i : i + k]:
            acc = (acc * BASE + c) % MOD
        gh.append(acc)
    if len(gh) < w:
        return []
    return sorted({min(gh[j : j + w]) for j in range(len(gh) - w + 1)})


def _run(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    return {
        r["doc_id"]: r for r in winnowing_fingerprint(df).collect()
    }


def test_matches_pure_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "aaaaaaaaaaaaaaaa",  # degenerate repeats collapse via distinct
    ]
    rows = _run(spark, texts)
    for i, t in enumerate(texts):
        fps = _ref_fps(t)
        assert rows[i]["n_fingerprints"] == len(fps)
        assert rows[i]["min_fp"] == (min(fps) if fps else None)
        exp_sha = hashlib.sha256(
            ",".join(str(x) for x in fps).encode()
        ).hexdigest()
        assert rows[i]["fp_sha256"] == exp_sha


def test_winnowing_guarantee_shared_substring(spark):
    """Two documents sharing a substring of length >= k + w - 1 = 11
    must share at least one fingerprint (the SIGMOD '03 guarantee)."""
    shared = "SHAREDSEGMENT"  # 13 chars >= 11
    a = f"left context {shared} more text here"
    b = f"completely different lead {shared} other tail"
    df = spark.createDataFrame(
        [Row(doc_id=0, text=a), Row(doc_id=1, text=b)]
    )
    out = (
        winnowing_fingerprint(df)
        .select("doc_id", "fp_sha256")
        .collect()
    )
    fa, fb = set(_ref_fps(a)), set(_ref_fps(b))
    assert fa & fb, "reference implementations must overlap"
    # engine agrees with the reference on both docs
    rows = _run(spark, [a, b])
    assert rows[0]["n_fingerprints"] == len(_ref_fps(a))
    assert rows[1]["n_fingerprints"] == len(_ref_fps(b))


def test_short_documents_have_no_fingerprints(spark):
    rows = _run(spark, ["tiny", "1234567", "12345678901"])
    # len < k: no grams at all; len gives m = n-k+1 < w: no window
    assert rows[0]["n_fingerprints"] == 0
    assert rows[0]["min_fp"] is None and rows[0]["fp_sha256"] is None
    assert rows[1]["n_fingerprints"] == 0
    # n=11 -> m=4 = w: exactly one window
    assert rows[2]["n_fingerprints"] >= 1


def test_plan_is_row_local(spark):
    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document text number "), F.col("id")).alias(
            "text"
        ),
    )
    plan = (
        winnowing_fingerprint(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
