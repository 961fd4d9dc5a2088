"""Checkpoint/resume protocol + quarantine routing tests."""

from __future__ import annotations

import pytest

from ocr_translation_spark import datagen as G
from ocr_translation_spark.operators.quarantine import validate_documents
from ocr_translation_spark.operators.resume import ResumableRun
from ocr_translation_spark.pipeline import extract
from tests.conftest import load_fixture


def _spans_map(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in df.collect()
    }


def test_resume_after_crash_equals_single_run(spark, fixture_dir, tmp_path):
    docs = load_fixture(spark, fixture_dir, "documents")
    media = load_fixture(spark, fixture_dir, "media")

    single = _spans_map(extract(spark, docs, media).result)

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    run1 = ResumableRun(spark, out, state, n_buckets=4)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run1.run(docs, media, fail_after_buckets=2)
    assert len(run1.read_lineage().collect()) == 2

    run2 = ResumableRun(spark, out, state, n_buckets=4)
    processed = run2.run(docs, media)
    assert len(processed) == 2  # only the remaining buckets

    assert _spans_map(run2.read_output()) == single
    lineage = run2.read_lineage().collect()
    assert {r["bucket"] for r in lineage} == {0, 1, 2, 3}
    assert all(r["status"] == "committed" for r in lineage)
    # two distinct run_ids contributed
    assert len({r["run_id"] for r in lineage}) == 2


def test_resume_noop_when_complete(spark, fixture_dir, tmp_path):
    docs = load_fixture(spark, fixture_dir, "documents")
    media = load_fixture(spark, fixture_dir, "media")
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    r1 = ResumableRun(spark, out, state, n_buckets=3)
    assert len(r1.run(docs, media)) == 3
    r2 = ResumableRun(spark, out, state, n_buckets=3)
    assert r2.run(docs, media) == []


def test_metrics_totals(spark, fixture_dir, tmp_path):
    from pyspark.sql import functions as F

    docs = load_fixture(spark, fixture_dir, "documents")
    media = load_fixture(spark, fixture_dir, "media")
    run = ResumableRun(spark, str(tmp_path / "o"), str(tmp_path / "s"), n_buckets=2)
    run.run(docs, media)
    m = run.read_metrics()
    total_docs = (
        m.filter(F.col("metric") == "docs").agg(F.sum("value")).collect()[0][0]
    )
    assert int(total_docs) == docs.count()


def test_quarantine_routing(spark):
    rows = [
        ("ok", [("text", "hi", None, 0)]),
        (None, [("text", "hi", None, 0)]),
        ("null_spans", None),
        ("bad_kind", [("wat", "x", None, 0)]),
        ("media_no_ref", [("media", None, None, 0)]),
        ("null_off", [("text", "x", None, None)]),
        ("empty_ok", []),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    valid, quarantined = validate_documents(df)
    assert {r["doc_id"] for r in valid.collect()} == {"ok", "empty_ok"}
    q = {r["doc_id"]: r["reason"] for r in quarantined.collect()}
    assert q == {
        None: "null_doc_id",
        "null_spans": "null_spans",
        "bad_kind": "unknown_span_kind",
        "media_no_ref": "media_span_without_ref",
        "null_off": "null_offset",
    }


def test_job_result_point_lookup(spark, fixture_dir, tmp_path):
    """GET /result/:jobId twin: completed/failed/pending states."""
    docs = load_fixture(spark, fixture_dir, "documents")
    media = load_fixture(spark, fixture_dir, "media")
    run = ResumableRun(spark, str(tmp_path / "o"), str(tmp_path / "s"),
                       n_buckets=2)
    some_id = docs.select("doc_id").limit(1).collect()[0]["doc_id"]
    assert run.job_result(some_id) == ("pending", None)
    run.run(docs, media)
    status, spans = run.job_result(some_id)
    assert status == "completed" and spans is not None and len(spans) >= 0
    # a doc_id that never existed reads as failed (bucket committed,
    # no output row) — the reference's 500-with-reason analogue
    assert run.job_result("no-such-doc-zzz") == ("failed", None)
