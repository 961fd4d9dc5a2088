"""Streaming incremental cache maintenance + quarantine metrics and
dead-letter re-drive (round-2 TODO items)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_translation_spark.operators.quarantine import (
    quarantine_metrics,
    redrive_quarantine,
    validate_documents,
)
from ocr_translation_spark.pipeline import extract
from ocr_translation_spark.sources.catalog import Catalog
from ocr_translation_spark.streaming import stream_extract
from tests.conftest import load_fixture


def test_stream_extract_maintains_cache(spark, fixture_dir, tmp_path):
    docs = load_fixture(spark, fixture_dir, "documents")
    media = load_fixture(spark, fixture_dir, "media")
    in_dir = str(tmp_path / "in")
    docs.write.parquet(in_dir)
    cache_dir = str(tmp_path / "cache")

    q = stream_extract(
        spark, in_dir, str(tmp_path / "out1"), str(tmp_path / "ck1"),
        media=media, cache_dir=cache_dir,
    )
    q.awaitTermination(300)

    cache = Catalog(spark, cache_dir).load("ocr_cache")
    n_distinct = (
        media.select(F.sha2("media_bytes", 256).alias("h")).distinct().count()
    )
    assert cache.count() == n_distinct

    # a second stream over the same corpus: all hits, cache unchanged,
    # output still golden
    q2 = stream_extract(
        spark, in_dir, str(tmp_path / "out2"), str(tmp_path / "ck2"),
        media=media, cache_dir=cache_dir,
    )
    q2.awaitTermination(300)
    assert Catalog(spark, cache_dir).load("ocr_cache").count() == n_distinct
    batch = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in extract(spark, docs, media).result.collect()
    }
    streamed = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in spark.read.parquet(str(tmp_path / "out2")).collect()
    }
    assert streamed == batch


def test_quarantine_metrics_and_redrive(spark, tmp_path):
    span_t = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    rows = [
        ("ok1", [("text", "hello world", None, 0)]),
        ("bad_kind", [("alien", "x", None, 0)]),
        ("bad_media", [("media", None, None, 0)]),
        (None, [("text", "orphan", None, 0)]),
    ]
    docs = spark.createDataFrame(rows, f"doc_id string, spans {span_t}")
    valid, quarantined = validate_documents(docs)
    assert {r["doc_id"] for r in valid.collect()} == {"ok1"}

    m = {r["reason"]: r["n_docs"] for r in quarantine_metrics(quarantined).collect()}
    assert m == {
        "unknown_span_kind": 1,
        "media_span_without_ref": 1,
        "null_doc_id": 1,
    }

    qdir = str(tmp_path / "quarantine")
    quarantined.write.parquet(qdir)
    # validator unchanged -> nothing resurrects, nothing is lost
    rv, rq = redrive_quarantine(spark, qdir)
    assert rv.count() == 0 and rq.count() == 3

    # an upstream fix lands (bad kind corrected in place): the re-drive
    # resurrects exactly that row — the dead-letter queue only shrinks
    fixed = spark.read.parquet(qdir).drop("reason").withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                F.when(s["kind"] == "alien", "text")
                .otherwise(s["kind"])
                .alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    fixed.write.mode("overwrite").parquet(str(tmp_path / "q2"))
    rv2, rq2 = redrive_quarantine(spark, str(tmp_path / "q2"))
    assert {r["doc_id"] for r in rv2.collect()} == {"bad_kind"}
    assert rq2.count() == 2
