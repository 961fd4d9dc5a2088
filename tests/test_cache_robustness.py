"""Crash-safety + cache-error-fallback tests (VERDICT r1 items 3/7,
ADVICE: merge_by_key durability, resume cache wiring).

Reference semantics being protected:
* store-always cache growth (``OCRQueue.js:85``)
* cache GET error -> recompute, never abort (``TranslationQueue.js:58-83``)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.operators.resume import ResumableRun
from ocr_translation_spark.pipeline import extract
from ocr_translation_spark.sources.catalog import Catalog
from tests.conftest import load_fixture


def _spans_map(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in df.collect()
    }


def _poison(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file at all" * 10)


def test_merge_by_key_survives_failed_merge(spark, tmp_path):
    """A merge whose compute CRASHES mid-write must leave the existing
    table byte-for-byte intact (the old read-then-overwrite-through-
    cache() pattern could destroy it)."""
    cat = Catalog(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(f"h{i}", f"v{i}") for i in range(50)], "h string, ocr_text string"
    )
    cat.merge_by_key(base, "cache", "h")
    before = sorted(cat.load("cache").collect())

    def _boom(batches):
        raise RuntimeError("simulated executor failure mid-merge")
        yield  # pragma: no cover

    bad = spark.createDataFrame(
        [("hx", "vx")], "h string, ocr_text string"
    ).mapInPandas(_boom, schema="h string, ocr_text string")
    with pytest.raises(Exception):
        cat.merge_by_key(bad, "cache", "h")

    # old table survives, fully readable, identical content
    assert sorted(cat.load("cache").collect()) == before
    # and no stray temp/old dirs leak into the table root
    leftovers = [p for p in os.listdir(str(tmp_path)) if "__swap" in p]
    assert leftovers == []


def test_merge_by_key_grows_and_existing_rows_win(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.merge_by_key(
        spark.createDataFrame([("a", "old")], "h string, v string"), "t", "h"
    )
    cat.merge_by_key(
        spark.createDataFrame(
            [("a", "NEW"), ("b", "fresh")], "h string, v string"
        ),
        "t",
        "h",
    )
    rows = {r["h"]: r["v"] for r in cat.load("t").collect()}
    assert rows == {"a": "old", "b": "fresh"}  # existing wins; new keys added


def test_load_or_none_poisoned_path_degrades(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    assert cat.load_or_none("missing") is None
    _poison(str(tmp_path / "broken"))
    assert cat.load_or_none("broken") is None
    good = spark.createDataFrame([("h1", "t1")], "h string, ocr_text string")
    good.write.parquet(str(tmp_path / "ok"))
    assert cat.load_or_none("ok").count() == 1


def test_extract_with_poisoned_cache_path_still_golden(
    spark, fixture_dir, tmp_path
):
    """End-to-end S6 parity: an unreadable cache table degrades to
    recompute — output identical to the no-cache run, job never aborts."""
    docs = load_fixture(spark, fixture_dir, "documents")
    media = load_fixture(spark, fixture_dir, "media")
    golden = _spans_map(extract(spark, docs, media, use_cache=False).result)

    cache_dir = str(tmp_path / "cache")
    _poison(os.path.join(cache_dir, "ocr_cache"))
    run = ResumableRun(
        spark, str(tmp_path / "out"), str(tmp_path / "state"),
        n_buckets=2, cache_dir=cache_dir,
    )
    run.run(docs, media)
    assert _spans_map(run.read_output()) == golden
    # and the poisoned table was rebuilt into a healthy one (advisory
    # data is rebuildable; the run must not preserve corruption)
    rebuilt = Catalog(spark, cache_dir).load_or_none("ocr_cache")
    assert rebuilt is not None and rebuilt.count() > 0


def test_resume_cache_grows_and_second_run_hits(spark, fixture_dir, tmp_path):
    """Store-always wiring (ADVICE item 4): the persisted cache gains
    every distinct media hash during run 1; run 2 on the same corpus
    OCRs zero payloads (all hits)."""
    docs = load_fixture(spark, fixture_dir, "documents")
    media = load_fixture(spark, fixture_dir, "media")
    cache_dir = str(tmp_path / "cache")

    run1 = ResumableRun(
        spark, str(tmp_path / "o1"), str(tmp_path / "s1"),
        n_buckets=3, cache_dir=cache_dir,
    )
    run1.run(docs, media)

    cache = Catalog(spark, cache_dir).load("ocr_cache")
    n_distinct_media = (
        media.select(F.sha2("media_bytes", 256).alias("h")).distinct().count()
    )
    cached_hashes = {r["h"] for r in cache.select("h").collect()}
    assert len(cached_hashes) == cache.count()  # no dup keys
    # every referenced distinct payload is cached (fixtures reference
    # every media row; subset-referencing corpora would cache a subset)
    assert cache.count() == n_distinct_media

    # run 2: every OCR is a cache hit -> new_ocr_cache stays empty
    run2 = ResumableRun(
        spark, str(tmp_path / "o2"), str(tmp_path / "s2"),
        n_buckets=1, cache_dir=cache_dir,
    )
    run2.run(docs, media)
    cache_after = Catalog(spark, cache_dir).load("ocr_cache")
    assert cache_after.count() == n_distinct_media
    assert _spans_map(run2.read_output()) == _spans_map(run1.read_output())


def test_committed_buckets_missing_vs_broken(spark, tmp_path):
    from ocr_translation_spark.operators.resume import committed_buckets

    # missing state -> fresh run
    assert committed_buckets(spark, str(tmp_path / "nope")) == set()
    # BROKEN lineage must raise, not silently read as "nothing committed"
    state = str(tmp_path / "state")
    _poison(os.path.join(state, "lineage"))
    with pytest.raises(Exception):
        committed_buckets(spark, state)
