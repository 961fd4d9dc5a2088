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


# --------------------------------------------------------------------------
# Append-layout cache merges (VERDICT r2 item 3): O(new) write cost,
# existing-wins on read, periodic compaction, swap-crash healing.
# --------------------------------------------------------------------------


def _tree_files(path):
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            out[p] = (os.path.getsize(p), os.path.getmtime(p))
    return out


def test_merge_cache_writes_scale_with_new_entries(spark, tmp_path):
    """Each merge appends ONE new batch dir sized by the new entries;
    previously-written files are never touched (byte-identical paths,
    sizes, mtimes) — i.e. write cost is O(new), not O(table)."""
    from ocr_translation_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    table = os.path.join(str(tmp_path), "c")
    batch_sizes = []
    for i in range(5):
        before = _tree_files(table)
        rows = [(f"h{i}_{j}", f"v{i}_{j}") for j in range(100)]
        cat.merge_cache(
            spark.createDataFrame(rows, "h string, v string"), "c", "h"
        )
        after = _tree_files(table)
        # nothing pre-existing was rewritten
        for p, meta in before.items():
            assert after.get(p) == meta, f"rewrote {p}"
        new_bytes = sum(
            sz for p, (sz, _) in after.items() if p not in before
        )
        batch_sizes.append(new_bytes)
    # constant-size merges => roughly constant write volume, NOT
    # growing with the (5x larger by now) table
    assert max(batch_sizes) < 2 * min(batch_sizes), batch_sizes
    # all 500 distinct keys readable, key-unique
    out = cat.load_cache("c", "h")
    assert out.count() == 500
    assert out.select("h").distinct().count() == 500


def test_merge_cache_existing_wins_across_batches(spark, tmp_path):
    from ocr_translation_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    cat.merge_cache(
        spark.createDataFrame([("k1", "old"), ("k2", "old")], "h string, v string"),
        "c", "h",
    )
    cat.merge_cache(
        spark.createDataFrame([("k2", "NEW"), ("k3", "NEW")], "h string, v string"),
        "c", "h",
    )
    rows = {r["h"]: r["v"] for r in cat.load_cache("c", "h").collect()}
    assert rows == {"k1": "old", "k2": "old", "k3": "NEW"}


def test_merge_cache_compaction_preserves_winners(spark, tmp_path):
    from ocr_translation_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    for i in range(4):
        cat.merge_cache(
            spark.createDataFrame(
                [("shared", f"from_batch_{i}"), (f"k{i}", f"v{i}")],
                "h string, v string",
            ),
            "c", "h", compact_after=3,
        )
    table = os.path.join(str(tmp_path), "c")
    batches = [d for d in os.listdir(table) if d.startswith("batch=")]
    assert len(batches) < 4  # compaction folded the history
    rows = {r["h"]: r["v"] for r in cat.load_cache("c", "h").collect()}
    assert rows["shared"] == "from_batch_0"  # existing-wins survived
    assert {f"k{i}" for i in range(4)} <= set(rows)


def test_heal_swap_recovers_stranded_table(spark, tmp_path):
    """Simulate the kill-9 window inside _write_swap: table renamed to
    .__swap_old_* but the replacement never landed. A read heals it."""
    from ocr_translation_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    spark.createDataFrame([("a", 1)], "h string, v int").write.parquet(
        os.path.join(str(tmp_path), "t")
    )
    os.rename(
        os.path.join(str(tmp_path), "t"),
        os.path.join(str(tmp_path), "t.__swap_old_deadbeef"),
    )
    assert cat.exists("t")  # heal happened on path resolution
    assert cat.load("t").count() == 1


def test_merge_cache_migrates_legacy_flat_layout(spark, tmp_path):
    """A cache table written by the old rewrite-style merge (flat
    parquet files) is folded into batch=0 on the next merge; its
    entries keep winning over new ones."""
    from ocr_translation_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    spark.createDataFrame(
        [("k1", "legacy")], "h string, v string"
    ).write.parquet(os.path.join(str(tmp_path), "c"))
    cat.merge_cache(
        spark.createDataFrame([("k1", "NEW"), ("k2", "NEW")], "h string, v string"),
        "c", "h",
    )
    rows = {r["h"]: r["v"] for r in cat.load_cache("c", "h").collect()}
    assert rows == {"k1": "legacy", "k2": "NEW"}
