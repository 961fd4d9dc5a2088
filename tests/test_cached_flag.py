"""Per-request ``cached`` flag (T10 parity, reference
``controllers/pdf.js:38``): a False flag skips the cache GET for that
document — it must receive a freshly computed value, never a
(possibly stale) cached one — while the cache store stays
unconditional. Exercised with a POISONED cache so routing is
observable: flag=True docs faithfully get the poisoned value
(reference semantics), flag=False docs get golden output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_translation_spark.pipeline import extract
from tests.conftest import load_fixture


def _spans_map(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in df.collect()
    }


def _with_flags(docs):
    # deterministic mixed flags: half the docs opt out of the cache
    return docs.withColumn(
        "cached", F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0
    )


def test_mixed_flags_with_honest_cache_equal_golden(
    spark, fixture_dir
):
    docs = load_fixture(spark, fixture_dir, "documents")
    media = load_fixture(spark, fixture_dir, "media")
    golden = _spans_map(extract(spark, docs, media, use_cache=False).result)

    # honest cache = the pipeline's own computed entries
    honest = extract(spark, docs, media).new_ocr_cache
    out = extract(
        spark,
        _with_flags(docs),
        media,
        ocr_cache=honest,
        cache_flag_col="cached",
    )
    assert _spans_map(out.result) == golden
    # store-always: the run still computed (and would store) entries
    # for every payload some opted-out doc referenced
    assert out.new_ocr_cache.count() > 0


def test_poisoned_cache_routes_by_flag(spark, fixture_dir):
    docs = load_fixture(spark, fixture_dir, "documents")
    media = load_fixture(spark, fixture_dir, "media")
    golden = _spans_map(extract(spark, docs, media, use_cache=False).result)

    # poison EVERY cache entry with a sentinel the pipeline passes
    # through unchanged (single token, not boilerplate, not in dict)
    poison = media.select(
        F.sha2("media_bytes", 256).alias("h"),
        F.lit("poisonzz").alias("ocr_text"),
    )
    flagged = _with_flags(docs)
    flags = {r["doc_id"]: r["cached"] for r in flagged.collect()}
    has_media = {
        r["doc_id"]
        for r in docs.select(
            "doc_id",
            F.exists(
                "spans", lambda s: s["media_ref"].isNotNull()
            ).alias("m"),
        ).collect()
        if r["m"]
    }

    out = _spans_map(
        extract(
            spark, flagged, media, ocr_cache=poison, cache_flag_col="cached"
        ).result
    )
    assert set(out) == set(golden)
    for doc_id, spans in out.items():
        if not flags[doc_id]:
            # opted out: fresh compute, poisoned cache invisible
            assert spans == golden[doc_id], f"fresh doc {doc_id} not golden"
        elif doc_id in has_media:
            # faithful reference semantics: cache hit wins, poison shows
            texts = " ".join(t or "" for _, t, _ in spans)
            assert "poisonzz" in texts, f"cached doc {doc_id} missed cache"
        else:
            assert spans == golden[doc_id]


def test_all_false_flags_equal_cache_off(spark, fixture_dir):
    docs = load_fixture(spark, fixture_dir, "documents")
    media = load_fixture(spark, fixture_dir, "media")
    golden = _spans_map(extract(spark, docs, media, use_cache=False).result)
    poison = media.select(
        F.sha2("media_bytes", 256).alias("h"),
        F.lit("poisonzz").alias("ocr_text"),
    )
    out = extract(
        spark,
        docs.withColumn("cached", F.lit(False)),
        media,
        ocr_cache=poison,
        cache_flag_col="cached",
    )
    assert _spans_map(out.result) == golden
    # every referenced distinct payload was computed fresh -> all are
    # new-cache candidates (existing rows win at merge time)
    n_needed = (
        media.select(F.sha2("media_bytes", 256).alias("h")).distinct().count()
    )
    assert out.new_ocr_cache.count() == n_needed
