"""Cached-translate variant (reference S6 parity): cache-on ≡ cache-off,
pre-seeded cache short-circuits compute, store-always semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_translation_spark import semantics as S
from ocr_translation_spark.operators.stage_c_translate import (
    translate_texts_with_cache,
)


def _collect(df):
    return {r["doc_id"]: r["translated"] for r in df.collect()}


def test_cache_on_equals_off_and_matches_golden(spark):
    rows = [(i, t) for i, t in enumerate(
        ["the fast spark", "the fast spark", "a small batch", "unknown zz"]
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    off, _ = translate_texts_with_cache(df, use_cache=False)
    on, new_cache = translate_texts_with_cache(df, use_cache=True)
    assert _collect(off) == _collect(on)
    for r in off.collect():
        assert r["translated"] == S.translate_text(r["text"])
    # dedup: 4 rows, 3 distinct payloads -> 3 cache entries
    assert new_cache.count() == 3

    # warm-cache second run: results identical
    cache = new_cache.cache()
    cache.count()
    warm, second_new = translate_texts_with_cache(df, cache_df=cache)
    assert _collect(warm) == _collect(off)
    assert second_new.count() == 0  # everything was a hit


def test_preseeded_cache_wins(spark):
    df = spark.createDataFrame([(1, "the")], "doc_id long, text string")
    h = (
        df.select(F.sha2(F.concat(F.col("text"), F.lit("vi")), 256).alias("h"))
        .collect()[0]["h"]
    )
    poisoned = spark.createDataFrame(
        [(h, "POISON")], "h string, translated string"
    )
    out, _ = translate_texts_with_cache(df, cache_df=poisoned, use_cache=True)
    assert _collect(out) == {1: "POISON"}
    out2, _ = translate_texts_with_cache(df, cache_df=poisoned, use_cache=False)
    assert _collect(out2) == {1: "cái"}
