"""Tests for text-analysis / dedup / similarity / multimodal operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions import (
    add_fingerprint,
    add_lang_id,
    add_quality,
    add_token_count,
    brute_force_topk,
    exact_dedup,
    lsh_bucketed_topk,
    minhash_near_dup_pairs,
    simhash64,
)
from ocr_translation_spark.functions.dedup import simhash_hamming


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the fast spark engine runs the fast query plan today"),
        (2, "the fast spark engine runs the fast query plan today"),  # exact dup
        (3, "the fast spark engine runs the fast query plan tonight"),  # near dup
        (4, "completely different words about rivers and mountains here"),
        (5, ""),
        (6, "der hund und die katze ist von dem haus"),
        (7, "el gato y el perro en la casa por que"),
        (8, "a b c d e f g h i j k l m n o p"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(spark, docs):
    got = {r["doc_id"]: r["n_tokens"] for r in add_token_count(docs).collect()}
    assert got[1] == 10 and got[5] == 0 and got[8] == 16


def test_quality(spark, docs):
    got = {r["doc_id"]: r for r in add_quality(docs).collect()}
    assert got[1]["quality_keep"] is True
    assert got[5]["quality_keep"] is False  # empty
    assert got[8]["quality_keep"] is False  # mean token length 1


def test_lang_id(spark, docs):
    got = {r["doc_id"]: r["lang_guess"] for r in add_lang_id(docs).collect()}
    assert got[1] == "en"
    assert got[6] == "de"
    assert got[7] == "es"
    assert got[5] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "The  Fast   Spark"), (2, "the fast spark")], "doc_id long, text string"
    )
    rows = add_fingerprint(df).collect()
    assert rows[0]["fp_sha256"] == rows[1]["fp_sha256"]
    assert rows[0]["fp_min_shingle"] == rows[1]["fp_min_shingle"]


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in out}
    assert by_keep[1] == 2  # docs 1+2 collapse, survivor = min id
    assert 2 not in by_keep
    assert by_keep[3] == 1


def test_minhash_near_dup(spark, docs):
    pairs = minhash_near_dup_pairs(
        docs.filter("doc_id <= 4"), jaccard_threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got  # exact dup always found
    assert (1, 3) in got or (2, 3) in got  # near dup caught by some band
    assert all(4 not in p for p in got)  # unrelated doc never pairs
    for r in pairs:
        if (r["id_a"], r["id_b"]) == (1, 2):
            assert r["jaccard"] == 1.0


def test_simhash(spark, docs):
    out = docs.select(
        "doc_id", simhash64(F.col("text")).alias("sh")
    ).collect()
    sh = {r["doc_id"]: r["sh"] for r in out}
    assert sh[1] == sh[2]
    df = spark.createDataFrame(
        [(sh[1], sh[3]), (sh[1], sh[4])], "a long, b long"
    )
    d = df.select(simhash_hamming(F.col("a"), F.col("b")).alias("d")).collect()
    near, far = d[0]["d"], d[1]["d"]
    assert near < far  # near-dup is closer in hamming space


@pytest.fixture(scope="module")
def embeddings(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(20, 8).astype("float32")
    base[1] = base[0] + 0.01 * rng.randn(8).astype("float32")  # near-neighbor pair
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(spark, embeddings):
    out = brute_force_topk(
        embeddings, embeddings.filter("vec_id = 0"), k=3, round_digits=6
    ).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["neighbor_id"] == 1  # the planted neighbor
    assert out[0]["sim"] > 0.99
    # rank ordering is by sim desc
    sims = [r["sim"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_lsh_recall_of_planted_neighbor(spark, embeddings):
    out = lsh_bucketed_topk(
        embeddings, embeddings.filter("vec_id = 0"), dim=8, k=3, n_planes=4
    ).collect()
    # the planted near-identical vector lands in the same SRP bucket
    assert any(r["neighbor_id"] == 1 for r in out)


def test_media_metadata_and_features(spark, fixture_dir):
    from ocr_translation_spark.functions.multimodal import (
        FEATURE_DIM,
        extract_media_features,
        extract_media_metadata,
    )
    from tests.conftest import load_fixture

    media = load_fixture(spark, fixture_dir, "media")
    meta = extract_media_metadata(media)
    rows = meta.collect()
    assert all(r["decode_ok"] for r in rows)  # SYNTHIMG decodes for real
    assert all(r["n_tokens"] >= 3 for r in rows)
    feats = extract_media_features(media).collect()
    assert all(len(r["features"]) == FEATURE_DIM for r in feats)
    for r in feats:
        assert math.isclose(sum(r["features"]), 1.0, rel_tol=1e-5)


def test_real_codec_is_stubbed(spark):
    """Non-SYNTHIMG payloads route through the NotImplementedError stub
    and surface as decode_ok=false (never a job failure)."""
    from ocr_translation_spark.functions.multimodal import extract_media_metadata

    df = spark.createDataFrame(
        [("img_x", bytearray(b"\x89PNG\r\n\x1a\nfakepngbytes"), "png")],
        "media_ref string, media_bytes binary, media_kind string",
    )
    row = extract_media_metadata(df).collect()[0]
    assert row["decode_ok"] is False
    assert row["n_bytes"] == 20


def test_repetition_signals_values(spark):
    from ocr_translation_spark.functions.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),       # bigrams: ab x3, ba x2 -> top 3/5
            (2, "x"),                  # no bigrams/trigrams
            (3, ""),                   # blank: one empty token
            (4, "u v w x y z"),        # all distinct
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert got[1]["n_bigrams"] == 5
    assert got[1]["top_bigram_frac"] == 0.6
    # trigrams: aba x2, bab x2 -> all 4 occurrences duplicated
    assert got[1]["dup_trigram_frac"] == 1.0
    assert got[1]["distinct_token_ratio"] == round(2 / 6, 6)
    assert got[2]["n_bigrams"] == 0
    assert got[2]["top_bigram_frac"] == 0.0
    assert got[3]["n_bigrams"] == 0
    assert got[4]["top_bigram_frac"] == round(1 / 5, 6)
    assert got[4]["dup_trigram_frac"] == 0.0
    assert got[4]["distinct_token_ratio"] == 1.0


def test_word_grams_multiset_vs_shingles_distinct(spark):
    from pyspark.sql import functions as F

    from ocr_translation_spark.functions.dedup import shingles
    from ocr_translation_spark.functions.text import (
        normalized_text,
        word_grams,
    )

    df = spark.createDataFrame([("a b a b a",)], "text string")
    row = df.select(
        word_grams(F.split(normalized_text(F.col("text")), " "), 2).alias("g"),
        shingles(F.col("text"), 2).alias("s"),
    ).collect()[0]
    assert row["g"] == ["a b", "b a", "a b", "b a"]  # multiset, ordered
    assert sorted(row["s"]) == ["a b", "b a"]  # distinct set


def test_repetition_signals_matches_python_reference(spark):
    """Seeded randomized cross-check: 60 docs of random small-vocab
    token streams (high collision rates by construction) vs a direct
    Python computation of the same definitions."""
    import random
    from collections import Counter

    from ocr_translation_spark.functions.text import repetition_signals

    rng = random.Random(42)
    vocab = ["a", "b", "cc", "ddd", "e"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
        for i in range(60)
    ]
    got = {
        r["doc_id"]: r
        for r in repetition_signals(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    for i, text in docs:
        toks = " ".join(text.lower().split()).split(" ")  # normalized
        bi = Counter(zip(toks, toks[1:]))
        tri = Counter(zip(toks, toks[1:], toks[2:]))
        n2 = sum(bi.values())
        n3 = sum(tri.values())
        r = got[i]
        assert r["n_bigrams"] == n2, (i, text)
        exp_top = round(max(bi.values()) / n2, 6) if n2 else 0.0
        assert r["top_bigram_frac"] == exp_top, (i, text)
        exp_dup = (
            round(sum(c for c in tri.values() if c >= 2) / n3, 6)
            if n3
            else 0.0
        )
        assert r["dup_trigram_frac"] == exp_dup, (i, text)
        assert r["distinct_token_ratio"] == round(
            len(set(toks)) / len(toks), 6
        ), (i, text)


def test_resize_media_scales_synthetic_grid(spark):
    from ocr_translation_spark import semantics as S
    from ocr_translation_spark.functions.multimodal import resize_media

    img = S.encode_media([("a", 0, 0), ("b", 3, 7)])  # 8x4 grid
    media = spark.createDataFrame(
        [("m1", bytearray(img)), ("m2", bytearray(b"\x89PNG\r\n fake"))],
        "media_ref string, media_bytes binary",
    )
    got = {r["media_ref"]: r.asDict()
           for r in resize_media(media, 4, 2).collect()}
    assert got["m1"]["resize_ok"] and got["m1"]["out_width"] == 4
    toks = S.decode_media(bytes(got["m1"]["resized_bytes"]))
    # (y,x): (0,0) -> (0,0); (3,7) -> (3*2//4, 7*4//8) = (1, 3)
    assert sorted(toks) == [("a", 0, 0), ("b", 1, 3)]
    # real raster format: gated, surfaced as resize_ok=False not a crash
    assert got["m2"]["resize_ok"] is False
    assert got["m2"]["resized_bytes"] is None


def test_video_frame_sampling(spark):
    from ocr_translation_spark import semantics as S
    from ocr_translation_spark.functions.multimodal import (
        decode_video_frames,
        encode_video,
        sample_frames,
    )

    frames = [S.encode_media([(f"f{i}", 0, 0)]) for i in range(5)]
    vid = encode_video(frames)
    assert decode_video_frames(vid) == frames  # container round-trips
    media = spark.createDataFrame(
        [("v1", bytearray(vid)), ("v2", bytearray(b"\x00\x00\x00\x18ftypmp4"))],
        "media_ref string, media_bytes binary",
    )
    rows = sample_frames(media, every_n=2).collect()
    v1 = sorted(
        (r["frame_idx"], bytes(r["frame_bytes"]))
        for r in rows if r["media_ref"] == "v1"
    )
    # every 2nd frame of 5: indices 0, 2, 4
    assert [i for i, _ in v1] == [0, 2, 4]
    assert v1[1][1] == frames[2]
    assert all(r["n_frames"] == 5 for r in rows if r["media_ref"] == "v1")
    # real container: one null-frame row, the ref is never dropped
    v2 = [r for r in rows if r["media_ref"] == "v2"]
    assert len(v2) == 1 and v2[0]["frame_idx"] is None
