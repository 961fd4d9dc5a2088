"""Image-text caption pairing over interleaved spans
(functions/multimodal.py caption_pairs)."""

from __future__ import annotations

from ocr_translation_spark.functions.multimodal import caption_pairs

SCHEMA = "doc_id long, ord int, kind string, text string, media_ref string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return sorted(
        (r.doc_id, r.ord, r.media_ref, r.caption, r.caption_side)
        for r in caption_pairs(df).collect()
    )


def test_caption_prefers_following_text(spark):
    rows = [
        (1, 0, "text", "intro words", None),
        (1, 1, "media", "", "img_a"),
        (1, 2, "text", "figure one caption", None),
    ]
    assert _run(spark, rows) == [
        (1, 1, "img_a", "figure one caption", "after")
    ]


def test_caption_falls_back_to_preceding(spark):
    rows = [
        (2, 0, "text", "the only text", None),
        (2, 1, "media", "", "img_b"),
    ]
    assert _run(spark, rows) == [(2, 1, "img_b", "the only text", "before")]


def test_caption_none_in_text_free_doc(spark):
    rows = [
        (3, 0, "media", "", "img_c"),
        (3, 1, "media", "", "img_d"),
    ]
    got = _run(spark, rows)
    assert got == [
        (3, 0, "img_c", None, "none"),
        (3, 1, "img_d", None, "none"),
    ]


def test_caption_nearest_not_any_text(spark):
    rows = [
        (4, 0, "text", "far away", None),
        (4, 1, "text", "nearer", None),
        (4, 2, "media", "", "img_e"),
        (4, 3, "boiler", "nav nav", None),
        (4, 4, "text", "right after boiler", None),
        (4, 5, "media", "", "img_f"),
    ]
    got = _run(spark, rows)
    # img_e: next text skips the boiler span; img_f: only prior text
    assert got == [
        (4, 2, "img_e", "right after boiler", "after"),
        (4, 5, "img_f", "right after boiler", "before"),
    ]


def test_caption_partition_invariance(spark):
    rows = []
    for d in range(6):
        for i in range(8):
            if (d + i) % 3 == 0:
                rows.append((d, i, "media", "", f"img_{d}_{i}"))
            else:
                rows.append((d, i, "text", f"t {d} {i}", None))
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(tuple(r) for r in caption_pairs(df).collect())
    b = sorted(tuple(r) for r in caption_pairs(df.repartition(7)).collect())
    assert a == b
    assert len(a) == sum(1 for r in rows if r[2] == "media")
