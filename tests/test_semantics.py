"""Unit tests for the pure-Python golden spec (no Spark)."""

from ocr_translation_spark import datagen as G
from ocr_translation_spark import semantics as S


def test_media_roundtrip():
    toks = [("hello", 1, 2), ("world", 0, 5)]
    assert S.decode_media(S.encode_media(toks)) == toks


def test_ocr_reading_order():
    # reading order: top-to-bottom (y), then left-to-right (x)
    b = S.encode_media([("c", 1, 0), ("b", 0, 9), ("a", 0, 1)])
    assert S.ocr_text(b) == "a b c"


def test_boiler_score_and_keep():
    assert S.boiler_score("click here to subscribe") == 0.75
    assert not S.keep_span("text", "click here to subscribe")
    assert S.keep_span("text", "the fast spark engine")
    assert not S.keep_span("boiler", "anything")
    assert not S.keep_span("tag_open", "<p>")
    assert not S.keep_span("text", "   ")
    assert not S.keep_span("text", None)
    assert S.keep_span("media", None)


def test_translate():
    assert S.translate_text("The fast SPARK engine") == "cái nhanh tia_lửa vi_engine"
    assert S.translate_text("zzz unknown") == "zzz unknown"
    assert S.translate_text("") == ""


def test_extract_doc_end_to_end():
    ref = G.media_ref_for(("t", 1))
    media = {ref: S.encode_media([("key", 0, 1), ("the", 0, 0)])}
    spans = [
        {"kind": "text", "text": "the fast key", "media_ref": None, "offset": 0},
        {"kind": "boiler", "text": "all rights reserved", "media_ref": None, "offset": 1},
        {"kind": "media", "text": None, "media_ref": ref, "offset": 2},
        {"kind": "tag_open", "text": "<p>", "media_ref": None, "offset": 3},
        {"kind": "text", "text": "click here subscribe now", "media_ref": None, "offset": 4},
    ]
    out = S.extract_doc(spans, media)
    assert out == [
        {"kind": "text", "text": "cái nhanh khóa", "media_ref": None, "offset": 0},
        {"kind": "media", "text": "cái khóa", "media_ref": ref, "offset": 1},
    ]


def test_extract_doc_out_of_order_offsets():
    spans = [
        {"kind": "text", "text": "big", "media_ref": None, "offset": 5},
        {"kind": "text", "text": "small", "media_ref": None, "offset": 2},
    ]
    out = S.extract_doc(spans, {})
    assert [s["text"] for s in out] == ["nhỏ", "lớn"]
    assert [s["offset"] for s in out] == [0, 1]


def test_datagen_determinism_and_edges():
    docs = dict(G.gen_documents(20))
    assert dict(G.gen_documents(20)) == docs
    assert docs[G.EDGE_EMPTY] == []
    assert docs[G.EDGE_DUP_A] == docs[G.EDGE_DUP_B]
    refs = {s["media_ref"] for s in docs[G.EDGE_REPEAT_MEDIA]}
    assert len(refs) == 1
    # offsets strictly increasing
    for spans in docs.values():
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) == list(range(len(offs)))


def test_media_heavy_skew_exists_at_scale():
    ids = [
        f"doc_{i:08d}"
        for i in range(600)
        if G.stable_int("heavy", G.SEED, f"doc_{i:08d}") % 97 == 0
    ]
    assert len(ids) >= 2
    spans = G.spans_for(ids[0])
    n_media = sum(1 for s in spans if s["kind"] == "media")
    assert n_media >= 50
