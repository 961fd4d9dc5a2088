"""Property-based tests of the golden spec (hypothesis, no Spark).

These pin down the invariants the distributed pipeline inherits:
idempotence of stage B+C on already-extracted docs, offset
re-enumeration, determinism, and order-independence of input offsets.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ocr_translation_spark import semantics as S

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=10,
)
texts = st.lists(words, min_size=0, max_size=8).map(" ".join)
kinds = st.sampled_from(S.ALL_KINDS)


@st.composite
def span_lists(draw):
    n = draw(st.integers(0, 30))
    out = []
    for i in range(n):
        kind = draw(kinds)
        if kind == S.KIND_MEDIA:
            s = {"kind": kind, "text": None,
                 "media_ref": "img_" + draw(words), "offset": i}
        else:
            s = {"kind": kind, "text": draw(texts), "media_ref": None,
                 "offset": i}
        out.append(s)
    return out


@given(span_lists())
@settings(max_examples=200, deadline=None)
def test_offsets_reenumerated_and_kinds_survive(spans):
    out = S.extract_doc(spans, {})
    assert [s["offset"] for s in out] == list(range(len(out)))
    for s in out:
        assert s["kind"] in (S.KIND_TEXT, S.KIND_MEDIA)
        if s["kind"] == S.KIND_TEXT:
            assert s["text"] is not None and s["text"].strip()
            assert S.boiler_score(s["text"]) <= S.BOILER_THRESHOLD + 1e-9


@given(span_lists())
@settings(max_examples=200, deadline=None)
def test_deterministic(spans):
    assert S.extract_doc(spans, {}) == S.extract_doc(spans, {})


@given(span_lists(), st.randoms())
@settings(max_examples=100, deadline=None)
def test_input_order_irrelevant(spans, rnd):
    """Offsets define order; the list order of the input must not."""
    shuffled = list(spans)
    rnd.shuffle(shuffled)
    assert S.extract_doc(shuffled, {}) == S.extract_doc(spans, {})


@given(span_lists())
@settings(max_examples=100, deadline=None)
def test_stage_b_idempotent_and_c_stable_on_unknown(spans):
    """Running the pipeline on its own output only re-translates text;
    with a dict whose outputs are never dict keys, the second pass can
    only touch tokens that map to themselves — so span structure
    (kind, media_ref, order) is a fixed point."""
    once = S.extract_doc(spans, {})
    twice = S.extract_doc(once, {})
    assert [(s["kind"], s["media_ref"]) for s in twice] == [
        (s["kind"], s["media_ref"]) for s in once
    ]


@given(st.lists(st.tuples(words, st.integers(0, 4), st.integers(0, 39)),
                min_size=0, max_size=20))
@settings(max_examples=200, deadline=None)
def test_media_roundtrip_and_reading_order(toks):
    b = S.encode_media(toks)
    assert S.decode_media(b) == toks
    txt = S.ocr_text(b)
    ordered = sorted(toks, key=lambda t: (t[1], t[2], t[0]))
    assert txt == " ".join(t[0] for t in ordered)
