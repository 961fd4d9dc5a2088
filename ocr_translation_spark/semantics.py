"""Single-document reference semantics (the golden spec).

This module is the pure-Python, no-Spark analogue of the reference's
sequential demo pipeline (reference ``index.js:5-16``: ocr -> translate
-> createPDF).  It defines, doc-at-a-time, exactly what the distributed
pipeline must compute; pytest asserts span-sequence equality
``(kind, text, media_ref, order)`` between this and the Spark output.

Everything here is deterministic and offline:

* OCR (stage A, reference ``src/utils/ocr.js:13-17``): real Tesseract is
  environment-dependent and unavailable, so media payloads use a
  deterministic synthetic format (``SYNTHIMG/1``) that encodes tokens
  with (y, x) page coordinates; "OCR" = decode + connected-component
  style reading-order sort (sort by y, then x) + join.  This mirrors
  the *structure* of OCR (segment -> order -> extract) without the
  environment dependency.
* Boilerplate strip (stage B): drop markup (``tag_open``/``tag_close``)
  and ``boiler`` spans, plus ``text`` spans that are empty or whose
  boilerplate-token density exceeds 0.5 (tag-density / text-to-markup
  scoring family; the reference's degenerate form is the empty-text
  rejection at ``src/utils/pdf.js:14-22``).
* Translation (stage C, reference ``src/utils/translator.js:8-23``):
  token-wise dictionary mapping en->vi with identity fallback —
  deterministic stand-in for the Google-translate HTTP call.  Applied
  to ``text`` spans and to the OCR output of ``media`` spans (the
  reference translates OCR results end-to-end).

Output spans are re-offset 0..n-1 (order = array order).
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# Span kinds
# --------------------------------------------------------------------------

KIND_TEXT = "text"
KIND_MEDIA = "media"
KIND_TAG_OPEN = "tag_open"
KIND_TAG_CLOSE = "tag_close"
KIND_BOILER = "boiler"

ALL_KINDS = (KIND_TEXT, KIND_MEDIA, KIND_TAG_OPEN, KIND_TAG_CLOSE, KIND_BOILER)
MARKUP_KINDS = (KIND_TAG_OPEN, KIND_TAG_CLOSE)

# --------------------------------------------------------------------------
# Synthetic media payload format (stage A input)
# --------------------------------------------------------------------------

MEDIA_MAGIC = "SYNTHIMG/1"


def encode_media(tokens_with_coords: list[tuple[str, int, int]]) -> bytes:
    """Encode [(token, y, x), ...] as a deterministic synthetic image."""
    lines = [MEDIA_MAGIC]
    lines += [f"{tok}@{y},{x}" for tok, y, x in tokens_with_coords]
    return "\n".join(lines).encode("utf-8")


def decode_media(media_bytes: bytes) -> list[tuple[str, int, int]]:
    """Decode the synthetic image format back to [(token, y, x), ...].

    Raises ValueError on a payload that is not SYNTHIMG/1 — real image
    formats (png/jpg/...) would be decoded here by an image library,
    which is unavailable in this environment (see functions/multimodal.py
    for the gated real-decoder stubs).
    """
    textual = media_bytes.decode("utf-8", errors="strict")
    lines = textual.split("\n")
    if not lines or lines[0] != MEDIA_MAGIC:
        raise ValueError("unsupported media payload (expected SYNTHIMG/1)")
    out: list[tuple[str, int, int]] = []
    for line in lines[1:]:
        if not line:
            continue
        tok, _, coords = line.rpartition("@")
        y_s, _, x_s = coords.partition(",")
        out.append((tok, int(y_s), int(x_s)))
    return out


def ocr_text(media_bytes: bytes) -> str:
    """Stage A on one media payload: decode, reading-order sort, join.

    Reading order = sort by (y, x, token): top-to-bottom, left-to-right —
    the deterministic stand-in for Tesseract's block/line segmentation
    (reference src/utils/ocr.js:13-17 flattens to one string the same way).
    """
    toks = decode_media(media_bytes)
    toks.sort(key=lambda t: (t[1], t[2], t[0]))
    return " ".join(t[0] for t in toks)


# --------------------------------------------------------------------------
# Stage B: boilerplate heuristics
# --------------------------------------------------------------------------

# Fixed token set used by the boilerplate-density score. A text span whose
# token overlap with this set exceeds BOILER_THRESHOLD is stripped even if
# its kind is 'text' (nav/footer/ad chrome that leaked into content).
BOILER_TOKENS = (
    "click", "here", "subscribe", "newsletter", "cookie", "cookies",
    "accept", "privacy", "policy", "rights", "reserved", "advertisement",
    "sponsored", "login", "signup", "register", "menu", "navigation",
    "footer", "header", "copyright", "terms", "conditions", "share",
    "tweet", "follow", "contact", "about", "home", "sitemap",
)
BOILER_TOKEN_SET = frozenset(BOILER_TOKENS)
BOILER_THRESHOLD = 0.5


def boiler_score(text: str) -> float:
    """Fraction of whitespace tokens that are boilerplate vocabulary."""
    toks = text.split()
    if not toks:
        return 0.0
    hits = sum(1 for t in toks if t.lower() in BOILER_TOKEN_SET)
    return hits / len(toks)


def keep_span(kind: str, text: str | None) -> bool:
    """Stage B predicate: True if the span survives the strip."""
    if kind in (KIND_BOILER, KIND_TAG_OPEN, KIND_TAG_CLOSE):
        return False
    if kind == KIND_TEXT:
        if text is None or not text.strip():
            return False
        if boiler_score(text) > BOILER_THRESHOLD:
            return False
    return True


# --------------------------------------------------------------------------
# Stage C: dictionary + rule translation (en -> vi)
# --------------------------------------------------------------------------

# Hand-written core vocabulary (covers the test-corpus vocabulary) ...
_CORE_DICT = {
    "the": "cái", "a": "một", "fast": "nhanh", "slow": "chậm",
    "small": "nhỏ", "big": "lớn", "key": "khóa", "order": "thứ_tự",
    "sort": "sắp_xếp", "table": "bảng", "scan": "quét", "merge": "gộp",
    "part": "phần", "window": "cửa_sổ", "hash": "băm", "join": "nối",
    "batch": "lô", "stream": "luồng", "spark": "tia_lửa", "dup": "trùng",
    "row": "hàng", "column": "cột", "filter": "lọc", "customer": "khách",
    "vector": "vec_tơ", "line": "dòng", "data": "dữ_liệu", "agg": "gộp_nhóm",
    "value": "giá_trị", "group": "nhóm", "query": "truy_vấn",
    "word": "từ", "image": "ảnh", "page": "trang", "text": "văn_bản",
    "document": "tài_liệu", "file": "tệp", "new": "mới", "old": "cũ",
    "good": "tốt", "bad": "xấu", "red": "đỏ", "blue": "xanh",
    "one": "một", "two": "hai", "three": "ba", "and": "và", "or": "hoặc",
    "is": "là", "of": "của", "in": "trong", "on": "trên", "with": "với",
}

# ... plus a mechanically generated tail to reach the fixed ~200-entry
# dictionary size (FIXTURES.md section 3). Pure function of the word list,
# identical on the Python and SQL-oracle sides.
_EXTRA_WORDS = (
    "engine", "plan", "node", "task", "stage", "shuffle", "cache",
    "write", "read", "load", "store", "index", "range", "limit",
    "count", "sum", "mean", "total", "final", "first", "last", "next",
    "prev", "left", "right", "inner", "outer", "cross", "union",
    "except", "distinct", "sample", "random", "seed", "byte", "bit",
    "char", "string", "number", "float", "double", "long", "short",
    "true", "false", "null", "empty", "full", "open", "close", "start",
    "stop", "run", "walk", "jump", "fly", "swim", "eat", "drink",
    "sleep", "wake", "day", "night", "sun", "moon", "star", "sky",
    "sea", "land", "tree", "leaf", "root", "branch", "stone", "river",
    "mountain", "valley", "road", "path", "house", "door", "wall",
    "roof", "floor", "light", "dark", "warm", "cold", "hot", "cool",
    "dry", "wet", "high", "low", "deep", "wide", "narrow", "long_",
    "near", "far", "east", "west", "north", "south", "spring", "summer",
    "autumn", "winter", "rain", "snow", "wind", "cloud", "storm",
    "fire", "water", "earth", "metal", "wood", "gold", "silver",
    "iron", "glass", "paper", "book", "pen", "ink", "desk", "chair",
    "clock", "watch", "phone", "screen", "mouse", "board", "wheel",
    "car", "train", "boat", "plane", "city", "town", "village",
    "street", "market", "shop", "school", "field", "garden", "farm",
)


def build_xlate_dict() -> dict[str, str]:
    """The fixed ~200-entry en->vi dictionary (lowercase src keys)."""
    d = dict(_CORE_DICT)
    for w in _EXTRA_WORDS:
        d.setdefault(w, "vi_" + w)
    return d


XLATE_DICT: dict[str, str] = build_xlate_dict()


def translate_text(text: str) -> str:
    """Token-wise dictionary translation with identity fallback.

    Lookup key is the lowercased token; unknown tokens pass through
    unchanged (rule class 'identity-fallback', FIXTURES.md section 3).
    """
    return " ".join(XLATE_DICT.get(t.lower(), t) for t in text.split())


# --------------------------------------------------------------------------
# End-to-end single-document pipeline (the golden function)
# --------------------------------------------------------------------------

def extract_doc(
    spans: list[dict],
    media_lookup: dict[str, bytes] | None = None,
) -> list[dict]:
    """Run stages A+B+C on one document's span list.

    ``spans``: [{kind, text, media_ref, offset}, ...] in offset order.
    ``media_lookup``: media_ref -> media_bytes side table; a media span
    whose ref is missing keeps text=None (quarantine-grade row, kept).

    Returns the extracted span list re-offset 0..n-1.
    """
    media_lookup = media_lookup or {}
    ordered = sorted(spans, key=lambda s: s["offset"])

    out: list[dict] = []
    for s in ordered:
        kind, text, ref = s["kind"], s.get("text"), s.get("media_ref")
        # Stage A: OCR media payloads.
        if kind == KIND_MEDIA and ref is not None and ref in media_lookup:
            text = ocr_text(media_lookup[ref])
        # Stage B: strip boilerplate / markup / empty.
        if not keep_span(kind, text):
            continue
        # Stage C: translate text content (incl. OCR output).
        if text is not None:
            text = translate_text(text)
        out.append(
            {"kind": kind, "text": text, "media_ref": ref, "offset": len(out)}
        )
    return out
