"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed
metadata, processed via ``mapInPandas`` over Arrow batches — the
Spark-side plumbing (schema, batch shape, partitioning) is real and
tested; the actual codec calls are STUBBED because the image/audio
libraries are not available in this container:

* payloads in the synthetic ``SYNTHIMG/1`` format decode for real
  (deterministic fake codec — see semantics.py);
* any other format raises ``NotImplementedError`` inside the
  clearly-marked ``_decode_real`` hook, where PIL/ffmpeg would slot in.

Feature extraction emits a fixed-width byte-histogram feature vector
(a deterministic stand-in for an embedding model) so downstream
similarity operators have realistic input shapes to run against.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import semantics as S

MEDIA_META_SCHEMA = (
    "media_ref string, media_kind string, n_bytes int, "
    "n_tokens int, width int, height int, decode_ok boolean"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_ref string, features array<float>"


def parse_image_header(b: bytes):
    """Pure-Python container-header parse for REAL image formats
    (reference accepts png/jpg/jpeg/gif/webp/tiff, test/multiImage.js:105).
    Returns ``(format, width, height)`` or None if unrecognized. This
    is the dependency-free slice of real-media support: dimensions and
    format detection work on genuine files; pixel decode + OCR still
    need PIL/tesseract (see ``_decode_real``).
    """
    if len(b) < 16:
        return None
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        return ("png", int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"))
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return ("gif", int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"))
    if b[:2] == b"BM" and len(b) >= 26:
        return ("bmp", int.from_bytes(b[18:22], "little"),
                int.from_bytes(b[22:26], "little", signed=True))
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 30:
        chunk = b[12:16]
        if chunk == b"VP8X":
            return ("webp",
                    int.from_bytes(b[24:27], "little") + 1,
                    int.from_bytes(b[27:30], "little") + 1)
        if chunk == b"VP8 ":
            return ("webp",
                    int.from_bytes(b[26:28], "little") & 0x3FFF,
                    int.from_bytes(b[28:30], "little") & 0x3FFF)
        return ("webp", None, None)
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        return _parse_tiff_dims(b)
    if b[:2] == b"\xff\xd8":
        # JPEG: walk the segment chain to the first SOFn marker
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                return ("jpeg", None, None)
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(b[i + 2:i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return ("jpeg", int.from_bytes(b[i + 7:i + 9], "big"),
                        int.from_bytes(b[i + 5:i + 7], "big"))
            i += 2 + seg_len
        return ("jpeg", None, None)
    return None


def _parse_tiff_dims(b: bytes):
    endian = "little" if b[:2] == b"II" else "big"
    try:
        ifd = int.from_bytes(b[4:8], endian)
        n = int.from_bytes(b[ifd:ifd + 2], endian)
        w = h = None
        for k in range(n):
            e = ifd + 2 + 12 * k
            tag = int.from_bytes(b[e:e + 2], endian)
            typ = int.from_bytes(b[e + 2:e + 4], endian)
            size = 2 if typ == 3 else 4
            val = int.from_bytes(b[e + 8:e + 8 + size], endian)
            if tag == 256:
                w = val
            elif tag == 257:
                h = val
        return ("tiff", w, h)
    except (IndexError, ValueError):
        return ("tiff", None, None)


def _decode_real(media_bytes: bytes, media_kind: str):
    """Real-format decode: PIL when importable (full pixel decode);
    otherwise the pure-Python header parse above yields format +
    dimensions with an empty token list (token extraction needs an OCR
    engine — tesseract in the reference — which this container lacks).
    Raises NotImplementedError only for unrecognizable payloads."""
    try:
        from PIL import Image  # optional; absent in this container
        import io

        img = Image.open(io.BytesIO(media_bytes))
        img.load()
        return [], img.size[0], img.size[1]
    except ImportError:
        pass
    except Exception:
        raise NotImplementedError(f"undecodable {media_kind} payload")
    parsed = parse_image_header(bytes(media_bytes))
    if parsed is not None and parsed[1] is not None:
        return [], parsed[1], parsed[2]
    raise NotImplementedError(
        f"real {media_kind} decoding requires an image library "
        "not present in this environment"
    )


def decode_tokens(media_bytes: bytes, media_kind: str):
    """Decode to (tokens, width, height); SYNTHIMG decodes for real."""
    try:
        toks = S.decode_media(media_bytes)
    except ValueError:
        return _decode_real(media_bytes, media_kind)
    w = max((x for _, _, x in toks), default=0) + 1
    h = max((y for _, y, _ in toks), default=0) + 1
    return toks, w, h


def media_metadata_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (media_ref, media_bytes, media_kind) -> metadata."""
    for pdf in batches:
        rows = []
        for ref, b, kind in zip(
            pdf["media_ref"], pdf["media_bytes"], pdf["media_kind"]
        ):
            try:
                toks, w, h = decode_tokens(b, kind)
                rows.append((ref, kind, len(b), len(toks), w, h, True))
            except NotImplementedError:
                rows.append((ref, kind, len(b), None, None, None, False))
        yield pd.DataFrame(
            rows,
            columns=[
                "media_ref", "media_kind", "n_bytes", "n_tokens",
                "width", "height", "decode_ok",
            ],
        )


def extract_media_metadata(media_df: DataFrame) -> DataFrame:
    return media_df.select("media_ref", "media_bytes", "media_kind").mapInPandas(
        media_metadata_batches, schema=MEDIA_META_SCHEMA
    )


def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Byte-histogram 'embedding' per payload (vectorized via numpy)."""
    for pdf in batches:
        feats = []
        for b in pdf["media_bytes"]:
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
            total = hist.sum() or 1
            feats.append((hist / total).astype(np.float32).tolist())
        yield pd.DataFrame({"media_ref": pdf["media_ref"], "features": feats})


def extract_media_features(media_df: DataFrame) -> DataFrame:
    return media_df.select("media_ref", "media_bytes").mapInPandas(
        feature_batches, schema=FEATURE_SCHEMA
    )


# ---------------------------------------------------------------- resize

RESIZE_SCHEMA = (
    "media_ref string, resized_bytes binary, out_width int, "
    "out_height int, resize_ok boolean"
)


def resize_tokens(media_bytes: bytes, new_w: int, new_h: int) -> bytes:
    """Resize a SYNTHIMG payload onto a new_w x new_h grid by integer
    coordinate scaling (deterministic nearest-cell — the stand-in for a
    pixel resampler). Real raster formats raise NotImplementedError in
    the gated hook where PIL's ``Image.resize`` would slot in."""
    try:
        toks = S.decode_media(media_bytes)
    except ValueError:
        raise NotImplementedError(
            "real-format resize needs an image library (PIL hook)"
        )
    old_w = max((x for _, _, x in toks), default=0) + 1
    old_h = max((y for _, y, _ in toks), default=0) + 1
    out = [
        (tok, y * new_h // old_h, x * new_w // old_w) for tok, y, x in toks
    ]
    return S.encode_media(out)


def resize_batches(new_w: int, new_h: int):
    def _body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, b in zip(pdf["media_ref"], pdf["media_bytes"]):
                try:
                    rows.append(
                        (ref, resize_tokens(bytes(b), new_w, new_h),
                         new_w, new_h, True)
                    )
                except NotImplementedError:
                    rows.append((ref, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "resized_bytes", "out_width",
                    "out_height", "resize_ok",
                ],
            )

    return _body


def resize_media(media_df: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """mapInPandas resize over (media_ref, media_bytes); embarrassingly
    parallel, batch-sized Arrow transfer, no shuffle."""
    return media_df.select("media_ref", "media_bytes").mapInPandas(
        resize_batches(new_w, new_h), schema=RESIZE_SCHEMA
    )


# ---------------------------------------------------- video frame sampling

VIDEO_MAGIC = b"SYNTHVID/1\0"
FRAME_SCHEMA = (
    "media_ref string, frame_idx int, frame_bytes binary, n_frames int"
)


def encode_video(frames: list[bytes]) -> bytes:
    """Deterministic synthetic video container: magic + per-frame
    4-byte big-endian length prefixes. Frames are SYNTHIMG payloads."""
    parts = [VIDEO_MAGIC]
    for f in frames:
        parts.append(len(f).to_bytes(4, "big"))
        parts.append(f)
    return b"".join(parts)


def decode_video_frames(media_bytes: bytes) -> list[bytes]:
    """Split a SYNTHVID payload back into frame payloads. Real video
    containers (mp4/webm) raise NotImplementedError in the gated hook
    where ffmpeg/pyav would slot in."""
    if not media_bytes.startswith(VIDEO_MAGIC):
        raise NotImplementedError(
            "real-format demux needs a video library (ffmpeg hook)"
        )
    out, i = [], len(VIDEO_MAGIC)
    while i < len(media_bytes):
        n = int.from_bytes(media_bytes[i:i + 4], "big")
        i += 4
        out.append(media_bytes[i:i + n])
        i += n
    return out


def frame_sample_batches(every_n: int):
    def _body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, b in zip(pdf["media_ref"], pdf["media_bytes"]):
                try:
                    frames = decode_video_frames(bytes(b))
                except NotImplementedError:
                    rows.append((ref, None, None, None))
                    continue
                for idx in range(0, len(frames), every_n):
                    rows.append((ref, idx, frames[idx], len(frames)))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "frame_idx", "frame_bytes", "n_frames"],
            )

    return _body


def sample_frames(media_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Every ``every_n``-th frame of each video payload, exploded to
    one row per sampled frame — the shape a frame-level
    embed/caption/filter stage consumes. Fan-out happens INSIDE the
    Arrow batch (no Spark-side explode of raw bytes), undecodable
    payloads surface as a single null-frame row, never a dropped ref."""
    return media_df.select("media_ref", "media_bytes").mapInPandas(
        frame_sample_batches(every_n), schema=FRAME_SCHEMA
    )


def caption_pairs(spans: DataFrame) -> DataFrame:
    """(doc_id, ord, media_ref, caption, caption_side): image-text
    pair mining over an interleaved span stream — each media span
    paired with the nearest TEXT span's content, preferring the span
    that FOLLOWS the media (captions follow figures; LAION-style
    alt-text/caption harvesting for image-text contrastive training).

    Input is the extracted span table (doc_id, ord, kind, text,
    media_ref) — the flagship pipeline's output shape.  The pairing is
    two frame-bounded window functions over ONE doc-keyed partition
    (the ``first``-after and ``last``-before text span, nulls
    ignored), so the whole operator costs a single uniform doc_id
    shuffle at any corpus size — no self-join, no explode, no Python.
    Media spans in text-free documents survive with ``caption NULL,
    caption_side 'none'`` (drop accounting stays visible; the
    downstream filter decides).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = Window.partitionBy("doc_id").orderBy("ord")
    before = base.rowsBetween(Window.unboundedPreceding, -1)
    after = base.rowsBetween(1, Window.unboundedFollowing)
    text_or_null = F.when(F.col("kind") == "text", F.col("text"))
    prev_t = F.last(text_or_null, ignorenulls=True).over(before)
    next_t = F.first(text_or_null, ignorenulls=True).over(after)
    return (
        spans.select(
            "doc_id",
            "ord",
            "kind",
            "media_ref",
            prev_t.alias("_prev"),
            next_t.alias("_next"),
        )
        .filter(F.col("kind") == "media")
        .select(
            "doc_id",
            "ord",
            "media_ref",
            F.coalesce(F.col("_next"), F.col("_prev")).alias("caption"),
            F.when(F.col("_next").isNotNull(), F.lit("after"))
            .when(F.col("_prev").isNotNull(), F.lit("before"))
            .otherwise(F.lit("none"))
            .alias("caption_side"),
        )
    )
