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


def _decode_real(media_bytes: bytes, media_kind: str):
    """Hook for real codecs (PIL / libvips / ffmpeg) — NOT AVAILABLE in
    this container. The Spark plumbing around it is real; swap this
    body for the library call in production."""
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
