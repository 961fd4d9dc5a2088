"""Stage A — OCR / layout parse over DISTINCT media payloads.

Reference parity: ``src/utils/ocr.js:13-17`` (Tesseract recognize) plus
the content-hash cache at ``src/utils/MessageQueue/OCRQueue.js:65-90``.

Scale design (the part that matters at 100 TB):

* OCR is the expensive step, so we NEVER run it per span occurrence.
  The pipeline computes the distinct set of referenced media, joins the
  media side table semi-style, and OCRs each distinct payload once —
  the Spark re-expression of the reference's Redis ``ocr:<sha256>``
  cache (dedup-before-compute, SURVEY.md section 4.1).
* The cache join is keyed on ``sha2(media_bytes, 256)`` (byte-level
  content hash, reference ``src/utils/hash.js:5-14``) so two different
  refs with identical bytes also share one OCR call.
* The Python boundary is a ``mapInPandas`` over Arrow batches — many
  payloads per batch, no per-row Python round trips. Batch size is
  capped session-wide (session.py) because payloads are large.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import semantics as S

OCR_OUT_SCHEMA = "h string, ocr_text string"


def _ocr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized OCR over Arrow batches of (h, media_bytes)."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "h": pdf["h"],
                "ocr_text": [S.ocr_text(b) for b in pdf["media_bytes"]],
            }
        )


def ocr_distinct_media(
    media_df: DataFrame,
    ocr_cache_df: DataFrame | None = None,
    use_cache: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """OCR each distinct media payload once.

    ``media_df``: (media_ref, media_bytes, ...) — one row per ref.
    ``ocr_cache_df``: optional persisted cache (h string, ocr_text string).

    Returns ``(results, new_cache_entries)`` where results is
    (media_ref, h, ocr_text) covering every input ref, and
    new_cache_entries is (h, ocr_text) for the cache misses (the caller
    MERGEs them into the cache table — store-always semantics,
    reference OCRQueue.js:85).
    """
    hashed = media_df.select(
        "media_ref", "media_bytes", F.sha2("media_bytes", 256).alias("h")
    )
    # Two refs with identical bytes -> one compute (hash-level dedup).
    distinct_payloads = hashed.select("h", "media_bytes").dropDuplicates(["h"])

    if use_cache and ocr_cache_df is not None:
        cache = ocr_cache_df.select("h", F.col("ocr_text").alias("_cached"))
        with_cache = distinct_payloads.join(cache, "h", "left")
        hits = with_cache.filter(F.col("_cached").isNotNull()).select(
            "h", F.col("_cached").alias("ocr_text")
        )
        misses = with_cache.filter(F.col("_cached").isNull()).select(
            "h", "media_bytes"
        )
    else:
        hits = None
        misses = distinct_payloads

    computed = misses.mapInPandas(_ocr_batches, schema=OCR_OUT_SCHEMA)
    per_hash = computed if hits is None else hits.unionByName(computed)

    results = hashed.select("media_ref", "h").join(per_hash, "h", "left")
    return results.select("media_ref", "h", "ocr_text"), computed
