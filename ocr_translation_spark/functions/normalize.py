"""Unicode text canonicalization — the pre-dedup normalization pass.

Web-scale dedup is only as good as its canonical form: the same
sentence arrives NFC-composed from one crawler and NFD-decomposed from
another ("Café" as 4 codepoints vs 5), with case and whitespace noise
on top. Canonicalizing BEFORE hashing/fingerprinting is the standard
first stage of every curation cascade (CCNet, C4, RefinedWeb all
normalize before dedup).

Reference parity note: the reference pipeline normalizes OCR output
whitespace before translation (`src/utils/translate.js` trims and
re-splits spans); this module generalizes that to full Unicode
canonicalization for corpus-scale dedup.

Spark shape: Unicode NFC has no JVM builtin exposed through
`pyspark.sql.functions`, so that ONE step is a vectorized Arrow
`pandas_udf` (`Series.str.normalize` — C-loop inside pandas, no
per-row Python). Everything else (case fold, whitespace collapse,
hashing) stays JVM-side so whole-stage codegen covers it. The whole
operator is row-local: ZERO shuffles at any scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _nfc_udf():
    """Unicode NFC composition, vectorized over the Arrow batch.
    Built lazily (a DDL-typed module-level pandas_udf would need an
    active SparkSession at import time); the DataType object avoids
    the DDL parse entirely."""

    @pandas_udf(StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    return _nfc


def canonicalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "canon_text",
    lowercase: bool = True,
) -> DataFrame:
    """Append ``out_col`` = NFC(text) -> [lower] -> collapse ASCII
    whitespace runs to one space -> trim.

    The op order matters and is part of the contract (the DuckDB twin
    applies ``nfc_normalize`` then ``lower`` in the same order): NFC
    first so case folding sees composed characters.
    """
    c: Column = _nfc_udf()(F.col(text_col))
    if lowercase:
        c = F.lower(c)
    c = F.trim(F.regexp_replace(c, "[ \\t\\r\\n]+", " "))
    return df.withColumn(out_col, c)


def canonical_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, canon_len, canon_sha256): the dedup key a canonicalized
    corpus hashes on. Two byte-different but canonically-equal
    documents get identical fingerprints; `exact_dedup` downstream
    then collapses them with its usual one-shuffle min-id rule."""
    out = canonicalize_text(df, text_col=text_col, out_col="__canon")
    return out.select(
        F.col(id_col),
        F.length("__canon").alias("canon_len"),
        F.sha2(F.col("__canon"), 256).alias("canon_sha256"),
    )
