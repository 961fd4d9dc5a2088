"""Derive span-documents from the flat driver testdata `documents`
table — the SQL-expressible bridge used by the correctness oracle.

The driver's testdata `documents` is flat (doc_id:int64, text, lang,
source, n_chars). For oracle-checkable end-to-end queries we derive an
interleaved span doc from each row with a rule simple enough to state
identically in Spark expressions AND DuckDB SQL:

    words = split(text, ' ')                (single-space separated)
    span i (0-based):
        kind      = 'boiler'                 if i % 7 == 3
                    'media'                  elif i % 11 == 5
                    'text'                   otherwise
        text      = word_i for text/boiler kinds, NULL for media
        media_ref = 'img_' || word_i for media, NULL otherwise
        offset    = i

This makes the flagship pipeline (stage B strip + stage C translate +
re-offset) a DuckDB-verifiable query while still exercising the real
operator implementations on the Spark side. (Stage A OCR needs binary
payloads and is verified against the pure-Python golden spec in
pytest instead — see tests/test_pipeline_e2e.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import semantics as S


def derive_span_documents(flat_docs: DataFrame) -> DataFrame:
    """(doc_id, text, ...) -> (doc_id, spans) under the shared rule."""
    words = F.split(F.col("text"), " ")
    spans = F.transform(
        words,
        lambda w, i: F.struct(
            F.when(i % 7 == 3, S.KIND_BOILER)
            .when(i % 11 == 5, S.KIND_MEDIA)
            .otherwise(S.KIND_TEXT)
            .alias("kind"),
            F.when((i % 7 != 3) & (i % 11 == 5), None)
            .otherwise(w)
            .alias("text"),
            F.when(
                (i % 7 != 3) & (i % 11 == 5), F.concat(F.lit("img_"), w)
            ).alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return flat_docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                            spans.alias("spans"))


def derivation_cte_sql() -> str:
    """DuckDB CTE producing the identical exploded span stream:
    (doc_id, i, kind, text, media_ref) — 0-based i."""
    return """
  words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS i
    FROM documents
  ),
  spans AS (
    SELECT doc_id, i,
           CASE WHEN i % 7 = 3 THEN 'boiler'
                WHEN i % 11 = 5 THEN 'media'
                ELSE 'text' END AS kind,
           CASE WHEN i % 7 <> 3 AND i % 11 = 5 THEN NULL
                ELSE word END AS text,
           CASE WHEN i % 7 <> 3 AND i % 11 = 5 THEN 'img_' || word
                ELSE NULL END AS media_ref
    FROM words
  )"""


def xlate_dict_values_sql() -> str:
    """The fixed dictionary as a VALUES list (identical to XLATE_DICT)."""
    rows = ",\n    ".join(
        f"('{src}', '{dst}')" for src, dst in sorted(S.XLATE_DICT.items())
    )
    return f"dict(src, dst) AS (VALUES\n    {rows}\n  )"
