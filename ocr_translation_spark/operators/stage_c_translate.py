"""Stage C — dictionary + rule translation (en->vi), columnar by default.

Reference parity: ``src/utils/translator.js:8-23`` (the Google-translate
HTTP call) replaced by a deterministic token-wise dictionary with
identity fallback (FIXTURES.md section 3), plus the text-hash cache at
``src/utils/MessageQueue/TranslationQueue.js:53-83`` — which becomes
unnecessary as a TABLE here because the dictionary lookup is a pure
in-codegen map literal (the cache would cost a shuffle to save a hash
lookup; see dedup_cache.py for the generic cached-compute operator used
where compute IS expensive).

Two implementations with identical semantics:

* ``translate_text_col`` / ``translate_spans`` — pure Catalyst: the
  ~200-entry dictionary is a ``create_map`` literal, applied with
  ``transform`` + ``element_at`` inside the span array. Whole-stage
  codegen, no Python, no shuffle, and the dictionary ships with the
  plan (the moral equivalent of a broadcast variable for a dict this
  small; a million-entry dictionary would instead broadcast-join an
  exploded token stream).
* ``translate_series`` — vectorized pandas path (``pd.Series`` map)
  used by the property test proving both paths agree, and available
  for rule classes a map literal can't express.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame, functions as F

from .. import semantics as S

def _dict_map() -> Column:
    # built lazily: Column literals need an active SparkContext
    return F.create_map(
        *[F.lit(x) for x in itertools.chain.from_iterable(S.XLATE_DICT.items())]
    )


def translate_text_col(text: Column) -> Column:
    """Columnar twin of ``semantics.translate_text`` (null-safe)."""
    dict_map = _dict_map()
    toks = F.split(F.trim(text), r"\s+")
    translated = F.transform(
        toks, lambda t: F.coalesce(F.element_at(dict_map, F.lower(t)), t)
    )
    return F.when(text.isNull(), None).otherwise(F.array_join(translated, " "))


def translate_spans(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Translate the text payload of every span in the array (stage C)."""
    return df.withColumn(
        spans_col,
        F.transform(
            F.col(spans_col),
            lambda s: F.struct(
                s["kind"].alias("kind"),
                translate_text_col(s["text"]).alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )


def translate_series(texts):
    """Vectorized pandas twin (for parity tests / pandas-UDF path)."""
    import pandas as pd

    def one(t):
        if t is None:
            return None
        return S.translate_text(t)

    return pd.Series([one(t) for t in texts])
