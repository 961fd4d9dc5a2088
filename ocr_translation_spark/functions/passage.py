"""Passage-level (sub-document) global deduplication.

C4 removes any three-sentence span that occurs more than once in the
corpus; RefinedWeb/Gopher strip repeated lines and boilerplate
passages the same way.  Exact-document dedup misses these: the
duplicated *passage* (a license header, a navigation footer, a quoted
paragraph) rides inside otherwise-unique documents.  This module
implements the corpus-global variant over word ``k``-grams:

1. emit every positioned word ``k``-gram of every document;
2. count gram occurrences corpus-wide (a hash aggregate);
3. grams with ``count >= min_count`` form the *boiler set*;
4. a token is removed iff it is covered by at least one boiler-gram
   occurrence; the surviving tokens are re-joined in order.

Spark shape, and why it holds at 100 TB:

* The gram explosion is **narrow** (flatMap of the scan — no shuffle);
  the only corpus-wide shuffle is the gram-count hash aggregate, with
  map-side partial aggregation and uniform keys (grams are
  content-hashed by the shuffle).
* On natural text the boiler set is *tiny* relative to the corpus
  (boilerplate is by definition a small set of high-frequency
  strings), so the grams->boiler probe is a broadcast-capable
  equi-join; Catalyst/AQE picks broadcast when the filtered side fits
  and falls back to a shuffled hash join when it does not — semantics
  identical either way.
* Token removal never explodes the corpus a second time: the boiler
  hits per document are collapsed to a ``collect_set`` of gram start
  positions (one shuffle keyed on the doc id — uniform), and the
  final cleaning is ONE row-local array expression over the original
  token array (``filter`` with index + ``exists`` over the start
  list).  No per-token join, no re-sort, no re-assembly aggregate.
* All logic is exact string/integer work, so the DuckDB twin in
  ``__spark_entry__.oracle_sql()`` is bit-exact.

Reference parity: the reference pipeline strips boiler spans per
document during extraction (src/services/ocr.service.js strips
recognized header/footer kinds); this operator is the corpus-global
generalisation a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import normalized_text, tokens, word_grams


def _safe_tokens(text_col: str):
    """Token array of the normalized text; [] (not ['']) for blank."""
    t = F.col(text_col)
    return F.when(
        F.trim(t) == "", F.array().cast("array<string>")
    ).otherwise(tokens(normalized_text(t)))


def passage_dedup(
    df: DataFrame,
    k: int = 3,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_removed, cleaned_text): corpus-global repeated
    ``k``-gram passages removed from every document.

    ``min_count`` is the global occurrence threshold (C4 uses 2 — "any
    span occurring more than once"; higher values restrict removal to
    true boilerplate).  Within-document repetition counts toward the
    threshold on purpose: a passage pasted twice in one document is as
    much boilerplate as one pasted across two.
    """
    base = df.select(
        F.col(id_col).alias("_id"), _safe_tokens(text_col).alias("t")
    )
    grams = base.select(
        "_id", F.posexplode(word_grams(F.col("t"), k)).alias("gpos", "gram")
    )
    boiler = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gram")
    )
    starts = (
        grams.join(boiler, "gram")
        .groupBy("_id")
        .agg(F.collect_set("gpos").alias("ss"))
    )
    joined = base.join(starts, "_id", "left").select(
        "_id",
        "t",
        F.coalesce(F.col("ss"), F.array().cast("array<int>")).alias("ss"),
    )

    last = k - 1  # a gram starting at s covers tokens s .. s+k-1

    def _kept(x, i):
        return ~F.exists(
            F.col("ss"), lambda s: (i >= s) & (i <= s + F.lit(last))
        )

    kept = F.filter(F.col("t"), _kept)
    return joined.select(
        F.col("_id").alias(id_col),
        F.size("t").cast("long").alias("n_words"),
        (F.size("t") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("cleaned_text"),
    )
