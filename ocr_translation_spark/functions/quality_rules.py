"""Gopher-style composite document quality rules, all columnar.

:func:`gopher_quality_rules` evaluates the published rule family from
Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1, public)
over a document corpus: word-count bounds, mean-word-length bounds,
symbol-to-word ratio, bullet-line and ellipsis-line fractions,
alphabetic-word fraction, and a required-stopword floor — the standard
pre-dedup heuristic filter of a web-scale curation pipeline.

Design notes (scale + exactness):

* Every signal and every rule verdict is a pure Catalyst expression
  (whole-stage codegen, zero Python, ZERO shuffles) — the operator is
  a row-local map over the corpus scan, the cheapest possible shape at
  100 TB: it pipelines into whatever shuffle comes next (dedup,
  packing) without adding one of its own.
* Every fractional threshold is evaluated in CROSS-MULTIPLIED integer
  form (``10 * n_bullet_lines <= 9 * n_lines`` instead of
  ``n_bullet/n_lines <= 0.9``): no division, no floats, so the DuckDB
  value oracle reproduces every verdict bit-for-bit and boundary
  documents (exactly at a threshold) are decided identically on both
  engines.
* The per-rule counters are emitted alongside the verdicts so the drop
  accounting (which rule removed how much) is a trivial downstream
  aggregation (see ``filter_funnel_report`` for the cascade form).

Reference parity note: the reference service (hairbui76/ocr-translation)
has no corpus-filtering surface; this is training-data-pipeline breadth
beyond parity, per the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Gopher's "must contain 2 of ..." required-word floor, adapted to the
#: synthetic corpus vocabulary (the published set is English stopwords;
#: the RULE — at least ``min_stop_hits`` distinct members present — is
#: what the operator implements).
REQUIRED_STOPWORDS = ("the", "a", "data", "value")

#: bullet-line prefixes and the ellipsis suffix from the published rules
BULLET_PREFIXES = ("- ", "* ")
ELLIPSIS_SUFFIX = "..."


def _words(text: Column) -> Column:
    """Non-empty whitespace tokens (newlines are whitespace too)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def _count_occurrences(text: Column, needle: str) -> Column:
    """Exact count of non-overlapping occurrences of a literal."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def gopher_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_word_pct: int = 10,
    max_bullet_line_pct: int = 90,
    max_ellipsis_line_pct: int = 30,
    min_alpha_word_pct: int = 80,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher rule signals, verdicts, and the composite
    ``keep`` flag.

    All ``*_pct`` thresholds are integer percentages evaluated by
    cross-multiplication; ``mean_word_len`` bounds compare
    ``bound * n_words`` against the exact summed word length. Empty
    documents fail the word-count rule and (by convention) pass the
    ratio rules their denominators would otherwise zero out.
    """
    text = F.col(text_col)
    words = _words(text)
    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")

    n_words = F.size(words).cast("long")
    n_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_symbols = (
        _count_occurrences(text, "#") + _count_occurrences(text, ELLIPSIS_SUFFIX)
    )
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.startswith(l, F.lit(BULLET_PREFIXES[0]))
            | F.startswith(l, F.lit(BULLET_PREFIXES[1])),
        )
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(lines, lambda l: F.endswith(l, F.lit(ELLIPSIS_SUFFIX)))
    ).cast("long")
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[a-z]"))
    ).cast("long")
    n_stops = F.aggregate(
        F.array(*[F.lit(s) for s in REQUIRED_STOPWORDS]),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.array_contains(words, s).cast("long"),
    )

    out = df.select(
        "doc_id",
        n_words.alias("n_words"),
        n_word_chars.alias("n_word_chars"),
        n_symbols.alias("n_symbols"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ellipsis.alias("n_ellipsis_lines"),
        n_alpha.alias("n_alpha_words"),
        n_stops.alias("n_stop_hits"),
    )
    c = F.col
    rules = {
        "r_word_count": (c("n_words") >= min_words)
        & (c("n_words") <= max_words),
        "r_mean_word_len": (
            c("n_word_chars") >= min_mean_word_len * c("n_words")
        )
        & (c("n_word_chars") <= max_mean_word_len * c("n_words")),
        "r_symbol_ratio": 100 * c("n_symbols")
        <= max_symbol_word_pct * c("n_words"),
        "r_bullet_lines": 100 * c("n_bullet_lines")
        <= max_bullet_line_pct * c("n_lines"),
        "r_ellipsis_lines": 100 * c("n_ellipsis_lines")
        <= max_ellipsis_line_pct * c("n_lines"),
        "r_alpha_words": 100 * c("n_alpha_words")
        >= min_alpha_word_pct * c("n_words"),
        "r_stopwords": c("n_stop_hits") >= min_stop_hits,
    }
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)
